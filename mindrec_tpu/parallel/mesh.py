"""Device mesh construction and sharding placement.

The reference's parallelism inventory (SURVEY §2.3/§2.5) maps to a 2-D
logical mesh:

* axis ``data``  — data parallelism (reference DATA_PARALLEL +
  ``DistributedGradReducer``): batch sharded, dense params replicated,
  XLA all-reduces gradients over ICI;
* axis ``model`` — embedding model-parallelism (reference
  TABLE_ROW_SLICE / column slice under AUTO_PARALLEL,
  ``wide_and_deep.py:232-249``): tables sharded, XLA inserts the
  all-to-all / all-gather for sharded gathers & scatter-updates.

Use :func:`make_mesh` then :func:`shard_train_state` /
:func:`shard_batch` to place a TrainState; the jitted step is untouched
— GSPMD propagates the shardings.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh.  ``data=None`` uses all remaining
    devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {n}")
    arr = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch: dict, mesh: Mesh, full_batch: bool = False) -> dict:
    """Place a host batch on the mesh.

    ``full_batch=True`` is the reference's AUTO_PARALLEL *full-batch*
    input mode (``set_auto_parallel_context(full_batch=True)``,
    ``train_and_eval_parameter_server_distribute.py:95-96``): every
    device sees the whole batch (replicated input) and the parallelism
    comes entirely from the sharded embedding tables — used when the
    input pipeline is not itself sharded per worker."""
    s = replicated(mesh) if full_batch else batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def _is_table_path(key: str, table_keys: set[str]) -> bool:
    return key in table_keys


def shard_train_state(state, model, mesh: Mesh):
    """Place a TrainState on the mesh: embedding tables (and their
    row-aligned optimizer-state arrays) sharded per their spec's
    ``partition_spec``; everything else replicated.

    Optimizer state rows are aligned with table rows, so they get the
    same sharding — the scatter-update then stays local per shard.
    """
    from mindrec_tpu.train.step import TrainState, flatten_params

    table_specs = getattr(model, "table_specs", {})
    table_by_key = {"/".join(path): spec for _, (path, spec) in table_specs.items()}

    def place_params(tree):
        flat, treedef = flatten_params(tree)
        leaves = []
        for key, leaf in flat:
            spec = None
            for tkey, tspec in table_by_key.items():
                if key == tkey:
                    spec = tspec
                    break
            if spec is not None and spec.slice_mode != "none":
                sh = NamedSharding(mesh, spec.partition_spec())
            else:
                sh = replicated(mesh)
            leaves.append(jax.device_put(leaf, sh))
        return treedef.unflatten(leaves)

    def place_opt(opt_state: dict):
        out = {}
        for key, leaf_state in opt_state.items():
            spec = table_by_key.get(key)
            if spec is not None and spec.slice_mode != "none":
                pspec = spec.partition_spec()

                def put(x, spec=spec, pspec=pspec):
                    # moment/accumulator arrays mirror the table's storage
                    # layout exactly (zeros_like), so they take the table's
                    # partition spec whether the layout is dense row-major
                    # [Vp, D] or feature-major [Dp, Vc] — only the vocab
                    # extent matters (dtype may differ, e.g. bf16 moments)
                    nd = getattr(x, "ndim", 0)
                    if nd == 2 and x.shape == spec.storage_shape:
                        return jax.device_put(x, NamedSharding(mesh, pspec))
                    if (
                        nd >= 1
                        and not spec.feature_major
                        and x.shape[0] == spec.padded_vocab
                    ):
                        sub = P(*(list(pspec)[:nd]))
                        return jax.device_put(x, NamedSharding(mesh, sub))
                    return jax.device_put(x, replicated(mesh))

                out[key] = jax.tree.map(put, leaf_state)
            else:
                out[key] = jax.tree.map(
                    lambda x: jax.device_put(x, replicated(mesh)), leaf_state
                )
        return out

    return TrainState(
        params=place_params(state.params),
        opt_w=place_opt(state.opt_w),
        opt_d=place_opt(state.opt_d),
        step=jax.device_put(state.step, replicated(mesh)),
        rng=jax.device_put(state.rng, replicated(mesh)),
    )
