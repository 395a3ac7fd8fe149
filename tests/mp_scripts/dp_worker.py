"""Multi-process DP trainer (one real process per rank).

Spawned by ``tests/test_multiprocess.py``.  Each process:
  * forces the CPU platform with N virtual local devices,
  * joins the cluster through ``parallel.dist.initialize_from_env``
    (reference bootstrap parity: MR_SCHED_HOST/PORT + MR_WORKER_NUM/ID,
    the MS_* dynamic-networking family —
    ``run_parameter_server_distribute_train.sh:28-40``),
  * builds the same model/state from the same seed,
  * runs ``--steps`` data-parallel steps over a global mesh whose data
    axis spans every process,
  * rank 0 dumps the final (replicated-gathered) params to ``--out``.

The parent compares the dump against a single-process run of the same
global batches — the DistributedGradReducer grad-mean oracle, now with
real process boundaries.
"""

import argparse
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel  # noqa: E402
from mindrec_tpu.parallel.dist import initialize_from_env  # noqa: E402
from mindrec_tpu.parallel.mesh import (  # noqa: E402
    batch_sharding,
    make_mesh,
    replicated,
    shard_train_state,
)
from mindrec_tpu.train import optim  # noqa: E402
from mindrec_tpu.train.step import (  # noqa: E402
    flatten_params,
    init_train_state,
    make_train_step,
)


def global_batch(cfg, seed):
    rng = np.random.default_rng(seed)
    return {
        "ids": rng.integers(0, cfg.vocab_size, size=(cfg.batch_size, cfg.field_size)).astype(np.int32),
        "wts": np.ones((cfg.batch_size, cfg.field_size), np.float32),
        "label": (rng.uniform(size=(cfg.batch_size, 1)) > 0.5).astype(np.float32),
    }


def local_rows(v, nproc, pid):
    per = v.shape[0] // nproc
    return v[pid * per : (pid + 1) * per]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--sparse", action="store_true")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    info = initialize_from_env()
    assert info["process_count"] == int(os.environ["MR_WORKER_NUM"]), info
    nproc, pid = info["process_count"], info["process_index"]

    cfg = WideDeepConfig(
        batch_size=32, field_size=8, vocab_size=512, emb_dim=8,
        deep_layer_dim=(32, 16), use_mixed_precision=False, loss_scale=1.0,
        sparse=args.sparse,
        deep_table_slice_mode="table_row_slice" if args.sparse else "none",
    )
    mesh = make_mesh(model=2 if args.sparse else 1)
    model = WideDeepModel(cfg, mesh=mesh)
    opts = (optim.ftrl(), optim.lazy_adam())
    state = init_train_state(model, jax.random.PRNGKey(0), *opts)
    with mesh:
        state = shard_train_state(state, model, mesh)
        step = make_train_step(model, *opts, jit=True, donate=False)
        bs = batch_sharding(mesh)
        for s in range(args.steps):
            b = global_batch(cfg, seed=s)
            bm = {
                k: jax.make_array_from_process_local_data(
                    bs, local_rows(v, nproc, pid), v.shape
                )
                for k, v in b.items()
            }
            state, (lw, ld) = step(state, bm)
        lw, ld = float(lw), float(ld)

        flat, _ = flatten_params(state.params)
        gather = jax.jit(lambda x: x, out_shardings=replicated(mesh))
        dump = {}
        for key, leaf in flat:
            # leaves are replicated or model-sharded; gather the full value
            arr = np.asarray(jax.device_get(gather(leaf).addressable_data(0)))
            dump[key] = arr
        dump["__loss_w__"] = np.float64(lw)
        dump["__loss_d__"] = np.float64(ld)

    if pid == 0:
        np.savez(args.out, **dump)
    # all processes stay alive until every collective has completed
    multihost_utils.sync_global_devices("mindrec_dp_worker_done")


if __name__ == "__main__":
    main()
