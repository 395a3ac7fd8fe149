"""Generic CTR train/eval step builder.

Re-designs the reference's ``TrainStepWrap`` idiom
(``models/wide_deep/src/wide_and_deep.py:376-492``) as a pure jitted
function over a flat, path-keyed parameter view:

* **dual-optimizer split by param path**: params whose path contains
  "wide" go to the wide optimizer (FTRL), the rest to the deep optimizer
  (Adam/LazyAdam) — parity with the reference's name-based split
  (``wide_and_deep.py:406-412``).
* **single backward pass**: the reference runs two ``GradOperation``s
  (one per loss head).  ``loss_w`` and ``loss_d`` differ only by an L2
  term involving only deep params, so one ``jax.grad`` of ``loss_d``
  reproduces both sides' gradients exactly (the l2 term has zero
  wide-gradient).
* **row-sparse path**: sparse embedding tables never see dense
  gradients.  Per step: padded-unique ids -> gather unique rows ->
  forward from rows -> grads w.r.t. unique rows (XLA emits a
  static-shape scatter-add) -> row-wise optimizer scatter update.
  Unused dense-table gradients are dead code XLA eliminates.
* **loss scaling**: losses are multiplied by ``sens`` before grad and
  optimizers divide grads by ``sens``
  (reference sens=1024, ``wide_and_deep.py:383,450-452``).
* **data parallelism**: params replicated / batch sharded via
  ``NamedSharding``; XLA GSPMD inserts the gradient all-reduce the
  reference gets from ``DistributedGradReducer``
  (``wide_and_deep.py:455-470``).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from mindrec_tpu.ops.sparse import unique_pad
from mindrec_tpu.train.optim import Optimizer


# ---------------------------------------------------------------------------
# flat path-keyed view of a param pytree
# ---------------------------------------------------------------------------


def _path_key(path) -> str:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "idx"):
            names.append(str(p.idx))
        else:
            names.append(str(p))
    return "/".join(names)


def flatten_params(params):
    """-> (ordered list of (key, leaf), treedef)."""
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    return [(_path_key(p), leaf) for p, leaf in leaves], treedef


def param_keys(params) -> list[str]:
    return [k for k, _ in flatten_params(params)[0]]


def is_wide_key(key: str) -> bool:
    return "wide" in key


# ---------------------------------------------------------------------------
# train state
# ---------------------------------------------------------------------------


class TrainState(NamedTuple):
    params: Any  # model param pytree (nested)
    opt_w: dict  # path-key -> leaf optimizer state (wide side)
    opt_d: dict  # path-key -> leaf optimizer state (deep side)
    step: jnp.ndarray
    rng: jnp.ndarray


def init_train_state(model, key, opt_w: Optimizer, opt_d: Optimizer) -> TrainState:
    pkey, rkey = jax.random.split(jax.random.PRNGKey(key) if isinstance(key, int) else key)
    params = model.init(pkey)
    flat, _ = flatten_params(params)
    opt_w_state = {k: opt_w.init_leaf(p) for k, p in flat if is_wide_key(k)}
    opt_d_state = {k: opt_d.init_leaf(p) for k, p in flat if not is_wide_key(k)}
    return TrainState(
        params=params,
        opt_w=opt_w_state,
        opt_d=opt_d_state,
        step=jnp.zeros((), jnp.int32),
        rng=rkey,
    )


# ---------------------------------------------------------------------------
# step builders
# ---------------------------------------------------------------------------


def make_train_step(
    model,
    opt_w: Optimizer,
    opt_d: Optimizer,
    sparse: bool | None = None,
    loss_scale: float | None = None,
    donate: bool = True,
    jit: bool = True,
):
    """Build ``step(state, batch) -> (state, (loss_w, loss_d))``.

    ``batch``: dict with ``ids [B,F] int32``, ``wts [B,F] f32``,
    ``label [B,1] f32`` (criteo layout).
    """
    cfg = model.config
    if sparse is None:
        sparse = bool(
            getattr(cfg, "sparse", False) or getattr(cfg, "dynamic_embedding", False)
        )
    sens = float(
        loss_scale if loss_scale is not None else getattr(cfg, "loss_scale", 1.0)
    )
    table_specs = getattr(model, "table_specs", {}) if sparse else {}
    table_keys = {"/".join(path): (name, path, spec) for name, (path, spec) in table_specs.items()}

    def apply_updates(params, grads, opt_w_state, opt_d_state, skip_keys=()):
        flat_p, treedef = flatten_params(params)
        flat_g = treedef.flatten_up_to(grads)
        new_leaves = []
        new_w = dict(opt_w_state)
        new_d = dict(opt_d_state)
        for (key, p), g in zip(flat_p, flat_g):
            if key in skip_keys:
                new_leaves.append(p)  # handled by the row-sparse path
                continue
            if is_wide_key(key):
                p2, s2 = opt_w.update_leaf(g, new_w[key], p)
                new_w[key] = s2
            else:
                p2, s2 = opt_d.update_leaf(g, new_d[key], p)
                new_d[key] = s2
            new_leaves.append(p2)
        return treedef.unflatten(new_leaves), new_w, new_d

    def _set_table(params, path, new_table):
        def setter(node, rest):
            if not rest:
                return new_table
            head = rest[0]
            if isinstance(node, dict):
                out = dict(node)
                out[head] = setter(node[head], rest[1:])
                return out
            raise TypeError(f"cannot descend into {type(node)}")

        return setter(params, list(path))

    def dense_step(state: TrainState, batch):
        rng, sub = jax.random.split(state.rng)

        def loss_fn(params):
            logits = model.apply_batch(params, batch, train=True, rng=sub)
            loss_w, loss_d = model.loss(params, logits, batch["label"])
            return loss_d * sens, (loss_w, loss_d)

        grads, (loss_w, loss_d) = jax.grad(loss_fn, has_aux=True)(state.params)
        params, opt_w_state, opt_d_state = apply_updates(
            state.params, grads, state.opt_w, state.opt_d
        )
        return (
            TrainState(params, opt_w_state, opt_d_state, state.step + 1, rng),
            (loss_w, loss_d),
        )

    def sparse_step(state: TrainState, batch):
        rng, sub = jax.random.split(state.rng)
        params = state.params
        ids = batch["ids"]
        # All criteo-model tables share one id tensor: one padded unique.
        any_spec = next(iter(table_specs.values()))[1]
        uq = unique_pad(ids, size=int(ids.shape[0]) * int(ids.shape[1]),
                        fill_value=any_spec.dummy_id)

        def get_table(p, path):
            node = p
            for h in path:
                node = node[h]
            return node

        rows_u = {
            name: get_table(params, path)[uq.ids]
            for name, (path, _) in table_specs.items()
        }

        def loss_fn(params, rows_u):
            rows_full = {
                name: r[uq.inverse] for name, r in rows_u.items()
            }  # [B, F, dim]
            logits = model.apply_rows(
                params, rows_full, batch["wts"], train=True, rng=sub
            )
            loss_w, loss_d = model.loss(params, logits, batch["label"])
            return loss_d * sens, (loss_w, loss_d)

        (grads, row_grads), (loss_w, loss_d) = jax.grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, rows_u)

        # dense params (table grads are all-zero & skipped -> DCE'd by XLA)
        params2, opt_w_state, opt_d_state = apply_updates(
            params, grads, state.opt_w, state.opt_d, skip_keys=set(table_keys)
        )

        # row-sparse table updates
        for key, (name, path, spec) in table_keys.items():
            table = get_table(params, path)
            if is_wide_key(key):
                new_table, new_sub = opt_w.update_rows(
                    row_grads[name], uq.ids, opt_w_state[key], table
                )
                opt_w_state = {**opt_w_state, key: new_sub}
            else:
                new_table, new_sub = opt_d.update_rows(
                    row_grads[name], uq.ids, opt_d_state[key], table
                )
                opt_d_state = {**opt_d_state, key: new_sub}
            params2 = _set_table(params2, path, new_table)

        return (
            TrainState(params2, opt_w_state, opt_d_state, state.step + 1, rng),
            (loss_w, loss_d),
        )

    step = sparse_step if sparse else dense_step
    if jit:
        step = jax.jit(step, donate_argnums=(0,) if donate else ())
    return step


def make_eval_step(model, jit: bool = True):
    """Build ``eval_step(params, batch) -> (probs, labels)`` (the
    reference PredictWithSigmoid head, ``wide_and_deep.py:495-519``)."""

    def eval_step(params, batch):
        probs = model.predict_batch(params, batch)
        return probs, batch["label"]

    return jax.jit(eval_step) if jit else eval_step
