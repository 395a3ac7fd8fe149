"""Optimizers for recommender training: FTRL, Adam/LazyAdam, SGD.

Re-designs the reference's dual-optimizer training semantics
(``models/wide_deep/src/wide_and_deep.py:404-445``: wide params -> FTRL
lr 5e-2 l1/l2 1e-8 initial_accum 1.0; deep params -> Adam/LazyAdam
lr 3.5e-4 eps 1e-8; both with loss_scale sens 1024) as pure-functional
leaf-wise transforms with two update entry points:

* ``update_leaf(grad, state, param)``  — dense update of one tensor.
* ``update_rows(grad_rows, row_ids, state, table)`` — row-sparse update:
  only the touched rows of an embedding table (and of the row-aligned
  optimizer state) are read & written via gather/scatter.  This is the
  TPU-native equivalent of the reference's LazyAdam/FTRL-over-
  IndexedSlices path (``wide_and_deep.py:415-430``) — no dense
  ``[vocab, dim]`` gradient or state traffic.

``row_ids`` may contain repeats of a *sentinel* id (the dummy padding
row appended by ``mindrec_tpu.ops.sparse.unique_pad``); all duplicates
compute the same row value, so the scatter stays deterministic, and real
lookups never read the dummy row.

All optimizers fold the reference's ``loss_scale`` semantics in by
un-scaling gradients (grad / loss_scale) before the update.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

Params = Any


@dataclasses.dataclass(frozen=True)
class Optimizer:
    """Leaf-wise optimizer: state is a pytree aligned with each param leaf.

    ``kind``/``hyper`` expose the update rule so specialized backends
    (the Pallas streamed kernels) can re-implement it without the
    gather/scatter formulation.
    """

    init_leaf: Callable[[jnp.ndarray], Any]
    update_leaf: Callable[..., tuple[jnp.ndarray, Any]]
    update_rows: Callable[..., tuple[jnp.ndarray, Any]]
    # column-sparse update on feature-major [Dp, Vc] storage:
    # update_cols(grad_cols [Dp, U], col_ids [U], touch_mask [Dp, U] bool,
    #             state, table) -> (table', state').  Untouched elements
    # (mask False) keep param AND state — lazy semantics.
    update_cols: Callable[..., tuple[jnp.ndarray, Any]] = None
    kind: str = "custom"
    hyper: dict = dataclasses.field(default_factory=dict)

    def init(self, params):
        """Tree-level init: one leaf-state per param leaf."""
        return jax.tree.map(self.init_leaf, params)

    def update(self, grads, state, params):
        """Tree-level dense update (tests / simple loops)."""
        flat_p, treedef = jax.tree.flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_s = treedef.flatten_up_to(state)
        new_p, new_s = [], []
        for g, s, p in zip(flat_g, flat_s, flat_p):
            p2, s2 = self.update_leaf(g, s, p)
            new_p.append(p2)
            new_s.append(s2)
        return treedef.unflatten(new_p), treedef.unflatten(new_s)


# ---------------------------------------------------------------------------
# FTRL (FTRL-Proximal), the reference's wide-side optimizer.
# ---------------------------------------------------------------------------


def ftrl(
    learning_rate: float = 5e-2,
    l1: float = 1e-8,
    l2: float = 1e-8,
    initial_accum: float = 1.0,
    lr_power: float = -0.5,
    loss_scale: float = 1.0,
) -> Optimizer:
    """FTRL-proximal. Defaults match the reference wide-optimizer
    hyperparameters (``wide_and_deep.py:423-430,437-444``)."""

    inv_scale = 1.0 / loss_scale

    def init_leaf(p):
        return {
            "accum": jnp.full_like(p, initial_accum, dtype=jnp.float32),
            "linear": jnp.zeros_like(p, dtype=jnp.float32),
        }

    def _step(g, accum, linear, w):
        g = g.astype(jnp.float32) * inv_scale
        w32 = w.astype(jnp.float32)
        accum_new = accum + g * g
        # lr_power=-0.5: sigma = (sqrt(new) - sqrt(old)) / lr
        sigma = (
            jnp.power(accum_new, -lr_power) - jnp.power(accum, -lr_power)
        ) / learning_rate
        linear_new = linear + g - sigma * w32
        quadratic = jnp.power(accum_new, -lr_power) / learning_rate + 2.0 * l2
        w_new = jnp.where(
            jnp.abs(linear_new) > l1,
            (jnp.sign(linear_new) * l1 - linear_new) / quadratic,
            0.0,
        )
        return w_new.astype(w.dtype), accum_new, linear_new

    def update_leaf(g, state, p):
        w, a, l = _step(g, state["accum"], state["linear"], p)
        return w, {"accum": a, "linear": l}

    def update_rows(grad_rows, row_ids, state, table):
        w_new, a_new, l_new = _step(
            grad_rows, state["accum"][row_ids], state["linear"][row_ids], table[row_ids]
        )
        return (
            table.at[row_ids].set(w_new),
            {
                "accum": state["accum"].at[row_ids].set(a_new),
                "linear": state["linear"].at[row_ids].set(l_new),
            },
        )

    def update_cols(grad_cols, col_ids, touch, state, table):
        a_old = state["accum"][:, col_ids]
        l_old = state["linear"][:, col_ids]
        w_old = table[:, col_ids]
        w_new, a_new, l_new = _step(grad_cols, a_old, l_old, w_old)
        return (
            table.at[:, col_ids].set(jnp.where(touch, w_new, w_old)),
            {
                "accum": state["accum"].at[:, col_ids].set(jnp.where(touch, a_new, a_old)),
                "linear": state["linear"].at[:, col_ids].set(jnp.where(touch, l_new, l_old)),
            },
        )

    return Optimizer(
        init_leaf, update_leaf, update_rows, update_cols,
        kind="ftrl",
        hyper={
            "learning_rate": learning_rate, "l1": l1, "l2": l2,
            "initial_accum": initial_accum, "lr_power": lr_power,
            "loss_scale": loss_scale,
        },
    )


# ---------------------------------------------------------------------------
# Adam / LazyAdam, the reference's deep-side optimizers.
# ---------------------------------------------------------------------------


def adam(
    learning_rate: float = 3.5e-4,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    loss_scale: float = 1.0,
    state_dtype=jnp.float32,
) -> Optimizer:
    """Adam with per-leaf step counters.  ``update_rows`` gives LazyAdam
    semantics: only touched rows' moments advance, bias correction uses
    the global (per-table) step — matching the reference's LazyAdam
    (``wide_and_deep.py:419-421``).

    Defaults match the reference deep-optimizer hyperparameters.

    ``state_dtype``: storage precision of the m/v moments.  The sparse
    embedding update streams table+m+v through HBM every step; bf16
    moments cut that traffic by a third (all arithmetic stays f32 —
    only the stored moments round).
    """

    inv_scale = 1.0 / loss_scale

    def init_leaf(p):
        return {
            "m": jnp.zeros_like(p, dtype=state_dtype),
            "v": jnp.zeros_like(p, dtype=state_dtype),
            "step": jnp.zeros((), jnp.int32),
        }

    def _lr_t(step):
        s = step.astype(jnp.float32)
        return (
            learning_rate * jnp.sqrt(1.0 - jnp.power(b2, s)) / (1.0 - jnp.power(b1, s))
        )

    def _step_fn(g, m, v, p, lr_t):
        g = g.astype(jnp.float32) * inv_scale
        m_new = b1 * m.astype(jnp.float32) + (1.0 - b1) * g
        v_new = b2 * v.astype(jnp.float32) + (1.0 - b2) * g * g
        p_new = p.astype(jnp.float32) - lr_t * m_new / (jnp.sqrt(v_new) + eps)
        return p_new.astype(p.dtype), m_new.astype(state_dtype), v_new.astype(state_dtype)

    def update_leaf(g, state, p):
        step = state["step"] + 1
        p2, m2, v2 = _step_fn(g, state["m"], state["v"], p, _lr_t(step))
        return p2, {"m": m2, "v": v2, "step": step}

    def update_rows(grad_rows, row_ids, state, table):
        step = state["step"] + 1
        lr_t = _lr_t(step)
        p_new, m_new, v_new = _step_fn(
            grad_rows, state["m"][row_ids], state["v"][row_ids], table[row_ids], lr_t
        )
        return (
            table.at[row_ids].set(p_new),
            {
                "m": state["m"].at[row_ids].set(m_new),
                "v": state["v"].at[row_ids].set(v_new),
                "step": step,
            },
        )

    def update_cols(grad_cols, col_ids, touch, state, table):
        step = state["step"] + 1
        m_old = state["m"][:, col_ids]
        v_old = state["v"][:, col_ids]
        p_old = table[:, col_ids]
        p_new, m_new, v_new = _step_fn(grad_cols, m_old, v_old, p_old, _lr_t(step))
        return (
            table.at[:, col_ids].set(jnp.where(touch, p_new, p_old)),
            {
                "m": state["m"].at[:, col_ids].set(jnp.where(touch, m_new, m_old)),
                "v": state["v"].at[:, col_ids].set(jnp.where(touch, v_new, v_old)),
                "step": step,
            },
        )

    return Optimizer(
        init_leaf, update_leaf, update_rows, update_cols,
        kind="adam",
        hyper={
            "learning_rate": learning_rate, "b1": b1, "b2": b2, "eps": eps,
            "loss_scale": loss_scale,
        },
    )


def lazy_adam(**kw) -> Optimizer:
    """Alias: our ``adam`` is already lazy for ``update_rows``."""
    return adam(**kw)


# ---------------------------------------------------------------------------
# SGD (tests / baselines)
# ---------------------------------------------------------------------------


def sgd(learning_rate: float = 1e-2, loss_scale: float = 1.0) -> Optimizer:
    inv_scale = 1.0 / loss_scale

    def init_leaf(p):
        return ()

    def update_leaf(g, state, p):
        return (
            (p.astype(jnp.float32) - learning_rate * g.astype(jnp.float32) * inv_scale).astype(p.dtype),
            state,
        )

    def update_rows(grad_rows, row_ids, state, table):
        rows = table[row_ids].astype(jnp.float32)
        new = rows - learning_rate * grad_rows.astype(jnp.float32) * inv_scale
        return table.at[row_ids].set(new.astype(table.dtype)), state

    def update_cols(grad_cols, col_ids, touch, state, table):
        old = table[:, col_ids].astype(jnp.float32)
        new = old - learning_rate * grad_cols.astype(jnp.float32) * inv_scale
        new = jnp.where(touch, new, old)
        return table.at[:, col_ids].set(new.astype(table.dtype)), state

    return Optimizer(
        init_leaf, update_leaf, update_rows, update_cols,
        kind="sgd",
        hyper={"learning_rate": learning_rate, "loss_scale": loss_scale},
    )
