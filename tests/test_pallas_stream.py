"""Streamed (scatter-free) optimizer kernels vs the gather/scatter
reference implementations — interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mindrec_tpu.ops.pallas.stream_update import (
    streamed_adam_rows,
    streamed_ftrl_rows,
)
from mindrec_tpu.train import optim


def _setup(V=1024, D=16, n=300, seed=0, dup=True):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, V - 10, size=n)
    if dup:
        ids[: n // 4] = ids[n // 4 : n // 2]  # force duplicates
    ids = np.sort(ids).astype(np.int32)
    grads = rng.normal(size=(n, D)).astype(np.float32)
    table = rng.normal(size=(V, D)).astype(np.float32)
    return jnp.asarray(table), jnp.asarray(ids), jnp.asarray(grads)


def _dedup(ids, grads, V):
    """Reference combine: sum duplicate-id grads -> unique (ids, rows)."""
    uids, inv = np.unique(np.asarray(ids), return_inverse=True)
    out = np.zeros((len(uids), grads.shape[1]), np.float32)
    np.add.at(out, inv, np.asarray(grads))
    return jnp.asarray(uids.astype(np.int32)), jnp.asarray(out)


def test_streamed_adam_matches_rowwise():
    table, ids, grads = _setup()
    m = jnp.zeros_like(table)
    v = jnp.zeros_like(table)
    lr_t = 1e-2 * np.sqrt(1 - 0.999) / (1 - 0.9)

    t2, m2, v2 = streamed_adam_rows(
        table, m, v, ids, grads, lr_t, tile=256, chunk=64,
        matmul_dtype=jnp.float32, interpret=True,
    )

    # reference: dedup then row-wise update via the optim module
    uids, urows = _dedup(ids, grads, table.shape[0])
    opt = optim.adam(learning_rate=1e-2)
    st = {"m": m, "v": v, "step": jnp.zeros((), jnp.int32)}
    t_ref, st_ref = opt.update_rows(urows, uids, st, table)

    np.testing.assert_allclose(np.asarray(t2), np.asarray(t_ref), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(st_ref["m"]), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(st_ref["v"]), rtol=2e-5, atol=2e-6)


def test_streamed_adam_untouched_rows_unchanged():
    table, ids, grads = _setup()
    m = jnp.ones_like(table) * 0.5
    v = jnp.ones_like(table) * 0.25
    t2, m2, v2 = streamed_adam_rows(
        table, m, v, ids, grads, 1e-2, tile=256, chunk=64,
        matmul_dtype=jnp.float32, interpret=True,
    )
    touched = np.zeros(table.shape[0], bool)
    touched[np.asarray(ids)] = True
    np.testing.assert_array_equal(np.asarray(t2)[~touched], np.asarray(table)[~touched])
    np.testing.assert_array_equal(np.asarray(m2)[~touched], np.asarray(m)[~touched])


def test_streamed_ftrl_matches_rowwise():
    table, ids, grads = _setup(seed=3)
    accum = jnp.full_like(table, 1.0)
    linear = jnp.zeros_like(table)

    t2, a2, l2_ = streamed_ftrl_rows(
        table, accum, linear, ids, grads,
        learning_rate=5e-2, l1=1e-8, l2=1e-8,
        tile=256, chunk=64, matmul_dtype=jnp.float32, interpret=True,
    )

    uids, urows = _dedup(ids, grads, table.shape[0])
    opt = optim.ftrl(learning_rate=5e-2, l1=1e-8, l2=1e-8, initial_accum=1.0)
    st = {"accum": accum, "linear": linear}
    t_ref, st_ref = opt.update_rows(urows, uids, st, table)

    np.testing.assert_allclose(np.asarray(t2), np.asarray(t_ref), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(st_ref["accum"]), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(l2_), np.asarray(st_ref["linear"]), rtol=2e-5, atol=2e-6)


def test_streamed_adam_with_sentinel_padding():
    """Sentinel tail ids (dummy row) must behave like zero-grad rows."""
    V, D = 512, 8
    table, ids, grads = _setup(V=V, D=D, n=100, seed=5)
    # emulate unique_pad output: tail filled with dummy id V-1, zero grads
    ids = jnp.concatenate([ids, jnp.full((28,), V - 1, jnp.int32)])
    grads = jnp.concatenate([grads, jnp.zeros((28, D), jnp.float32)])
    m = jnp.zeros_like(table)
    v = jnp.zeros_like(table)
    t2, m2, v2 = streamed_adam_rows(
        table, m, v, ids, grads, 1e-2, tile=128, chunk=32,
        matmul_dtype=jnp.float32, interpret=True,
    )
    # dummy row: zero grad -> m,v stay 0 -> table row unchanged
    np.testing.assert_allclose(np.asarray(t2)[V - 1], np.asarray(table)[V - 1], atol=1e-7)
