"""Streamed (scatter-free) optimizer kernels vs the gather/scatter
reference implementations — interpret mode on CPU.  Feature-major
[Dp, Vc] storage throughout."""

import jax.numpy as jnp
import numpy as np

from mindrec_tpu.ops.pallas.stream_update import (
    make_aug_grads,
    streamed_adam_cols,
    streamed_ftrl_cols,
)
from mindrec_tpu.train import optim


def _setup(V=1024, D=16, n=300, seed=0, dup=True):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, V - 10, size=n)
    if dup:
        ids[: n // 4] = ids[n // 4 : n // 2]  # force duplicates
    ids = np.sort(ids).astype(np.int32)
    grads = rng.normal(size=(D, n)).astype(np.float32)  # feature-major
    table = rng.normal(size=(D, V)).astype(np.float32)
    return jnp.asarray(table), jnp.asarray(ids), jnp.asarray(grads)


def _dedup(ids, grads):
    """Reference combine: sum duplicate-col grads -> unique (cols, g, touch)."""
    uids, inv = np.unique(np.asarray(ids), return_inverse=True)
    out = np.zeros((grads.shape[0], len(uids)), np.float32)
    np.add.at(out.T, inv, np.asarray(grads).T)
    touch = np.ones((grads.shape[0], len(uids)), bool)
    return jnp.asarray(uids.astype(np.int32)), jnp.asarray(out), jnp.asarray(touch)


def test_streamed_adam_matches_colwise():
    table, ids, grads = _setup()
    m = jnp.zeros_like(table)
    v = jnp.zeros_like(table)
    lr_t = 1e-2 * np.sqrt(1 - 0.999) / (1 - 0.9)

    t2, m2, v2 = streamed_adam_cols(
        table, m, v, ids, make_aug_grads(grads, None), lr_t,
        dim=table.shape[0], tile=256, chunk=64,
        matmul_dtype=jnp.float32, interpret=True,
    )

    # reference: dedup then column-wise update via the optim module
    uids, ug, touch = _dedup(ids, grads)
    opt = optim.adam(learning_rate=1e-2)
    st = {"m": m, "v": v, "step": jnp.zeros((), jnp.int32)}
    t_ref, st_ref = opt.update_cols(ug, uids, touch, st, table)

    np.testing.assert_allclose(np.asarray(t2), np.asarray(t_ref), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(st_ref["m"]), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(st_ref["v"]), rtol=2e-5, atol=2e-6)


def test_streamed_adam_untouched_cols_unchanged():
    table, ids, grads = _setup()
    m = jnp.ones_like(table) * 0.5
    v = jnp.ones_like(table) * 0.25
    t2, m2, v2 = streamed_adam_cols(
        table, m, v, ids, make_aug_grads(grads, None), 1e-2,
        dim=table.shape[0], tile=256, chunk=64,
        matmul_dtype=jnp.float32, interpret=True,
    )
    touched = np.zeros(table.shape[1], bool)
    touched[np.asarray(ids)] = True
    np.testing.assert_array_equal(np.asarray(t2)[:, ~touched], np.asarray(table)[:, ~touched])
    np.testing.assert_array_equal(np.asarray(m2)[:, ~touched], np.asarray(m)[:, ~touched])


def test_streamed_ftrl_matches_colwise():
    table, ids, grads = _setup(seed=3)
    accum = jnp.full_like(table, 1.0)
    linear = jnp.zeros_like(table)

    t2, a2, l2_ = streamed_ftrl_cols(
        table, accum, linear, ids, make_aug_grads(grads, None),
        dim=table.shape[0], learning_rate=5e-2, l1=1e-8, l2=1e-8,
        tile=256, chunk=64, matmul_dtype=jnp.float32, interpret=True,
    )

    uids, ug, touch = _dedup(ids, grads)
    opt = optim.ftrl(learning_rate=5e-2, l1=1e-8, l2=1e-8, initial_accum=1.0)
    st = {"accum": accum, "linear": linear}
    t_ref, st_ref = opt.update_cols(ug, uids, touch, st, table)

    np.testing.assert_allclose(np.asarray(t2), np.asarray(t_ref), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(st_ref["accum"]), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(l2_), np.asarray(st_ref["linear"]), rtol=2e-5, atol=2e-6)


def test_streamed_adam_with_sentinel_padding():
    """Sentinel tail ids (dummy col) must behave like zero-grad cols."""
    V, D = 512, 8
    table, ids, grads = _setup(V=V, D=D, n=100, seed=5)
    # emulate padded tail: dummy col V-1, zero grads, zero touch rows
    ids = jnp.concatenate([ids, jnp.full((28,), V - 1, jnp.int32)])
    g_aug = make_aug_grads(grads, None)
    pad = jnp.zeros((g_aug.shape[0], 28), jnp.float32)
    g_aug = jnp.concatenate([g_aug, pad], axis=1)
    # touch row must be 1 even for the sentinel tail (it IS listed) — a
    # zero-grad touch advances adam moments from zero: still a no-op
    g_aug = g_aug.at[D, 100:].set(1.0)
    m = jnp.zeros_like(table)
    v = jnp.zeros_like(table)
    t2, m2, v2 = streamed_adam_cols(
        table, m, v, ids, g_aug, 1e-2,
        dim=D, tile=128, chunk=32,
        matmul_dtype=jnp.float32, interpret=True,
    )
    # dummy col: zero grad from zero moments -> table col unchanged
    np.testing.assert_allclose(np.asarray(t2)[:, V - 1], np.asarray(table)[:, V - 1], atol=1e-7)


def test_streamed_ftrl_folded_scalar_table():
    """fold=8 scalar table: 8 logical rows share a storage column; the
    touch rows must mask the update per LOGICAL row."""
    Vc, R = 128, 8  # 1024 logical scalar rows
    rng = np.random.default_rng(7)
    table = jnp.asarray(rng.normal(size=(R, Vc)).astype(np.float32))
    accum = jnp.full_like(table, 1.0)
    linear = jnp.zeros_like(table)
    raw_ids = np.sort(rng.integers(0, Vc * R, size=64)).astype(np.int32)
    cols = jnp.asarray(raw_ids // R)
    sub = jnp.asarray(raw_ids % R)
    g_flat = rng.normal(size=(64,)).astype(np.float32)
    # masked grads: only the owning sub-row carries the grad
    grads = jnp.zeros((R, 64), jnp.float32).at[sub, jnp.arange(64)].set(g_flat)
    g_aug = make_aug_grads(grads, sub)

    t2, a2, l2_ = streamed_ftrl_cols(
        table, accum, linear, cols, g_aug,
        dim=1, fold=R, learning_rate=5e-2, l1=1e-8, l2=1e-8,
        tile=64, chunk=32, matmul_dtype=jnp.float32, interpret=True,
    )

    # reference: per-logical-row ftrl on a flat [V] view
    flat_t = np.asarray(table).T.reshape(-1)
    flat_a = np.asarray(accum).T.reshape(-1)
    flat_l = np.asarray(linear).T.reshape(-1)
    uids, inv = np.unique(raw_ids, return_inverse=True)
    gsum = np.zeros(len(uids), np.float32)
    np.add.at(gsum, inv, g_flat)
    opt = optim.ftrl(learning_rate=5e-2, l1=1e-8, l2=1e-8, initial_accum=1.0)
    t_ref, st_ref = opt.update_rows(
        jnp.asarray(gsum)[:, None], jnp.asarray(uids),
        {"accum": jnp.asarray(flat_a)[:, None], "linear": jnp.asarray(flat_l)[:, None]},
        jnp.asarray(flat_t)[:, None],
    )
    np.testing.assert_allclose(
        np.asarray(t2).T.reshape(-1), np.asarray(t_ref)[:, 0], rtol=2e-5, atol=2e-6
    )
    # untouched logical rows in touched columns keep their state
    np.testing.assert_allclose(
        np.asarray(a2).T.reshape(-1), np.asarray(st_ref["accum"])[:, 0],
        rtol=2e-5, atol=2e-6,
    )
