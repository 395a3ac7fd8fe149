"""Fused table-pump kernel (update + next-batch gather, interpret mode)
must match the separate streamed update followed by a fresh gather."""

import jax.numpy as jnp
import numpy as np
import pytest

from mindrec_tpu.ops.pallas.stream_fused import fused_adam_gather, fused_ftrl_gather
from mindrec_tpu.ops.pallas.stream_gather import streamed_gather
from mindrec_tpu.ops.pallas.stream_update import (
    make_aug_grads,
    streamed_adam_cols,
    streamed_ftrl_cols,
)


def _mk(dp, Vc, n_u, n_g, seed=0, skew_empty=False):
    rng = np.random.default_rng(seed)
    if skew_empty:
        # leave whole tile ranges untouched / gather-only / update-only
        cols_u = np.sort(rng.integers(0, Vc // 4, n_u)).astype(np.int32)
        cols_g = np.sort(
            np.concatenate(
                [rng.integers(0, Vc // 8, n_g // 2), rng.integers(Vc // 2, 3 * Vc // 4, n_g - n_g // 2)]
            )
        ).astype(np.int32)
    else:
        cols_u = np.sort(rng.integers(0, Vc, n_u)).astype(np.int32)
        cols_g = np.sort(rng.integers(0, Vc, n_g)).astype(np.int32)
    table = rng.normal(size=(dp, Vc)).astype(np.float32)
    g = rng.normal(size=(dp, n_u)).astype(np.float32)
    return jnp.asarray(cols_u), jnp.asarray(cols_g), jnp.asarray(table), jnp.asarray(g)


@pytest.mark.parametrize("skew_empty", [False, True])
def test_fused_adam_matches_separate(skew_empty):
    dp, Vc = 8, 1024
    cols_u, cols_g, table, g = _mk(dp, Vc, n_u=300, n_g=200, skew_empty=skew_empty)
    m = jnp.zeros_like(table)
    v = jnp.zeros_like(table)
    g_aug = make_aug_grads(g, None)
    kw = dict(dim=dp, fold=1, loss_scale=4.0, tile=128, chunk=64,
              matmul_dtype=jnp.float32, interpret=True)

    t_ref, m_ref, v_ref = streamed_adam_cols(
        table, m, v, cols_u, g_aug, jnp.float32(1e-2), **kw)
    rows_ref = streamed_gather(t_ref, cols_g, tile=128, chunk=64,
                               matmul_dtype=jnp.float32, interpret=True)

    t2, m2, v2, rows = fused_adam_gather(
        table, m, v, cols_u, g_aug, jnp.float32(1e-2), cols_g, **kw)

    np.testing.assert_allclose(np.asarray(t2), np.asarray(t_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rows), np.asarray(rows_ref), rtol=1e-6)


@pytest.mark.parametrize("skew_empty", [False, True])
def test_fused_ftrl_matches_separate(skew_empty):
    dp, Vc = 8, 1024
    cols_u, cols_g, table, g = _mk(dp, Vc, n_u=256, n_g=192, seed=7, skew_empty=skew_empty)
    accum = jnp.full_like(table, 1.0)
    linear = jnp.zeros_like(table)
    g_aug = make_aug_grads(g, None)
    kw = dict(dim=dp, fold=1, loss_scale=1.0, tile=128, chunk=64,
              matmul_dtype=jnp.float32, interpret=True)

    t_ref, a_ref, l_ref = streamed_ftrl_cols(
        table, accum, linear, cols_u, g_aug, **kw)
    rows_ref = streamed_gather(t_ref, cols_g, tile=128, chunk=64,
                               matmul_dtype=jnp.float32, interpret=True)

    t2, a2, l2, rows = fused_ftrl_gather(
        table, accum, linear, cols_u, g_aug, cols_g, **kw)

    np.testing.assert_allclose(np.asarray(t2), np.asarray(t_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rows), np.asarray(rows_ref), rtol=1e-6)


def test_fused_adam_folded_table():
    """fold=8 scalar table (the wide side's storage)."""
    dp, Vc = 8, 512
    rng = np.random.default_rng(3)
    n = 200
    ids_u = np.sort(rng.integers(0, Vc * 8, n)).astype(np.int32)
    ids_g = np.sort(rng.integers(0, Vc * 8, n)).astype(np.int32)
    cols_u, sub_u = jnp.asarray(ids_u // 8), jnp.asarray(ids_u % 8)
    cols_g = jnp.asarray(ids_g // 8)
    table = jnp.asarray(rng.normal(size=(dp, Vc)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(dp, n)).astype(np.float32))
    # mask grads into the owning sub-row like the step does
    mask = (np.arange(dp)[:, None] == np.asarray(sub_u)[None, :]).astype(np.float32)
    g = g * mask
    g_aug = make_aug_grads(g, sub_u)
    kw = dict(dim=1, fold=8, loss_scale=1.0, tile=128, chunk=64,
              matmul_dtype=jnp.float32, interpret=True)
    m = jnp.zeros_like(table)
    v = jnp.zeros_like(table)
    t_ref, m_ref, v_ref = streamed_adam_cols(
        table, m, v, cols_u, g_aug, jnp.float32(1e-2), **kw)
    rows_ref = streamed_gather(t_ref, cols_g, tile=128, chunk=64,
                               matmul_dtype=jnp.float32, interpret=True)
    t2, m2, v2, rows = fused_adam_gather(
        table, m, v, cols_u, g_aug, jnp.float32(1e-2), cols_g, **kw)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rows), np.asarray(rows_ref), rtol=1e-6)
