"""Streamed gather kernel vs native gather (interpret mode) —
feature-major [Dp, Vc] storage."""

import jax.numpy as jnp
import numpy as np

from mindrec_tpu.ops.pallas.stream_gather import streamed_gather


def test_streamed_gather_matches_native():
    rng = np.random.default_rng(0)
    V, D = 1024, 16
    table = jnp.asarray(rng.normal(size=(D, V)).astype(np.float32))
    ids = np.sort(rng.integers(0, V, size=300)).astype(np.int32)
    ids[:50] = ids[50:100]  # duplicates
    ids = np.sort(ids)
    out = streamed_gather(
        table, jnp.asarray(ids), tile=256, chunk=64,
        matmul_dtype=jnp.float32, interpret=True,
    )
    want = np.asarray(table)[:, ids]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)


def test_streamed_gather_dim8():
    rng = np.random.default_rng(1)
    V, D = 512, 8
    table = jnp.asarray(rng.normal(size=(D, V)).astype(np.float32))
    ids = np.sort(rng.integers(0, V, size=200)).astype(np.int32)
    out = streamed_gather(
        table, jnp.asarray(ids), tile=128, chunk=32,
        matmul_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(table)[:, ids], rtol=1e-6)


def test_streamed_gather_boundary_chunks():
    """Ids straddling tile boundaries within one aligned chunk must all
    resolve correctly (the read-modify-write merge)."""
    V, D = 512, 8
    table = jnp.asarray(np.arange(V * D, dtype=np.float32).reshape(D, V))
    # ids clustered right at tile boundaries 128, 256, 384
    ids = np.sort(np.array(
        [126, 127, 128, 129, 254, 255, 256, 257, 383, 384, 385, 400] * 6
    )).astype(np.int32)
    out = streamed_gather(
        table, jnp.asarray(ids), tile=128, chunk=32,
        matmul_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(table)[:, ids], rtol=1e-6)


def test_streamed_gather_rows_multi_table_lane_offsets():
    """Row-major variant: two tables filling one [U, 128] buffer at
    different lane offsets; sentinel rows keep the base content."""
    from mindrec_tpu.ops.pallas.stream_gather import streamed_gather_rows

    rng = np.random.default_rng(2)
    V = 1024
    t_a = jnp.asarray(rng.normal(size=(16, V)).astype(np.float32))
    t_b = jnp.asarray(rng.normal(size=(8, V)).astype(np.float32))
    U = 256
    n_real = 200
    ids = np.sort(rng.integers(0, V, size=n_real)).astype(np.int32)
    cols = np.full(U, 2**31 - 2, np.int32)
    cols[:n_real] = ids
    base = jnp.full((U, 128), -7.0, jnp.float32)
    out = streamed_gather_rows(
        t_a, jnp.asarray(cols), base, lane_offset=0, tile=256, chunk=64,
        matmul_dtype=jnp.float32, interpret=True,
    )
    out = streamed_gather_rows(
        t_b, jnp.asarray(cols), out, lane_offset=16, tile=256, chunk=64,
        matmul_dtype=jnp.float32, interpret=True,
    )
    got = np.asarray(out)
    np.testing.assert_allclose(got[:n_real, :16], np.asarray(t_a)[:, ids].T, rtol=1e-6)
    np.testing.assert_allclose(got[:n_real, 16:24], np.asarray(t_b)[:, ids].T, rtol=1e-6)
    # untouched lanes and sentinel rows keep base content
    assert (got[:, 24:] == -7.0).all()
    assert (got[n_real:, :] == -7.0).all()


def test_streamed_gather_rows_sparse_across_tiles():
    """A chunk spanning many tiles (sparse sorted columns)."""
    from mindrec_tpu.ops.pallas.stream_gather import streamed_gather_rows

    rng = np.random.default_rng(3)
    V = 2048
    t = jnp.asarray(rng.normal(size=(8, V)).astype(np.float32))
    ids = np.sort(rng.choice(V, size=64, replace=False)).astype(np.int32)
    base = jnp.zeros((64, 128), jnp.float32)
    out = streamed_gather_rows(
        t, jnp.asarray(ids), base, lane_offset=0, tile=128, chunk=64,
        matmul_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out)[:, :8], np.asarray(t)[:, ids].T, rtol=1e-6
    )
