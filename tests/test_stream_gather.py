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
