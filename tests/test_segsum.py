"""Streamed monotone segment-sum kernel (interpret mode) vs numpy."""

import jax.numpy as jnp
import numpy as np
import pytest

from mindrec_tpu.ops.pallas.stream_segsum import streamed_segsum


def _ref(g, uidx, n_out):
    out = np.zeros((g.shape[0], n_out), np.float32)
    np.add.at(out.T, uidx, np.asarray(g).T)
    return out


@pytest.mark.parametrize("seed,n,dup", [(0, 640, 3), (1, 1024, 40), (2, 257, 1)])
def test_segsum_matches_numpy(seed, n, dup):
    rng = np.random.default_rng(seed)
    # monotone unit-step segment ids with duplicate runs
    reps = rng.integers(1, dup + 1, size=n)
    uidx = np.repeat(np.arange(n), reps)[:n].astype(np.int32)
    g = rng.normal(size=(8, n)).astype(np.float32)
    out = streamed_segsum(
        jnp.asarray(g), jnp.asarray(uidx), width=128, chunk=64,
        matmul_dtype=jnp.float32, interpret=True,
    )
    n_out = out.shape[1]
    ref = _ref(g, uidx, n_out)
    u_max = int(uidx.max()) + 1
    np.testing.assert_allclose(np.asarray(out)[:, :u_max], ref[:, :u_max], rtol=1e-5, atol=1e-5)


def test_segsum_heavy_duplication():
    """One hot id owning most of the batch (power-law worst case)."""
    n = 512
    uidx = np.zeros(n, np.int32)
    uidx[-5:] = [1, 2, 3, 3, 4]
    g = np.ones((8, n), np.float32)
    out = streamed_segsum(
        jnp.asarray(g), jnp.asarray(uidx), width=128, chunk=64,
        matmul_dtype=jnp.float32, interpret=True,
    )
    assert float(out[0, 0]) == n - 5
    assert float(out[0, 3]) == 2.0
    assert float(out[0, 4]) == 1.0


@pytest.mark.parametrize("seed,n,dup", [(0, 640, 3), (1, 1024, 40)])
def test_segsum_row_major_matches_columnar(seed, n, dup):
    rng = np.random.default_rng(seed)
    reps = rng.integers(1, dup + 1, size=n)
    uidx = np.repeat(np.arange(n), reps)[:n].astype(np.int32)
    g = rng.normal(size=(8, n)).astype(np.float32)
    col = streamed_segsum(
        jnp.asarray(g), jnp.asarray(uidx), width=128, chunk=64,
        matmul_dtype=jnp.float32, interpret=True,
    )
    row = streamed_segsum(
        jnp.asarray(g.T.copy()), jnp.asarray(uidx), width=128, chunk=64,
        matmul_dtype=jnp.float32, row_major=True, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(row), np.asarray(col), rtol=1e-6)


def test_segsum_small_n_out_bound():
    """n_out below N (the static unique bucket) shrinks the output."""
    n = 512
    uidx = np.repeat(np.arange(64), 8).astype(np.int32)
    g = np.ones((4, n), np.float32)
    out = streamed_segsum(
        jnp.asarray(g), jnp.asarray(uidx), width=128, chunk=64,
        matmul_dtype=jnp.float32, n_out=128, interpret=True,
    )
    assert out.shape == (4, 128)
    np.testing.assert_allclose(np.asarray(out)[:, :64], 8.0)


def test_segsum_unsorted_matches_numpy():
    """streamed_segsum_unsorted: arbitrary-order segment ids (raw ids,
    no sort) over one resident output block — the tiny-vocab fast path
    of the sparse step."""
    from mindrec_tpu.ops.pallas.stream_segsum import streamed_segsum_unsorted

    rng = np.random.default_rng(3)
    n, d, n_out = 700, 16, 128  # n not a chunk multiple -> padding path
    seg = rng.integers(0, 100, size=n).astype(np.int32)
    g = rng.normal(size=(n, d)).astype(np.float32)
    out = streamed_segsum_unsorted(
        jnp.asarray(g), jnp.asarray(seg), n_out, chunk=256,
        matmul_dtype=jnp.float32, interpret=True,
    )
    want = np.zeros((d, n_out), np.float32)
    for i in range(n):
        want[:, seg[i]] += g[i]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-6)


def test_segsum_unsorted_out_of_range_ids_drop():
    from mindrec_tpu.ops.pallas.stream_segsum import streamed_segsum_unsorted

    seg = np.array([0, 5, 500, -3, 5], np.int32)  # 500/-3 out of range
    g = np.ones((5, 8), np.float32)
    out = streamed_segsum_unsorted(
        jnp.asarray(g), jnp.asarray(seg), 128, chunk=256,
        matmul_dtype=jnp.float32, interpret=True,
    )
    o = np.asarray(out)
    assert o[:, 0].sum() == 8.0 and o[:, 5].sum() == 16.0
    np.testing.assert_allclose(o.sum(), 24.0)  # droppers contribute 0
