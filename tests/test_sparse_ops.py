"""unique_pad / segment_sum static-shape sparse utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from mindrec_tpu.ops.sparse import segment_sum_rows, unique_pad


def test_unique_pad_basic():
    ids = jnp.array([[5, 3, 5], [3, 9, 5]])
    uq = unique_pad(ids, size=6, fill_value=100)
    assert uq.ids.shape == (6,)
    assert int(uq.count) == 3
    real = np.asarray(uq.ids)[:3]
    np.testing.assert_array_equal(np.sort(real), [3, 5, 9])
    # padded slots get fill value
    np.testing.assert_array_equal(np.asarray(uq.ids)[3:], [100, 100, 100])
    # inverse reconstructs
    recon = np.asarray(uq.ids)[np.asarray(uq.inverse)]
    np.testing.assert_array_equal(recon, np.asarray(ids))


def test_unique_pad_jittable():
    f = jax.jit(lambda x: unique_pad(x, size=8, fill_value=50).ids)
    out = f(jnp.array([1, 1, 2, 3, 3, 3, 4, 5]))
    assert out.shape == (8,)


def test_segment_sum_rows_combines_duplicates():
    vals = jnp.array([[1.0, 1.0], [2.0, 2.0], [3.0, 3.0]])
    seg = jnp.array([0, 1, 0])
    out = segment_sum_rows(vals, seg, num_segments=2)
    np.testing.assert_allclose(np.asarray(out), [[4.0, 4.0], [2.0, 2.0]])


def test_batch_sort_unique_bucket_guard():
    """Host prep must fail loud when a batch exceeds the static unique
    bucket the step was compiled with (silent id drops otherwise)."""
    import numpy as np
    import pytest

    from mindrec_tpu.train.step import make_batch_sort

    prep = make_batch_sort(4, unique_bucket=8)
    ok = {"ids": np.array([[1, 2, 3, 4]] * 4, np.int32)}
    out = prep(ok)
    assert out["uq_ids"].shape == (16,)
    bad = {"ids": np.arange(16, dtype=np.int32).reshape(4, 4)}
    with pytest.raises(RuntimeError, match="unique_bucket"):
        prep(bad)
