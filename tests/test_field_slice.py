"""Field-slice mode (reference ``field_slice`` flag,
``models/wide_deep/src/datasets.py:182-218,329-446``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mindrec_tpu.data.field_slice import (
    CRITEO_FIELD_VOCABS,
    compute_manual_shape,
    equalized_layout,
    make_field_slice_spec,
    pad_fields,
    remap_ids,
)
from mindrec_tpu.ops.embedding import EmbeddingLookup, from_storage
from mindrec_tpu.parallel.mesh import make_mesh


def test_manual_shape_reference_parity():
    # reference target_column math: (39 // 8 + 1) * 8 = 40
    ms = compute_manual_shape(field_size=39, vocab_size=200_000, worker_size=8)
    assert ms.target_column == 40
    assert ms.worker_size == 8 and ms.part_fields == 5
    # per-part sums over CRITEO_FIELD_VOCABS, leftover in the last part
    vocabs = list(CRITEO_FIELD_VOCABS) + [1]
    sums = [sum(vocabs[i : i + 5]) for i in range(0, 40, 5)]
    rows = [r for r, _ in ms.parts]
    assert rows[:-1] == sums[:-1]
    assert sum(rows) == 200_000 == ms.vocab_total
    # offsets accumulate the ORIGINAL sums (datasets.py:417-421)
    offs = [o for _, o in ms.parts]
    assert offs == [sum(sums[:p]) for p in range(8)]


def test_manual_shape_rejects_small_vocab():
    with pytest.raises(ValueError):
        compute_manual_shape(field_size=39, vocab_size=10, worker_size=8)


def test_pad_fields_filler_and_zero_weight():
    ms = compute_manual_shape(39, 200_000, 8)
    rng = np.random.default_rng(0)
    ids = np.stack(
        [rng.integers(o, o + r, size=4) for r, o in ms.parts for _ in range(5)]
    ).T[:, :39]
    wts = np.ones((4, 39), np.float32)
    ids_p, wts_p = pad_fields(ids, wts, ms)
    assert ids_p.shape == (4, 40) and wts_p.shape == (4, 40)
    # the padded position belongs to the last part; its filler is that
    # part's last row and its weight is zero (datasets.py:186-206)
    r, o = ms.parts[-1]
    assert (ids_p[:, 39] == r + o - 1).all()
    assert (wts_p[:, 39] == 0).all()
    assert (ids_p[:, :39] == ids).all() and (wts_p[:, :39] == 1).all()


def test_equalized_layout_alignment():
    ms = compute_manual_shape(39, 200_000, 4)
    rows, vocab = equalized_layout(ms, row_alignment=1024)
    assert rows % 1024 == 0
    assert vocab == 4 * rows - 8
    spec, rows2 = make_field_slice_spec(ms, emb_dim=8, row_alignment=1024)
    assert rows2 == rows and spec.padded_vocab == 4 * rows


def test_remap_locality_and_sharded_lookup():
    """Remapped ids stay inside their part's shard, and a row-sliced
    lookup over a (data, model) mesh returns the right rows."""
    W = 4
    ms = compute_manual_shape(39, 200_000, W)
    spec, rows_per_part = make_field_slice_spec(ms, emb_dim=8, row_alignment=1024)

    rng = np.random.default_rng(1)
    B = 16
    parts = [ms.part_of_field(f) for f in range(39)]
    ids = np.stack(
        [rng.integers(ms.parts[p][1], ms.parts[p][1] + ms.parts[p][0], size=B)
         for p in parts],
        axis=1,
    )
    wts = np.ones((B, 39), np.float32)
    ids_p, wts_p = pad_fields(ids, wts, ms)
    new_ids = remap_ids(ids_p, ms, rows_per_part)

    # locality: field f's ids land in shard part_of_field(f)
    for f in range(ms.target_column):
        p = ms.part_of_field(f)
        lo, hi = p * rows_per_part, (p + 1) * rows_per_part
        assert (new_ids[:, f] >= lo).all() and (new_ids[:, f] < hi).all()

    mesh = make_mesh(data=2, model=W)
    lookup = EmbeddingLookup(spec, mesh)
    table = lookup.init(jax.random.PRNGKey(0))
    out = jax.jit(lookup.__call__)(table, jnp.asarray(new_ids))
    logical = from_storage(spec, table)
    np.testing.assert_allclose(np.asarray(out), logical[new_ids], rtol=1e-6)
    # padded field positions read real (part-local filler) rows but are
    # masked by their zero weight downstream
    assert (wts_p[:, 39] == 0).all()


def test_remap_clips_oov_into_part():
    ms = compute_manual_shape(39, 200_000, 4)
    _, rows_per_part = make_field_slice_spec(ms, emb_dim=8, row_alignment=1024)
    ids = np.zeros((2, ms.target_column), np.int64)
    ids[:, :] = 10**9  # way past every part
    new_ids = remap_ids(ids, ms, rows_per_part)
    for f in range(ms.target_column):
        p = ms.part_of_field(f)
        assert (new_ids[:, f] == p * rows_per_part + ms.parts[p][0] - 1).all()
