"""Outbrain TFRecord dataset (reference
``models/wide_and_deep_multitable/src/datasets.py``)."""

import jax
import numpy as np
import pytest

from mindrec_tpu.data.outbrain import (
    OutbrainTFRecordDataset,
    compute_emb_dim,
    write_outbrain_tfrecords,
)
from mindrec_tpu.models.multitable import (
    MULTI_FIELDS,
    MultiTableConfig,
    MultiTableWideDeepModel,
)

CFG = MultiTableConfig(
    batch_size=8,
    continue_field_size=4,
    indicator_field_size=2,
    emb128_field_size=1,
    emb64_single_field_size=2,
    multi_hot_sizes=(3, 4, 3, 2, 2, 3),
    emb_128_size=100,
    emb64_single_size=50,
    emb64_multi_size=60,
    indicator_size=16,
    deep_layer_dim=(16,),
    use_mixed_precision=False,
    loss_scale=1.0,
)

# hot lengths by reference column name; MULTI_FIELDS order defines
# multi_hot_sizes, so invert that mapping
HOT = {f"multi_{n}_id": l for n, l in zip(MULTI_FIELDS, CFG.multi_hot_sizes)}


def _rows(n, lps, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        row = {
            "label": rng.integers(0, 2, (lps, 1)).astype(np.float32),
            "continue_val": rng.uniform(size=(lps, CFG.continue_field_size)).astype(np.float32),
            "indicator_id": rng.integers(0, CFG.indicator_size, (lps, CFG.indicator_field_size)),
            "emb_128_id": rng.integers(0, CFG.emb_128_size, (lps, CFG.emb128_field_size)),
            "emb_64_single_id": rng.integers(0, CFG.emb64_single_size, (lps, CFG.emb64_single_field_size)),
            "ad_id": rng.integers(0, 1000, (lps, 1)),
            "display_ad_and_is_leak": rng.integers(0, 2, (lps, 1)),
            "display_id": rng.integers(0, 50, (lps, 1)),
            "is_leak": rng.integers(0, 2, (lps, 1)),
        }
        for col, L in HOT.items():
            row[col] = rng.integers(0, CFG.emb64_multi_size, (lps, L))
            row[col + "_mask"] = rng.integers(0, 2, (lps, L))
        yield row


def test_roundtrip_and_model_forward(tmp_path):
    lps = 4
    paths = write_outbrain_tfrecords(tmp_path, _rows(6, lps), rows_per_file=4)
    assert len(paths) == 2
    ds = OutbrainTFRecordDataset(tmp_path, batch_size=8, train_mode=True)
    assert ds.line_per_sample == lps  # from the shape sidecar
    batches = list(ds)
    assert len(batches) == 3  # 6 rows * 4 lps / 8
    b = batches[0]
    assert b["label"].shape == (8, 1) and b["label"].dtype == np.float32
    assert b["display_id"].shape == (8,)
    for name, L in zip(MULTI_FIELDS, CFG.multi_hot_sizes):
        assert b[f"multi_{name}_id"].shape == (8, L)
        assert b[f"multi_{name}_mask"].dtype == np.float32

    model = MultiTableWideDeepModel(CFG)
    params = model.init(jax.random.PRNGKey(0))
    out = jax.jit(lambda p, bb: model.apply(p, bb))(
        params, {k: v for k, v in b.items()}
    )
    assert out.shape == (8, 1) and np.isfinite(np.asarray(out)).all()


def test_batch_size_validation(tmp_path):
    write_outbrain_tfrecords(tmp_path, _rows(2, 4))
    with pytest.raises(ValueError, match="multiple"):
        OutbrainTFRecordDataset(tmp_path, batch_size=6)
    with pytest.raises(ValueError, match="positive"):
        OutbrainTFRecordDataset(tmp_path, batch_size=0)


def test_file_sharding_and_eval_prefix(tmp_path):
    write_outbrain_tfrecords(tmp_path, _rows(4, 2), rows_per_file=1, prefix="eval")
    with pytest.raises(FileNotFoundError):
        OutbrainTFRecordDataset(tmp_path, 2, train_mode=True)
    ds0 = OutbrainTFRecordDataset(tmp_path, 2, train_mode=False, num_shards=2, shard_id=0)
    ds1 = OutbrainTFRecordDataset(tmp_path, 2, train_mode=False, num_shards=2, shard_id=1)
    assert len(ds0.files) == 2 and len(ds1.files) == 2
    assert set(ds0.files).isdisjoint(ds1.files)


def test_compute_emb_dim():
    shapes = {
        "continue_val": [4, CFG.continue_field_size],
        "indicator_id": [4, CFG.indicator_field_size],
        "emb_128_id": [4, CFG.emb128_field_size],
        "emb_64_single_id": [4, CFG.emb64_single_field_size],
        **{c: [4, HOT[c]] for c in HOT},
    }
    out = compute_emb_dim(shapes)
    assert out["input_emb_dim"] == CFG.input_emb_dim
    assert out["field_sizes"]["emb_128_id"] == CFG.emb128_field_size
