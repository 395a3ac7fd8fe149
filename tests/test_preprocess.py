"""Criteo TSV preprocessing parity tests
(reference ``datasets/criteo_1tb/process_data.py``)."""

import numpy as np

from mindrec_tpu.data.preprocess import (
    N_CAT,
    N_DENSE,
    CriteoStats,
    collect_stats,
    preprocess,
    transform_rows,
)


def _row(label, dense, cats):
    dense = list(dense) + [None] * (N_DENSE - len(dense))
    d = [str(x) if x is not None else "" for x in dense]
    c = list(cats) + [""] * (N_CAT - len(cats))
    return "\t".join([str(label)] + d + c)


def _write_tsv(path, rows):
    path.write_text("\n".join(rows) + "\n")
    return str(path)


def test_stats_minmax_and_threshold(tmp_path):
    rows = []
    # value "hot" appears 10x (> threshold 6 -> gets an id);
    # value "cold" appears 2x (<= threshold -> OOV)
    for i in range(10):
        rows.append(_row(1, [i, 2 * i] + [None] * (N_DENSE - 2), ["hot"]))
    for i in range(2):
        rows.append(_row(0, [100] + [None] * (N_DENSE - 1), ["cold"]))
    f = _write_tsv(tmp_path / "day0.tsv", rows)
    stats = collect_stats([f], workers=1)
    assert stats.vmin[0] == 0 and stats.vmax[0] == 100
    assert stats.vmin[1] == 0 and stats.vmax[1] == 18
    assert "hot" in stats.cat2id[0] and "cold" not in stats.cat2id[0]
    # id space: 13 dense slots, then col vocab + 1 OOV bucket per col
    assert stats.per_col_base[N_DENSE] == N_DENSE
    assert stats.vocab_size == N_DENSE + sum(len(c) + 1 for c in stats.cat2id)


def test_stats_multiprocess_merge(tmp_path):
    f1 = _write_tsv(tmp_path / "a.tsv", [_row(0, [5], ["x"] ) for _ in range(4)])
    f2 = _write_tsv(tmp_path / "b.tsv", [_row(1, [-3], ["x"]) for _ in range(4)])
    stats = collect_stats([f1, f2], workers=2, threshold=6)
    assert stats.vmin[0] == -3 and stats.vmax[0] == 5
    # "x" total count 8 > 6 -> admitted even though each file only has 4
    assert "x" in stats.cat2id[0]


def test_transform_scaling_and_oov(tmp_path):
    rows = [_row(1, [0], ["hot"])] * 8
    f = _write_tsv(tmp_path / "c.tsv", rows + [_row(0, [10], ["hot"])])
    stats = collect_stats([f], workers=1)
    out = list(transform_rows([_row(1, [5], ["hot"]), _row(0, [10], ["never-seen"])], stats))
    ids0, wts0, lab0 = out[0]
    assert lab0 == 1.0
    assert wts0[0] == 0.5  # min-max scaled (0..10 -> 5 = 0.5)
    assert ids0[0] == 0  # dense slot id = column index
    assert ids0[N_DENSE] == stats.cat2id[0]["hot"]
    ids1, wts1, _ = out[1]
    oov = stats.per_col_base[N_DENSE] + len(stats.cat2id[0])
    assert ids1[N_DENSE] == oov  # unseen value -> per-column OOV bucket
    assert np.all(wts1[N_DENSE:] == 1.0)


def test_stats_save_load_roundtrip(tmp_path):
    f = _write_tsv(tmp_path / "d.tsv", [_row(1, [3], ["q"] ) for _ in range(8)])
    stats = collect_stats([f], workers=1)
    stats.save(tmp_path / "stats.pkl")
    back = CriteoStats.load(tmp_path / "stats.pkl")
    assert back.vocab_size == stats.vocab_size
    assert back.cat2id[0] == stats.cat2id[0]


def test_full_preprocess_packed_split(tmp_path):
    rows = [_row(i % 2, [i], [f"v{i % 3}"]) for i in range(200)]
    f = _write_tsv(tmp_path / "day.tsv", rows)
    stats = preprocess(
        [f], tmp_path / "out", workers=1, line_per_sample=10, test_fraction=0.1
    )
    from mindrec_tpu.data.criteo import PackedCriteoDataset

    train = list(PackedCriteoDataset(tmp_path / "out" / "train", batch_size=10, line_per_sample=10))
    test = list(PackedCriteoDataset(tmp_path / "out" / "test", batch_size=10, line_per_sample=10))
    n_train = sum(b["ids"].shape[0] for b in train)
    n_test = sum(b["ids"].shape[0] for b in test)
    assert n_train == 180 and n_test == 20  # 90/10 split (reference :323-329)
    b = train[0]
    assert b["ids"].shape == (10, 39) and b["wts"].shape == (10, 39)
    assert b["ids"].max() < stats.vocab_size
    assert (tmp_path / "out" / "stats.pkl").exists()
