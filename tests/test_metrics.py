"""AUC and grouped MAP metric tests (vs sklearn where available)."""

import numpy as np
import pytest

from mindrec_tpu.train.metrics import AUCMetric, GroupedMapMetric, roc_auc


def test_auc_perfect_and_worst():
    labels = np.array([0, 0, 1, 1])
    assert roc_auc(labels, np.array([0.1, 0.2, 0.8, 0.9])) == 1.0
    assert roc_auc(labels, np.array([0.9, 0.8, 0.2, 0.1])) == 0.0


def test_auc_matches_sklearn_random():
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    labels = (rng.uniform(size=5000) > 0.7).astype(np.float32)
    # include ties
    scores = np.round(rng.uniform(size=5000), 2)
    ours = roc_auc(labels, scores)
    ref = sklearn.roc_auc_score(labels, scores)
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_auc_metric_accumulates():
    m = AUCMetric()
    m.update(np.array([0.9, 0.1]), np.array([1.0, 0.0]))
    m.update(np.array([0.8, 0.2]), np.array([1.0, 0.0]))
    assert m.eval() == 1.0
    m.clear()
    with pytest.raises(RuntimeError):
        m.eval()


def test_grouped_map_at_k():
    m = GroupedMapMetric(k=2)
    # group 0: scores rank the positive first -> AP = 1
    m.update(
        probs=np.array([0.9, 0.1, 0.8, 0.7]),
        labels=np.array([1.0, 0.0, 0.0, 1.0]),
        group_ids=np.array([0, 0, 1, 1]),
    )
    # group 1: positive ranked second -> AP = 1/2
    assert abs(m.eval() - 0.75) < 1e-9


def _map_at_k_loop(scores, labels, groups, k):
    """Per-group loop reference (the pre-vectorization implementation)."""
    ap_sum, n_groups = 0.0, 0
    for g in np.unique(groups):
        m = groups == g
        s, l = scores[m], labels[m]
        order = np.argsort(-s, kind="mergesort")[:k]
        l_top = l[order]
        prec = np.cumsum(l_top) / (np.arange(l_top.size) + 1.0)
        denom = min(int(l.sum()), k)
        if denom > 0:
            ap_sum += float((prec * l_top).sum() / denom)
            n_groups += 1
    return ap_sum / n_groups if n_groups else 0.0


def test_grouped_map_matches_loop_reference():
    rng = np.random.default_rng(7)
    n = 20_000
    groups = rng.integers(0, 1500, size=n)
    scores = np.round(rng.uniform(size=n), 2)  # ties
    labels = (rng.uniform(size=n) > 0.8).astype(np.float64)
    m = GroupedMapMetric(k=12)
    m.update(scores, labels, groups)
    ref = _map_at_k_loop(scores, labels, groups, 12)
    np.testing.assert_allclose(m.eval(), ref, atol=1e-12)


def test_grouped_map_eval_is_fast():
    # Outbrain-scale eval pass: 131k rows, ~11k display groups, < 1 s
    import time

    rng = np.random.default_rng(0)
    n = 131_072
    groups = rng.integers(0, 11_000, size=n)
    scores = rng.uniform(size=n)
    labels = (rng.uniform(size=n) > 0.8).astype(np.float64)
    m = GroupedMapMetric(k=12)
    m.update(scores, labels, groups)
    t0 = time.perf_counter()
    v = m.eval()
    assert time.perf_counter() - t0 < 1.0
    assert 0.0 < v < 1.0


def test_grouped_map_empty_rows():
    m = GroupedMapMetric(k=12)
    m.update(np.zeros(0), np.zeros(0), np.zeros(0, np.int64))
    assert m.eval() == 0.0
