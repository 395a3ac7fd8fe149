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
