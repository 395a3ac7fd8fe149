"""Statistical accuracy parity (VERDICT r1 item 4).

The reference's quality oracle is AUC 0.80 on Criteo
(``README.md:88-94``).  Real Criteo is unavailable here, so the gate
trains on the statistics-faithful planted-model synthetic
(``data/realistic.py``, Bayes AUC ≈ 0.85) and requires the trained AUC
to clear 0.75 — materially above both chance and the old 0.65 smoke
bar, and within ~90% of the planted ceiling.  A fast test pins the
generator's published-statistics properties.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from mindrec_tpu.data.realistic import RealisticCriteo

REPO = Path(__file__).resolve().parent.parent


def test_generator_statistics():
    gen = RealisticCriteo(vocab_scale=0.003)
    # ~27% positive rate (criteo ~26%)
    assert 0.2 < gen.positive_rate() < 0.35
    # planted ceiling in the published-AUC regime
    bayes = gen.bayes_auc(50_000)
    assert 0.82 < bayes < 0.92
    # zipf head concentration: top-10 ids dominate a large column
    _, cat, _, _ = gen.sample(50_000)
    big_col = int(np.argmax(gen.card))
    _, cnt = np.unique(cat[:, big_col], return_counts=True)
    cnt.sort()
    assert cnt[-10:].sum() / cnt.sum() > 0.25
    # deterministic across instances (hash-derived ground truth)
    g2 = RealisticCriteo(vocab_scale=0.003)
    a = gen.sample(100, step=5)
    b = g2.sample(100, step=5)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_tsv_preprocess_roundtrip(tmp_path):
    """write_tsv -> the real 2-pass preprocess -> packed shards ->
    batches with the planted signal intact (labels match)."""
    from mindrec_tpu.data.criteo import PackedCriteoDataset
    from mindrec_tpu.data.preprocess import preprocess
    from mindrec_tpu.data.realistic import write_tsv

    gen = RealisticCriteo(vocab_scale=0.001)
    files = write_tsv(gen, tmp_path / "raw", 4000, rows_per_file=2000)
    assert len(files) == 2
    preprocess(files, str(tmp_path / "packed"), workers=2,
               line_per_sample=50, threshold=0)
    ds = PackedCriteoDataset(tmp_path / "packed" / "train", 200, line_per_sample=50)
    batch = next(iter(ds))
    assert batch["ids"].shape == (200, 39)
    assert batch["wts"][:, :13].max() <= 1.0 + 1e-6  # min-max scaled ints
    assert (batch["wts"][:, 13:] == 1.0).all()
    assert 0.1 < batch["label"].mean() < 0.5
    assert (tmp_path / "packed" / "test").exists()


@pytest.mark.slow
def test_accuracy_gate():
    """Slow regression gate: W&D must clear AUC 0.75 on the planted
    synthetic (Bayes ~0.85) in ~1.2M samples — catches optimizer/loss/
    sparse-path regressions the 0.65 smoke test cannot."""
    import jax

    from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.metrics import AUCMetric
    from mindrec_tpu.train.step import (
        init_train_state,
        make_eval_step,
        make_train_step,
    )

    gen = RealisticCriteo(vocab_scale=0.001)
    cfg = WideDeepConfig(
        batch_size=2000, field_size=39, vocab_size=gen.vocab_size,
        emb_dim=16, deep_layer_dim=(256, 128, 64), sparse=True,
        loss_scale=1024.0,
    )
    model = WideDeepModel(cfg)
    ow = optim.ftrl(loss_scale=cfg.loss_scale)
    od = optim.lazy_adam(loss_scale=cfg.loss_scale)
    state = init_train_state(model, jax.random.PRNGKey(0), ow, od)
    step = make_train_step(model, ow, od, jit=True, donate=False)
    ev = make_eval_step(model)
    for i in range(1, 601):
        state, _ = step(state, gen.batch(cfg.batch_size, step=i))
    m = AUCMetric()
    for i in range(5):
        b = gen.batch(2000, step=900_000 + i)
        p, l = ev(state.params, b)
        m.update(np.asarray(p), np.asarray(l))
    auc = m.eval()
    bayes = gen.bayes_auc(50_000)
    assert auc > 0.75, f"trained AUC {auc:.4f} (bayes {bayes:.4f})"


@pytest.mark.slow
def test_accuracy_pipeline_entrypoint(tmp_path):
    """examples/accuracy_run.py --pipeline at small scale: the full
    TSV -> preprocess -> packed -> train -> eval path runs and reports
    an AUC above chance."""
    import json
    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / "accuracy_run.py"),
         "--pipeline", "--async-prep", "--platform", "cpu",
         "--vocab-scale", "0.001",
         "--pipeline-rows", "60000", "--batch-size", "1000",
         "--emb-dim", "16", "--epochs", "6", "--eval-every", "6",
         "--work-dir", str(tmp_path / "wk"), "--log", str(tmp_path / "acc.log")],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    final = [json.loads(ln) for ln in out.stdout.splitlines()
             if ln.startswith("{")][-1]
    assert final["event"] == "final"
    assert final["auc"] > 0.66, final


@pytest.mark.slow
def test_bf16_table_matches_f32_auc():
    """bfloat16 table storage (halves the table HBM streams) must be
    quality-neutral: trained AUC within 0.01 of the f32-table run."""
    import jax

    from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.metrics import AUCMetric
    from mindrec_tpu.train.step import (
        init_train_state,
        make_eval_step,
        make_train_step,
    )

    gen = RealisticCriteo(vocab_scale=0.001)
    aucs = {}
    for dt in ("float32", "bfloat16"):
        cfg = WideDeepConfig(
            batch_size=2000, field_size=39, vocab_size=gen.vocab_size,
            emb_dim=16, deep_layer_dim=(256, 128, 64), sparse=True,
            loss_scale=1024.0, table_dtype=dt,
        )
        model = WideDeepModel(cfg)
        ow, od = optim.ftrl(loss_scale=1024.0), optim.lazy_adam(loss_scale=1024.0)
        state = init_train_state(model, jax.random.PRNGKey(0), ow, od)
        step = make_train_step(model, ow, od, jit=True, donate=False)
        ev = make_eval_step(model)
        for i in range(1, 401):
            state, _ = step(state, gen.batch(cfg.batch_size, step=i))
        m = AUCMetric()
        for i in range(5):
            b = gen.batch(2000, step=900_000 + i)
            p, l = ev(state.params, b)
            m.update(np.asarray(p), np.asarray(l))
        aucs[dt] = m.eval()
    assert abs(aucs["bfloat16"] - aucs["float32"]) < 0.01, aucs


def test_committed_pipeline_accuracy_meets_reference_oracle():
    """The committed chip-run artifact — the fresh-stream protocol: ONE
    pass (no sample reuse) over real-preprocessed packed shards through
    the async-prep production pipeline — must meet the reference's
    AUC 0.80 Criteo oracle (/root/reference/README.md:88-94).  r4's
    3-epoch sample-reuse run regressed to 0.7942 and the old 0.66 gate
    could not see it; this gate pins the oracle on the artifact."""
    import json

    log = REPO / "accuracy_pipeline.log"
    recs = [json.loads(ln) for ln in log.read_text().splitlines() if ln]
    finals = [r for r in recs if r.get("event") == "final"]
    assert finals, "no final record in accuracy_pipeline.log"
    assert finals[-1]["auc"] >= 0.80, finals[-1]
