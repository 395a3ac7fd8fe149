"""Standalone eval entrypoint + records2bin converter
(reference ``models/wide_deep/eval.py``, ``infer/mindrecord2bin.py``)."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np

from mindrec_tpu import RecModel
from mindrec_tpu.data.criteo import SyntheticCriteo
from mindrec_tpu.io.checkpoint import save_checkpoint
from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
from mindrec_tpu.serving.records2bin import convert
from mindrec_tpu.train import optim

ROOT = Path(__file__).resolve().parent.parent


def test_eval_entrypoint_restores_and_reports_auc(tmp_path):
    cfg = WideDeepConfig(
        batch_size=64, field_size=4, vocab_size=500, emb_dim=4,
        deep_layer_dim=(8,), use_mixed_precision=False, loss_scale=1.0,
    )
    model = WideDeepModel(cfg)
    rm = RecModel(model, optim.ftrl(), optim.adam())
    save_checkpoint(tmp_path / "ckpt", rm.state, step=7)

    yaml = tmp_path / "cfg.yaml"
    yaml.write_text(
        "data_path: ''\ndataset_type: 'synthetic'\nbatch_size: 64\n"
        "field_size: 4\nvocab_size: 500\nemb_dim: 4\n"
        "deep_layer_dim: [8]\nuse_mixed_precision: false\nsparse: false\n"
        "loss_scale: 1.0\nsteps_per_epoch: 3\n"
    )
    env = dict(os.environ, MINDREC_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, str(ROOT / "examples/eval_criteo.py"),
         "--model", "wide_deep", "--config", str(yaml),
         "--ckpt", str(tmp_path / "ckpt"),
         "--eval_file_name", str(tmp_path / "eval.log")],
        capture_output=True, text=True, env=env, cwd=tmp_path, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "EvalCallBack metric" in out.stdout
    assert "auc" in (tmp_path / "eval.log").read_text()


def test_records2bin_layout(tmp_path):
    ds = SyntheticCriteo(16, 4, 100, steps=3, seed=0)
    n = convert(ds, tmp_path / "bins", max_batches=2)
    assert n == 2
    ids = np.frombuffer((tmp_path / "bins/ids_0.bin").read_bytes(), np.int32)
    wts = np.frombuffer((tmp_path / "bins/wts_0.bin").read_bytes(), np.float32)
    assert ids.shape == (16 * 4,) and wts.shape == (16 * 4,)
    labels = (tmp_path / "bins/labels.txt").read_text().splitlines()
    assert len(labels) == 32 and set(labels) <= {"0", "1"}
