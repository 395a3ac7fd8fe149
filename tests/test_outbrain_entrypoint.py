"""examples/train_outbrain.py end-to-end: synthetic smoke + the TFRecord
data path feeding the sparse multi-group step, reporting AUC and MAP@12
(reference entrypoint: models/wide_and_deep_multitable/train_and_eval.py)."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    return env


def test_entrypoint_synthetic_smoke(tmp_path):
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / "train_outbrain.py"),
         "--synthetic", "--platform", "cpu", "--batch_size", "64", "--steps_per_epoch", "5",
         "--epochs", "1", "--emb128_size", "500", "--deep_layers", "32", "16",
         "--loss_file_name", str(tmp_path / "loss.log"),
         "--eval_file_name", str(tmp_path / "eval.log")],
        cwd=tmp_path, env=_env(), capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "map12" in out.stdout and "auc" in out.stdout
    assert (tmp_path / "eval.log").exists()


def test_entrypoint_tfrecord_path(tmp_path):
    """Write synthetic Outbrain TFRecords, then train+eval from files."""
    from mindrec_tpu.data.outbrain import write_outbrain_tfrecords
    from mindrec_tpu.models.multitable import MULTI_FIELDS

    rng = np.random.default_rng(0)
    lps = 4  # samples packed per record row

    def rows(prefix_seed):
        for _ in range(24):
            row = {
                "label": rng.integers(0, 2, lps).astype(np.float32),
                "continue_val": rng.uniform(size=(lps, 32)).astype(np.float32),
                "indicator_id": rng.integers(0, 16, (lps, 13)),
                "emb_128_id": rng.integers(0, 500, (lps, 3)),
                "emb_64_single_id": rng.integers(0, 100, (lps, 6)),
                "ad_id": rng.integers(0, 1000, lps),
                "display_ad_and_is_leak": rng.integers(0, 2, lps),
                "display_id": rng.integers(0, 50, lps),
                "is_leak": rng.integers(0, 2, lps),
            }
            for name, L in zip(MULTI_FIELDS, (3, 10, 10, 10, 3, 3)):
                row[f"multi_{name}_id"] = rng.integers(0, 80, (lps, L))
                row[f"multi_{name}_id_mask"] = rng.integers(0, 2, (lps, L))
            yield row

    write_outbrain_tfrecords(tmp_path / "data", rows(0), prefix="train")
    write_outbrain_tfrecords(tmp_path / "data", rows(1), prefix="eval")

    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / "train_outbrain.py"),
         "--data_path", str(tmp_path / "data"), "--platform", "cpu", "--batch_size", "32",
         "--epochs", "1", "--emb128_size", "500",
         "--deep_layers", "32", "16",
         "--loss_file_name", str(tmp_path / "loss.log"),
         "--eval_file_name", str(tmp_path / "eval.log")],
        cwd=tmp_path, env=_env(), capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "final metrics" in out.stdout and "map12" in out.stdout
