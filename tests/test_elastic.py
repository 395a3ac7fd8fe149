"""Elastic recovery round trip: a trainer crashes mid-run (injected
fault), the wrapper restarts it with --resume, and training continues
from the last checkpoint with the GLOBAL step preserved.  SURVEY §5:
the reference has no automated story; this exceeds it."""

import os
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

ARGS = [
    "--model", "wide_deep", "--vocab_size", "2000", "--batch_size", "32",
    "--epochs", "1", "--steps_per_epoch", "8", "--sparse", "true",
    "--emb_dim", "8", "--deep_layer_dim", "[16,8]",
]


def _env(crash_at=None):
    env = dict(os.environ)
    env["MINDREC_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    if crash_at:
        env["MINDREC_CRASH_AT_STEP"] = str(crash_at)
    else:
        env.pop("MINDREC_CRASH_AT_STEP", None)
    return env


def test_crash_resume_roundtrip(tmp_path):
    cmd = [sys.executable, str(REPO / "examples" / "train_criteo.py"),
           *ARGS, "--ckpt_dir", str(tmp_path / "ckpt"),
           "--ckpt_interval", "2", "--ckpt_keep", "3", "--resume"]

    # run 1: crashes at step 5 (checkpoints exist at steps 2 and 4)
    r1 = subprocess.run(cmd, env=_env(crash_at=5), cwd=tmp_path,
                        capture_output=True, text=True, timeout=600)
    assert r1.returncode != 0
    assert "simulated crash at step 5" in r1.stdout + r1.stderr
    ckpts = sorted((tmp_path / "ckpt").glob("ckpt-*.npz"))
    assert ckpts, "no checkpoint written before the crash"

    # run 2: resumes from step 4 and completes
    r2 = subprocess.run(cmd, env=_env(), cwd=tmp_path,
                        capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stdout[-3000:] + r2.stderr[-3000:]
    m = re.search(r"resumed from .*step (\d+)", r2.stdout)
    assert m, r2.stdout[-2000:]
    assert int(m.group(1)) == 4
    assert "final metrics" in r2.stdout
    # post-resume checkpoints carry GLOBAL steps past the pre-crash ones
    steps = sorted(
        int(re.search(r"ckpt-(\d+)-", p.name).group(1))
        for p in (tmp_path / "ckpt").glob("ckpt-*.npz")
    )
    assert steps[-1] > 4, steps


def test_elastic_wrapper_restarts(tmp_path):
    """The shell wrapper detects the crash, restarts the trainer with
    --resume, and the whole run finishes (exit 0)."""
    env = _env(crash_at=3)
    env["MINDREC_CRASH_MARKER"] = str(tmp_path / "crashed_once")
    env["MR_CKPT_INTERVAL"] = "2"
    r = subprocess.run(
        ["bash", str(REPO / "examples" / "run_elastic_train.sh"), "2",
         *ARGS, "--ckpt_dir", str(tmp_path / "ckpt")],
        env=env, cwd=tmp_path, capture_output=True, text=True, timeout=900,
    )
    assert "restart 1/2" in r.stderr
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "resumed from" in r.stdout
    assert "final metrics" in r.stdout
