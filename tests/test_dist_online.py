"""Distributed online learning (reference dist_online_train.py:63-97):
2 real trainer processes, FileChannel receiver sharded by rank, DP
gradients across the process group, per-rank checkpoints — final params
must equal a single-process run over the same global stream."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

BS, F, V = 16, 4, 256
STEPS = 6


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _batch(rng):
    return {
        "ids": rng.integers(0, V, (BS, F)).astype(np.int32),
        "wts": np.ones((BS, F), np.float32),
        "label": rng.integers(0, 2, (BS, 1)).astype(np.float32),
    }


def test_two_rank_online_matches_single_process(tmp_path):
    from mindrec_tpu.data.streaming import FileChannel

    spool = tmp_path / "spool"
    chan = FileChannel(spool, num_shards=2)
    sender = chan.sender()
    rng = np.random.default_rng(0)
    per_rank = [[], []]
    for _ in range(STEPS):
        for r in range(2):
            b = _batch(rng)
            per_rank[r].append(b)
            sender.send(b, shard_id=r)
    sender.close()

    port = _free_port()
    out_npz = tmp_path / "final.npz"
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
            "PYTHONPATH": f"{REPO}:{env.get('PYTHONPATH', '')}",
            "MR_SCHED_HOST": "127.0.0.1",
            "MR_SCHED_PORT": str(port),
            "MR_WORKER_NUM": "2",
            "MR_WORKER_ID": str(rank),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "examples" / "dist_online_train.py"),
             "--spool", str(spool), "--batch-size", str(BS),
             "--field-size", str(F), "--vocab", str(V),
             "--emb-dim", "8", "--deep-layers", "16", "8",
             "--ckpt-dir", str(tmp_path / "ckpt"),
             "--ckpt-interval", "2", "--ckpt-keep", "2",
             "--recv-timeout", "30", "--platform", "cpu",
             "--final-params", str(out_npz)],
            env=env, cwd=tmp_path,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out.decode(errors="replace")[-4000:]

    # per-rank checkpoints were written with retention
    for rank in range(2):
        cdir = tmp_path / "ckpt" / f"rank_{rank}"
        assert cdir.exists() and list(cdir.glob("*.npz")), f"rank {rank} ckpts"

    # single-process oracle over the same GLOBAL batches (rank slices
    # concatenated in rank order = the DP global batch)
    import jax

    from mindrec_tpu import RecModel
    from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.step import flatten_params

    cfg = WideDeepConfig(batch_size=BS * 2, field_size=F, vocab_size=V,
                         emb_dim=8, deep_layer_dim=(16, 8), sparse=True)
    model = WideDeepModel(cfg)
    rm = RecModel(model, optim.ftrl(loss_scale=cfg.loss_scale),
                  optim.lazy_adam(loss_scale=cfg.loss_scale), donate=False)
    for i in range(STEPS):
        gb = {
            k: np.concatenate([per_rank[0][i][k], per_rank[1][i][k]])
            for k in per_rank[0][i]
        }
        rm.state, _ = rm.train_step(rm.state, gb)

    got = np.load(out_npz)
    for key, leaf in flatten_params(rm.state.params)[0]:
        # tolerance sized for cross-process psum reduction-order noise
        # (a broken reducer diverges at O(1))
        np.testing.assert_allclose(
            got[key], np.asarray(leaf), rtol=1e-3, atol=5e-5,
            err_msg=f"distributed online diverged from single-process at {key}",
        )
    jax.clear_caches()
