"""REAL multi-process distributed execution (no virtual-mesh shortcuts).

The reference's whole L6 story is multi-process role spawning
(``run_parameter_server_distribute_train.sh:39-75``): 1 scheduler + S
servers + W workers formed over env-var dynamic networking.  These tests
spawn actual OS processes on the CPU backend:

* ``test_dp_two_processes[dense|sparse]`` — 2 trainer processes join via
  the MR_* env bootstrap (``parallel/dist.initialize_from_env``), train
  DP over a process-spanning mesh, and the post-step params must equal a
  single-process run of the same global batches.
* ``test_ps_three_role_topology`` — the full 3-role spawn: 1 scheduler +
  2 native table servers + 2 workers, training cache-mode Wide&Deep
  through ``cached_train_step`` + ``RemoteTier``; the server-held rows
  are then bit-compared against a single-process HostTier oracle.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPTS = REPO / "tests" / "mp_scripts"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(extra: dict) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    env.update({k: str(v) for k, v in extra.items()})
    return env


def _wait_all(procs, timeout=300):
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, (
            f"proc {p.args} rc={p.returncode}\n{out.decode(errors='replace')[-4000:]}"
        )
    return outs


@pytest.mark.parametrize("sparse", [False, True], ids=["dense", "sparse"])
def test_dp_two_processes(tmp_path, sparse):
    port = _free_port()
    out_file = tmp_path / "params.npz"
    procs = []
    for wid in range(2):
        cmd = [sys.executable, str(SCRIPTS / "dp_worker.py"),
               "--steps", "2", "--out", str(out_file)]
        if sparse:
            cmd.append("--sparse")
        procs.append(subprocess.Popen(
            cmd,
            env=_env({
                "MR_SCHED_HOST": "127.0.0.1",
                "MR_SCHED_PORT": port,
                "MR_WORKER_NUM": 2,
                "MR_WORKER_ID": wid,
                "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            }),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    _wait_all(procs)
    got = np.load(out_file)

    # single-process oracle on the same global batches
    import jax

    from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.step import (
        flatten_params,
        init_train_state,
        make_train_step,
    )

    sys.path.insert(0, str(SCRIPTS))
    try:
        from dp_worker import global_batch
    finally:
        sys.path.pop(0)

    cfg = WideDeepConfig(
        batch_size=32, field_size=8, vocab_size=512, emb_dim=8,
        deep_layer_dim=(32, 16), use_mixed_precision=False, loss_scale=1.0,
        sparse=sparse,
        deep_table_slice_mode="table_row_slice" if sparse else "none",
    )
    model = WideDeepModel(cfg)
    opts = (optim.ftrl(), optim.lazy_adam())
    state = init_train_state(model, jax.random.PRNGKey(0), *opts)
    step = make_train_step(model, *opts, jit=True, donate=False)
    for s in range(2):
        state, (lw, ld) = step(state, global_batch(cfg, seed=s))

    assert float(got["__loss_w__"]) == pytest.approx(float(lw), rel=1e-4)
    assert float(got["__loss_d__"]) == pytest.approx(float(ld), rel=1e-4)
    flat, _ = flatten_params(state.params)
    for key, leaf in flat:
        np.testing.assert_allclose(
            got[key], np.asarray(leaf), rtol=1e-5, atol=1e-6,
            err_msg=f"multi-process DP diverged from single-process at {key}",
        )


def test_ps_three_role_topology(tmp_path):
    """1 MR_SCHED + 2 MR_PSERVER (native table servers) + 1 MR_WORKER,
    all running the same entrypoint (reference launch-script contract)."""
    from mindrec_tpu.ops.remote import RemoteTier, server_binary_path, stop_table_server

    if not server_binary_path().exists():
        subprocess.run(
            ["make", "-C", str(server_binary_path().parent), "mindrec_table_server"],
            check=True, capture_output=True,
        )

    sched_port = _free_port()
    srv_ports = [_free_port(), _free_port()]
    srv_addrs = [f"127.0.0.1:{p}" for p in srv_ports]
    common = {
        "MR_SCHED_HOST": "127.0.0.1",
        "MR_SCHED_PORT": sched_port,
        "MR_SERVER_NUM": 2,
        "MR_SERVER_HOSTS": ",".join(srv_addrs),
        "MR_WORKER_NUM": 2,
    }
    entry = [sys.executable, str(SCRIPTS / "ps_worker.py")]

    servers = [
        subprocess.Popen(
            entry,
            env=_env({**common, "MR_ROLE": "MR_PSERVER", "MR_SERVER_PORT": p,
                      "MR_SPILL_DIR": str(tmp_path / f"srv{i}")}),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i, p in enumerate(srv_ports)
    ]
    try:
        # wait for both servers to accept
        import time

        for p in srv_ports:
            deadline = time.monotonic() + 20
            while True:
                try:
                    socket.create_connection(("127.0.0.1", p), timeout=0.2).close()
                    break
                except OSError:
                    assert time.monotonic() < deadline, f"server :{p} never came up"
                    time.sleep(0.05)

        trainers = [
            subprocess.Popen(
                entry,
                env=_env({**common,
                          "MR_ROLE": "MR_SCHED" if wid == 0 else "MR_WORKER",
                          "MR_WORKER_ID": wid,
                          "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for wid in range(2)
        ]
        _wait_all(trainers)

        # oracle: re-run each worker's training single-process on HostTier
        sys.path.insert(0, str(SCRIPTS))
        try:
            from ps_worker import build_and_train
        finally:
            sys.path.pop(0)

        for wid in range(2):
            oracle, touched = build_and_train(None, wid, 2)
            for name, tiers in oracle.tiers.items():
                for tname, tier in tiers.items():
                    want = tier.read(touched)
                    remote = RemoteTier(
                        srv_addrs,
                        name if tname == "param" else f"{name}.{tname}",
                        tier.dim, init_std=0.0,
                    )
                    got = remote.read(touched)
                    remote.close()
                    np.testing.assert_allclose(
                        got, want, rtol=1e-5, atol=1e-7,
                        err_msg=(
                            f"server rows diverge from single-process oracle: "
                            f"worker {wid} table {name}.{tname}"
                        ),
                    )
    finally:
        for a in srv_addrs:
            stop_table_server(a)
        for s in servers:
            try:
                s.wait(timeout=10)
            except subprocess.TimeoutExpired:
                s.kill()
