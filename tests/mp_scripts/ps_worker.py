"""3-role PS-topology member (scheduler / table server / worker).

Spawned by ``tests/test_multiprocess.py::test_ps_three_role_topology``.
Every process runs THIS entrypoint and differentiates on ``MR_ROLE`` —
exactly the reference's launch contract
(``run_parameter_server_distribute_train.sh:39-75`` spawns 1 MS_SCHED +
S MS_PSERVER + W MS_WORKER, all on the same python script).

* ``MR_PSERVER`` — :func:`mindrec_tpu.parallel.ps.run_role` execs the
  native table server (never returns).
* ``MR_SCHED`` / ``MR_WORKER`` — join the jax.distributed cluster
  (the scheduler doubles as worker 0), then run cache-mode Wide&Deep
  training through :class:`CachedTrainingAdapter` with a
  :class:`RemoteTier` pointed at the table servers.  Each worker owns
  the ids with ``id % worker_num == worker_id`` (disjoint ownership —
  the coherence contract of worker-side optimizer state; the reference
  gets the same effect from row-sliced tables under AUTO_PARALLEL,
  ``wide_and_deep.py:232-249``).

On exit every touched row (params + optimizer state) has been flushed to
the servers; the parent verifies the server-held values bit-match a
single-process oracle run of the same batches.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel  # noqa: E402
from mindrec_tpu.parallel.ps import run_role, topology_from_env  # noqa: E402
from mindrec_tpu.train import optim  # noqa: E402
from mindrec_tpu.train.cached import CachedTrainingAdapter, cached_train_step  # noqa: E402
from mindrec_tpu.train.step import init_train_state, make_train_step  # noqa: E402

VIRTUAL_VOCAB = 100_000
CACHE_ROWS = 64
B, F, D = 8, 4, 8
STEPS = 4


def det_rows(ids: np.ndarray, dim: int, salt: int) -> np.ndarray:
    """Per-id deterministic init rows (same function in worker + oracle,
    so lazy-init call-order differences can never leak into the oracle)."""
    ids = np.asarray(ids, np.int64).reshape(-1, 1)
    j = np.arange(dim, dtype=np.int64)[None, :]
    return (((ids * 31 + j * 7 + salt) % 97).astype(np.float32) / 97.0 - 0.5) * 0.02


def owned_batches(worker_id: int, worker_num: int, steps: int = STEPS):
    """Deterministic batches whose ids all satisfy id % worker_num ==
    worker_id (disjoint ownership across workers)."""
    rng = np.random.default_rng(100 + worker_id)
    out = []
    for _ in range(steps):
        base = rng.integers(0, VIRTUAL_VOCAB // worker_num, (B, F))
        ids = base * worker_num + worker_id
        out.append({
            "ids": ids.astype(np.int64),
            "wts": rng.normal(size=(B, F)).astype(np.float32),
            "label": rng.integers(0, 2, (B, 1)).astype(np.float32),
        })
    return out


def build_and_train(remote_addrs, worker_id, worker_num, seed_tag=""):
    """Train STEPS cache-mode steps; returns (adapter, touched_ids)."""
    cfg = WideDeepConfig(
        batch_size=B, field_size=F, vocab_size=CACHE_ROWS, emb_dim=D,
        deep_layer_dim=(16, 8), sparse=True, loss_scale=1.0,
    )
    model = WideDeepModel(cfg)
    opt_w, opt_d = optim.ftrl(loss_scale=1.0), optim.lazy_adam(loss_scale=1.0)
    state = init_train_state(model, 0, opt_w, opt_d)
    adapter = CachedTrainingAdapter(
        model, virtual_vocab=VIRTUAL_VOCAB, cache_rows=CACHE_ROWS,
        max_swap=B * F + 8, remote_addrs=remote_addrs,
        spill_dir=None if remote_addrs else os.environ.get("MR_SPILL_DIR"),
    )
    step = make_train_step(model, opt_w, opt_d, jit=True, donate=False)
    batches = owned_batches(worker_id, worker_num)
    # pre-populate every id this run will touch with per-id deterministic
    # rows, so the oracle comparison is independent of lazy-init order
    touched = np.unique(np.concatenate([b["ids"].reshape(-1) for b in batches]))
    for salt, (name, tiers) in enumerate(adapter.tiers.items()):
        d = tiers["param"].dim
        tiers["param"].write(touched, det_rows(touched, d, salt))
        for tname, tier in tiers.items():
            if tname == "param":
                continue
            bias = 1.0 if tname == "accum" else 0.0
            tier.write(touched, np.full((touched.size, d), bias, np.float32))
    for b in batches:
        state, (lw, ld) = cached_train_step(adapter, step, state, b)
        assert np.isfinite(float(lw)) and np.isfinite(float(ld))
    adapter.flush_all(state)
    return adapter, touched


def main():
    topo = run_role(topology_from_env())  # server role execs, never returns
    assert topo.role in ("sched", "worker")
    assert topo.dist["process_count"] == topo.worker_num, topo.dist

    # cross-process collective sanity: every rank is visible
    ranks = multihost_utils.process_allgather(
        np.array([jax.process_index()], np.int32)
    ).reshape(-1)
    assert sorted(ranks.tolist()) == list(range(topo.worker_num)), ranks

    build_and_train(topo.server_addrs, topo.worker_id, topo.worker_num)

    multihost_utils.sync_global_devices("mindrec_ps_worker_done")


if __name__ == "__main__":
    main()
