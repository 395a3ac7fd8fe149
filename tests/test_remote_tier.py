"""Remote table server (PS-server equivalent) + RemoteTier client.

Covers SURVEY §7.4 "PS-style 3-role topology equivalent" and the remote
level of the cache hierarchy (§2.3): worker <-> table-server protocol,
deterministic lazy init, RAM-cap/SSD spill server-side, multi-server
sharding, and CachedEmbeddingTable composing RemoteTier end-to-end.
"""

import os
import socket

import numpy as np
import pytest

from mindrec_tpu.ops.cache import CachedEmbeddingTable, cache_swap
from mindrec_tpu.ops.remote import (
    RemoteTier,
    launch_table_server,
    stop_table_server,
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.fixture()
def server(tmp_path):
    port = _free_port()
    proc = launch_table_server(port, ram_mb=1, spill_dir=str(tmp_path))
    yield f"127.0.0.1:{port}"
    stop_table_server(f"127.0.0.1:{port}")
    proc.wait(timeout=10)


def test_read_write_roundtrip(server):
    tier = RemoteTier(server, "t0", dim=8, init_std=0.01, seed=7)
    ids = np.array([3, 9_999_999_999, 3, 42])
    rows = tier.read(ids)
    assert rows.shape == (4, 8)
    np.testing.assert_allclose(rows[0], rows[2])  # same id, same init
    assert np.abs(rows).max() < 1.0  # N(0, 0.01) scale

    uids = np.array([3, 9_999_999_999, 42, 77])
    w = np.arange(32, dtype=np.float32).reshape(4, 8)
    tier.write(uids, w)
    got = tier.read(uids[::-1])
    np.testing.assert_allclose(got, w[::-1])
    tier.close()


def test_deterministic_init_across_connections(server):
    a = RemoteTier(server, "det", dim=4, init_std=0.05, seed=123)
    first = a.read(np.array([77]))
    a.close()
    b = RemoteTier(server, "det", dim=4, init_std=0.05, seed=123)
    again = b.read(np.array([77]))
    np.testing.assert_allclose(first, again)
    b.close()


def test_zero_init_state_table(server):
    tier = RemoteTier(server, "opt_m", dim=8, init_std=0.0)
    np.testing.assert_allclose(tier.read(np.array([5, 6])), 0.0)
    tier.close()


def test_ram_cap_spills_to_ssd(server, tmp_path):
    # 1 MB cap, dim 256 => 1024 RAM rows; touch 2000 distinct rows
    tier = RemoteTier(server, "big", dim=256, init_std=0.01)
    ids = np.arange(2000)
    rows = tier.read(ids)
    tier.write(ids, rows * 2.0)
    ram, ssd = tier.conns[0].stats()
    assert ram == 1024 and ssd == 2000 - 1024
    # spilled rows still round-trip
    got = tier.read(np.array([1500]))
    np.testing.assert_allclose(got[0], rows[1500] * 2.0, rtol=1e-6)
    assert list(tmp_path.glob("mrec_spill_big.bin"))
    tier.close()


def test_multi_server_sharding(tmp_path):
    ports = [_free_port(), _free_port()]
    procs = [launch_table_server(p, spill_dir=str(tmp_path)) for p in ports]
    addrs = [f"127.0.0.1:{p}" for p in ports]
    try:
        tier = RemoteTier(addrs, "sh", dim=4, init_std=0.01)
        ids = np.arange(100)
        w = np.random.default_rng(0).normal(size=(100, 4)).astype(np.float32)
        tier.write(ids, w)
        np.testing.assert_allclose(tier.read(ids), w)
        # both shards hold some rows
        stats = tier.stats()
        assert all(ram + ssd > 10 for ram, ssd in stats)
        tier.close()
    finally:
        for a in addrs:
            stop_table_server(a)
        for p in procs:
            p.wait(timeout=10)


def test_cached_table_with_remote_tier(server):
    """Full hierarchy: HBM arena (device) <-> remote server tiers."""
    tab = CachedEmbeddingTable(
        vocab_size=10_000_000_000, dim=4, cache_rows=8, max_swap=8,
        state_names=("m",), remote_addrs=[server], table_name="e2e",
    )
    import jax.numpy as jnp

    arena = tab.init_arena()
    prep = tab.prepare(np.array([5, 7_000_000_000, 12]))
    arena, _ = cache_swap(
        arena, prep["evict_slots"], prep["load_slots"],
        jnp.asarray(prep["load_rows"]["param"]),
    )
    slots = prep["slots"]
    arena = arena.at[slots[0]].add(1.0)
    row5 = np.asarray(arena)[slots[0]].copy()

    prep2 = tab.prepare(np.arange(100, 108))  # flood -> evict id 5
    arena, evicted = cache_swap(
        arena, prep2["evict_slots"], prep2["load_slots"],
        jnp.asarray(prep2["load_rows"]["param"]),
    )
    tab.writeback(prep2["evict_ids"], {"param": evicted, "m": evicted * 0})

    prep3 = tab.prepare(np.array([5]))  # reload from the remote server
    np.testing.assert_allclose(prep3["load_rows"]["param"][0], row5, rtol=1e-6)


def test_ps_topology_env(monkeypatch):
    from mindrec_tpu.parallel.ps import topology_from_env

    monkeypatch.setenv("MR_ROLE", "MS_PSERVER".replace("MS_", "MR_"))
    monkeypatch.setenv("MR_SERVER_NUM", "2")
    monkeypatch.setenv("MR_SCHED_HOST", "10.0.0.1")
    topo = topology_from_env()
    assert topo.role == "server"
    assert topo.server_addrs == ["10.0.0.1:18900", "10.0.0.1:18901"]

    monkeypatch.setenv("MR_ROLE", "MR_WORKER")
    monkeypatch.setenv("MR_SERVER_HOSTS", "a:1,b:2")
    monkeypatch.setenv("MR_WORKER_ID", "3")
    monkeypatch.setenv("MR_WORKER_NUM", "4")
    topo = topology_from_env()
    assert topo.role == "worker" and topo.worker_id == 3
    assert topo.server_addrs == ["a:1", "b:2"]
