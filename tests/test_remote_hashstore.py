"""Distributed hash store (dynamic vocab sharded across table servers).

Reference: the MapParameter lives server-side and is shared by every
worker (``mindspore_rec/ops/embedding.py:163-182``).  Claims:

* admission/eviction semantics match the local HashStore oracle;
* slots are globally unique across server shards (disjoint slot ranges);
* two CLIENTS (data-parallel workers) see one consistent id->slot map;
* DynamicEmbeddingAdapter composes with the remote store end to end.
"""

import numpy as np
import pytest

from mindrec_tpu.ops.remote import (
    RemoteHashStore,
    launch_table_server,
    stop_table_server,
)


@pytest.fixture(scope="module")
def servers(tmp_path_factory):
    import socket

    def free_port():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    ports = [free_port(), free_port()]
    procs = [
        launch_table_server(p, spill_dir=str(tmp_path_factory.mktemp(f"srv{i}")))
        for i, p in enumerate(ports)
    ]
    addrs = [f"127.0.0.1:{p}" for p in ports]
    yield addrs
    for a in addrs:
        stop_table_server(a)
    for pr in procs:
        try:
            pr.wait(timeout=10)
        except Exception:
            pr.kill()


def test_lookup_insert_and_slot_ranges(servers):
    store = RemoteHashStore(servers, "t1", capacity=64, permit_threshold=1)
    keys = np.array([5, 99, 12345, 5, -7], np.int64)
    slots = store.lookup_or_insert(keys)
    assert (slots >= 0).all()
    assert slots[0] == slots[3]  # duplicate key -> same slot
    assert len(np.unique(slots)) == 4
    assert slots.max() < 64
    # stable across a second lookup
    np.testing.assert_array_equal(store.lookup_or_insert(keys), slots)
    assert len(store) == 4
    store.close()


def test_two_clients_consistent(servers):
    """Two workers must resolve the same ids to the same global slots."""
    a = RemoteHashStore(servers, "t2", capacity=128, permit_threshold=1)
    b = RemoteHashStore(servers, "t2", capacity=128, permit_threshold=1)
    keys = np.arange(1000, 1040, dtype=np.int64)
    sa = a.lookup_or_insert(keys)
    sb = b.lookup_or_insert(keys)
    np.testing.assert_array_equal(sa, sb)
    # interleaved inserts stay consistent too
    more = np.arange(2000, 2020, dtype=np.int64)
    sa2 = a.lookup_or_insert(more)
    sb2 = b.lookup_or_insert(more)
    np.testing.assert_array_equal(sa2, sb2)
    a.close()
    b.close()


def test_admission_and_eviction(servers):
    store = RemoteHashStore(servers, "t3", capacity=32,
                            permit_threshold=2, evict_threshold=3)
    k = np.array([777], np.int64)
    assert store.lookup_or_insert(k)[0] == -1  # 1st sighting: pending
    s = store.lookup_or_insert(k)[0]
    assert s >= 0  # 2nd distinct step: admitted
    # idle for >= evict_threshold steps -> evicted
    other = np.array([888], np.int64)
    for _ in range(4):
        store.lookup_or_insert(other)
    freed = store.evict()
    assert s in freed.tolist()
    store.close()


def test_items_export_roundtrip(servers):
    store = RemoteHashStore(servers, "t4", capacity=64, permit_threshold=1)
    keys = np.array([10, 20, 30, 40], np.int64)
    slots = store.lookup_or_insert(keys)
    got_k, got_s = store.items()
    order = np.argsort(got_k)
    np.testing.assert_array_equal(np.sort(got_k), np.sort(keys))
    by_key = dict(zip(got_k.tolist(), got_s.tolist()))
    for k, s in zip(keys.tolist(), slots.tolist()):
        assert by_key[k] == s
    store.erase(np.array([20], np.int64))
    got_k2, _ = store.items()
    assert 20 not in got_k2.tolist()
    del order
    store.close()


def test_dynamic_adapter_with_remote_store(servers):
    """End to end: two DynamicEmbeddingAdapters (two DP workers) share
    the server-side map; identical raw batches map to identical slot
    batches, so replicated arenas stay consistent."""
    from mindrec_tpu.train.dynamic import DynamicEmbeddingAdapter

    ad1 = DynamicEmbeddingAdapter(capacity=256, remote_addrs=servers,
                                  table_name="dyn_t5")
    ad2 = DynamicEmbeddingAdapter(capacity=256, remote_addrs=servers,
                                  table_name="dyn_t5")
    rng = np.random.default_rng(0)
    for step in range(3):
        raw = {
            "ids": rng.integers(0, 10**9, (8, 4)),
            "wts": np.ones((8, 4), np.float32),
            "label": np.ones((8, 1), np.float32),
        }
        b1 = ad1.transform_batch(dict(raw))
        b2 = ad2.transform_batch(dict(raw))
        np.testing.assert_array_equal(b1["ids"], b2["ids"])
        assert b1["ids"].max() <= 256  # slots within the arena (+dummy)
