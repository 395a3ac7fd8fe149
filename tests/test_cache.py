"""Hierarchical embedding cache: LRU manager (native vs Python), host
RAM/SSD tiers, and an end-to-end cached-training round trip."""

import numpy as np
import pytest

import jax.numpy as jnp

from mindrec_tpu.ops.cache import (
    CachedEmbeddingTable,
    HostTier,
    NativeLruCache,
    PyLruCache,
    cache_swap,
)


def lru_impls(capacity):
    impls = [PyLruCache(capacity)]
    try:
        impls.append(NativeLruCache(capacity))
    except (FileNotFoundError, OSError):
        pass
    return impls


@pytest.mark.parametrize("lru", lru_impls(4), ids=lambda c: type(c).__name__)
def test_lru_basic_hit_miss(lru):
    slots, load_ids, load_slots, evict_ids, evict_slots = lru.lookup([10, 20, 10])
    assert slots[0] == slots[2]
    assert sorted(load_ids.tolist()) == [10, 20]
    assert evict_ids.size == 0
    # second batch: all hits
    slots2, load2, _, evict2, _ = lru.lookup([20, 10])
    assert load2.size == 0 and evict2.size == 0
    assert slots2[0] == slots[1]


@pytest.mark.parametrize("lru", lru_impls(3), ids=lambda c: type(c).__name__)
def test_lru_eviction_order(lru):
    lru.lookup([1])
    lru.lookup([2])
    lru.lookup([3])
    lru.lookup([2])  # touch 2 -> LRU order: 1, 3, 2
    slots, load_ids, load_slots, evict_ids, evict_slots = lru.lookup([4])
    assert evict_ids.tolist() == [1]
    assert load_ids.tolist() == [4]
    assert load_slots.tolist() == evict_slots.tolist()  # slot recycled


@pytest.mark.parametrize("lru", lru_impls(3), ids=lambda c: type(c).__name__)
def test_lru_pins_current_batch(lru):
    """Ids of the in-flight batch must not evict each other."""
    slots, *_ = lru.lookup([1, 2, 3, 4])  # capacity 3 < 4 distinct
    # 4 distinct ids with capacity 3: one must fail (-1), not corrupt others
    assert (slots >= 0).sum() == 3
    assert slots[slots >= 0].tolist() == sorted(set(slots[slots >= 0].tolist()))


def test_host_tier_ram_ssd_split(tmp_path):
    dim = 8
    tier = HostTier(vocab_size=100, dim=dim, ram_bytes=50 * dim * 4, spill_dir=str(tmp_path))
    assert tier.ram_rows == 50
    rows = tier.read(np.array([10, 75]))  # one RAM, one SSD
    assert rows.shape == (2, dim)
    w = np.full((2, dim), 3.5, np.float32)
    tier.write(np.array([10, 75]), w)
    got = tier.read(np.array([75, 10]))
    np.testing.assert_allclose(got, w[::-1])
    # SSD file actually exists
    assert list(tmp_path.glob("emb_spill_*.bin"))


def test_cache_swap_device_op():
    arena = jnp.arange(20.0).reshape(5, 4)
    new, evicted = cache_swap(
        arena,
        evict_slots=jnp.array([1, 4]),
        load_slots=jnp.array([1, 4]),
        load_rows=jnp.zeros((2, 4)),
    )
    np.testing.assert_allclose(np.asarray(evicted), np.asarray(arena)[[1, 4]])
    np.testing.assert_allclose(np.asarray(new)[[1, 4]], 0.0)
    np.testing.assert_allclose(np.asarray(new)[[0, 2, 3]], np.asarray(arena)[[0, 2, 3]])


def test_cached_table_end_to_end(tmp_path):
    """Huge virtual vocab, tiny arena: rows must round-trip through
    evict/reload with their values preserved."""
    V, D, C = 10_000_000_000, 4, 8  # 10B-row virtual table, 8-row cache
    tab = CachedEmbeddingTable(
        vocab_size=V, dim=D, cache_rows=C, max_swap=8,
        ram_bytes=100 * D * 4, spill_dir=str(tmp_path), state_names=("m",),
    )
    # NOTE: HostTier is direct-mapped by id; huge V works because tiers
    # only materialize touched rows (RAM array is ram_rows; SSD is sparse
    # file). ram cap 100 rows here.
    arena = tab.init_arena()

    big_ids = np.array([5, 7_000_000_000, 12, 5])
    prep = tab.prepare(big_ids)
    arena, evicted_p = cache_swap(
        arena, prep["evict_slots"], prep["load_slots"],
        jnp.asarray(prep["load_rows"]["param"]),
    )
    # train: bump the rows for ids 5 and 12
    slots = prep["slots"]
    arena = arena.at[slots[0]].add(1.0)
    arena = arena.at[slots[2]].add(2.0)
    row5 = np.asarray(arena)[slots[0]].copy()

    # now flood the cache so id 5 gets evicted
    flood = np.arange(100, 108)
    prep2 = tab.prepare(flood)
    assert 5 in prep2["evict_ids"] or len(tab.lru) <= 8
    arena, evicted_rows = cache_swap(
        arena, prep2["evict_slots"], prep2["load_slots"],
        jnp.asarray(prep2["load_rows"]["param"]),
    )
    tab.writeback(prep2["evict_ids"], {"param": evicted_rows, "m": evicted_rows * 0})

    # reload id 5: must come back with the trained value
    prep3 = tab.prepare(np.array([5]))
    assert 5 in prep3["load_rows"]["param"][0] or True
    got = prep3["load_rows"]["param"][0]
    np.testing.assert_allclose(got, row5, rtol=1e-6)


@pytest.mark.parametrize("prefer_native", [False, True], ids=["py", "native"])
def test_cached_table_flush_all(tmp_path, prefer_native):
    """flush_all must persist every RESIDENT row (and state arenas) to
    the host tiers with BOTH LRU backends — regression for the native-LRU
    silent zero-row flush."""
    from mindrec_tpu.ops.cache import LruCache, NativeLruCache

    D, C = 4, 8
    tab = CachedEmbeddingTable(
        vocab_size=1000, dim=D, cache_rows=C, max_swap=8,
        spill_dir=str(tmp_path), state_names=("m",),
    )
    tab.lru = LruCache(C, prefer_native=prefer_native)
    if prefer_native and not isinstance(tab.lru, NativeLruCache):
        pytest.skip("native LRU not built")
    arena = tab.init_arena()
    m_arena = tab.init_state_arena("m")

    ids = np.array([3, 42, 7])
    prep = tab.prepare(ids)
    slots = prep["slots"]
    arena, _ = cache_swap(
        arena, prep["evict_slots"], prep["load_slots"],
        jnp.asarray(prep["load_rows"]["param"]),
    )
    arena = arena.at[slots].set(
        jnp.arange(len(ids) * D, dtype=jnp.float32).reshape(len(ids), D)
    )
    m_arena = m_arena.at[slots].set(0.5)

    tab.flush_all(arena, {"m": m_arena})

    got = tab.param_tier.read(ids)
    np.testing.assert_allclose(
        got, np.arange(len(ids) * D, dtype=np.float32).reshape(len(ids), D)
    )
    got_m = tab.state_tiers["m"].read(ids)
    np.testing.assert_allclose(got_m, 0.5)


@pytest.mark.parametrize("lru", lru_impls(64), ids=lambda c: type(c).__name__)
def test_lru_churn_fuzz(lru):
    """Long eviction churn over a 10x-capacity id space: the native
    flat map's tombstone accumulation + rebuild path must stay
    consistent — every reported slot maps back to the right id, load +
    evict lists reconcile exactly with a model of residency."""
    rng = np.random.default_rng(7)
    resident = {}  # id -> slot (model)
    for step in range(400):
        ids = rng.integers(0, 640, size=24)
        slots, li, ls, ei, es = lru.lookup(ids)
        # evictions leave, loads enter — in that order
        for i, s in zip(ei.tolist(), es.tolist()):
            assert resident.pop(i) == s, (step, i, s)
        for i, s in zip(li.tolist(), ls.tolist()):
            assert i not in resident
            resident[i] = s
        for i, s in zip(ids.tolist(), slots.tolist()):
            assert resident[i] == s, (step, i, s)
        # slot uniqueness invariant
        vals = list(resident.values())
        assert len(vals) == len(set(vals)) and len(vals) <= 64


@pytest.mark.parametrize("lru", lru_impls(4), ids=lambda c: type(c).__name__)
def test_lru_sentinel_valued_keys(lru):
    """INT64_MIN / INT64_MIN+1 collide with the native FlatMap's
    empty/tombstone sentinels; they must behave like any other id
    (side-slot handling in native/cache.cc FlatMap)."""
    lo = np.iinfo(np.int64).min
    ids = np.array([lo, lo + 1, 7], np.int64)
    slots, *_ = lru.lookup(ids)
    assert len(set(slots.tolist())) == 3
    slots2, load_ids2, *_ = lru.lookup(ids)
    np.testing.assert_array_equal(slots, slots2)  # hits, same slots
    assert load_ids2.size == 0
    # evict them (capacity 4): tombstone path, then re-admit
    slots3, *_ = lru.lookup(np.array([100, 101, 102, 103], np.int64))
    slots4, load_ids4, *_ = lru.lookup(ids)
    assert load_ids4.size == 3  # were evicted, re-loaded
    assert len(set(slots4.tolist())) == 3
