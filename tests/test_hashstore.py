"""Hash embedding store: admission, eviction, erase, export; native C++
vs Python oracle equivalence."""

import numpy as np
import pytest

from mindrec_tpu.native.hashstore import NativeHashStore, PyHashStore


def both_stores(capacity=16, permit=1, evict=0x7FFFFFFF):
    stores = [PyHashStore(capacity, permit, evict)]
    try:
        stores.append(NativeHashStore(capacity, permit, evict))
    except (FileNotFoundError, OSError):
        pass
    return stores


@pytest.mark.parametrize("store", both_stores(), ids=lambda s: type(s).__name__)
def test_basic_insert_lookup(store):
    slots = store.lookup_or_insert(np.array([10, 20, 10]))
    assert slots[0] == slots[2]
    assert slots[0] != slots[1]
    assert all(s >= 0 for s in slots)
    # stable across steps
    again = store.lookup_or_insert(np.array([20, 10]))
    assert again[0] == slots[1]
    assert again[1] == slots[0]
    assert len(store) == 2


@pytest.mark.parametrize(
    "store", both_stores(permit=3), ids=lambda s: type(s).__name__
)
def test_admission_threshold(store):
    # key must be seen in >= 3 distinct steps before admission
    k = np.array([42])
    assert store.lookup_or_insert(k)[0] == -1  # step 1
    assert store.lookup_or_insert(k)[0] == -1  # step 2
    assert store.lookup_or_insert(k)[0] >= 0  # step 3 -> admitted
    # duplicate within one step counts once
    s2 = type(store)(16, 3, 0x7FFFFFFF) if isinstance(store, PyHashStore) else NativeHashStore(16, 3, 0x7FFFFFFF)
    out = s2.lookup_or_insert(np.array([7, 7, 7]))
    assert all(o == -1 for o in out)  # one step of seen-count, not three


@pytest.mark.parametrize(
    "store", both_stores(evict=3), ids=lambda s: type(s).__name__
)
def test_eviction(store):
    a = store.lookup_or_insert(np.array([1]))[0]  # step 1
    store.lookup_or_insert(np.array([2]))  # step 2: key 1 idle 1
    store.lookup_or_insert(np.array([2]))  # step 3
    store.lookup_or_insert(np.array([2]))  # step 4: key 1 idle 3
    freed = store.evict()
    assert a in freed.tolist()
    assert len(store) == 1
    # slot is recycled
    b = store.lookup_or_insert(np.array([99]))[0]
    assert b == a


@pytest.mark.parametrize("store", both_stores(capacity=2), ids=lambda s: type(s).__name__)
def test_capacity_full(store):
    out = store.lookup_or_insert(np.array([1, 2, 3]))
    assert (out >= 0).sum() == 2
    assert out[2] == -1


@pytest.mark.parametrize("store", both_stores(), ids=lambda s: type(s).__name__)
def test_erase_and_items(store):
    store.lookup_or_insert(np.array([5, 6, 7]))
    keys, slots = store.items()
    assert sorted(keys.tolist()) == [5, 6, 7]
    store.erase(np.array([6]))
    keys2, _ = store.items()
    assert sorted(keys2.tolist()) == [5, 7]
    assert len(store) == 2


def test_native_matches_python_random_workload():
    try:
        nat = NativeHashStore(64, 2, 5)
    except (FileNotFoundError, OSError):
        pytest.skip("native store not built")
    py = PyHashStore(64, 2, 5)
    rng = np.random.default_rng(0)
    for step in range(50):
        keys = rng.integers(0, 100, size=20)
        a = nat.lookup_or_insert(keys)
        b = py.lookup_or_insert(keys)
        # admission decisions must agree (slot numbering may differ)
        np.testing.assert_array_equal(a >= 0, b >= 0)
        if step % 7 == 6:
            fa, fb = nat.evict(), py.evict()
            assert len(fa) == len(fb)
    assert len(nat) == len(py)
    ka, _ = nat.items()
    kb, _ = py.items()
    np.testing.assert_array_equal(np.sort(ka), np.sort(kb))
