"""Dynamic (hash) embedding training: admission, eviction with state
reset, incremental export/import, e2e training on raw int64 ids."""

import jax
import numpy as np
import pytest

from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
from mindrec_tpu.ops.embedding import HashEmbeddingLookup, read_rows
from mindrec_tpu.train import optim
from mindrec_tpu.train.dynamic import DynamicEmbeddingAdapter
from mindrec_tpu.train.step import init_train_state, make_train_step

CAP = 512
CFG = WideDeepConfig(
    batch_size=16,
    field_size=4,
    vocab_size=CAP,  # model vocab == hash capacity (slot space)
    emb_dim=8,
    deep_layer_dim=(16,),
    use_mixed_precision=False,
    sparse=True,
    dynamic_embedding=True,
    loss_scale=1.0,
)
# table specs carry the storage convention (feature-major / fold)
TABLES = WideDeepModel(CFG).table_specs


def _raw_batch(seed):
    rng = np.random.default_rng(seed)
    # arbitrary huge int64 ids (hash keys), reference allows any ints
    ids = rng.integers(0, 2**60, size=(CFG.batch_size, CFG.field_size))
    return {
        "ids": ids,
        "wts": np.ones((CFG.batch_size, CFG.field_size), np.float32),
        "label": (rng.uniform(size=(CFG.batch_size, 1)) > 0.5).astype(np.float32),
    }


def test_transform_batch_maps_to_slots():
    ad = DynamicEmbeddingAdapter(capacity=CAP)
    b = ad.transform_batch(_raw_batch(0))
    assert b["ids"].dtype == np.int32
    assert b["ids"].max() <= CAP
    assert b["ids"].min() >= 0
    # same raw ids map to same slots next step
    raw = _raw_batch(0)
    b2 = ad.transform_batch(raw)
    b3 = ad.transform_batch(raw)
    np.testing.assert_array_equal(b2["ids"], b3["ids"])


def test_admission_threshold_routes_to_dummy():
    ad = DynamicEmbeddingAdapter(capacity=CAP, permit_filter_value=3)
    raw = _raw_batch(1)
    b1 = ad.transform_batch(raw)
    assert np.all(b1["ids"] == CAP)  # nothing admitted yet -> dummy row
    ad.transform_batch(raw)
    b3 = ad.transform_batch(raw)
    assert np.all(b3["ids"] < CAP)  # admitted on 3rd distinct step


def test_train_and_evict_resets_rows():
    ad = DynamicEmbeddingAdapter(capacity=CAP, evict_filter_value=2)
    model = WideDeepModel(CFG)
    opt_w = optim.ftrl(loss_scale=1.0)
    opt_d = optim.lazy_adam(loss_scale=1.0)
    state = init_train_state(model, jax.random.PRNGKey(0), opt_w, opt_d)
    step = make_train_step(model, opt_w, opt_d, jit=True, donate=False, use_pallas=False)

    deep_spec = TABLES["deep"][1]
    raw_a = _raw_batch(10)
    b = ad.transform_batch(raw_a)
    touched = np.unique(b["ids"])
    state, _ = step(state, b)
    m_before = read_rows(deep_spec, state.opt_d["deep/table"]["m"], touched)
    assert np.any(m_before != 0)

    # step twice with different ids -> ids from raw_a become idle >= 2
    for s in (11, 12):
        b2 = ad.transform_batch(_raw_batch(s))
        state, _ = step(state, b2)
    state, n = ad.evict(state, TABLES)
    assert n > 0
    # evicted rows' adam moments are reset
    m_after = read_rows(deep_spec, state.opt_d["deep/table"]["m"], touched)
    freed_rows_zeroed = (m_after == 0).all(axis=1)
    assert freed_rows_zeroed.sum() >= 1


def test_incremental_export_import_roundtrip():
    ad = DynamicEmbeddingAdapter(capacity=CAP)
    model = WideDeepModel(CFG)
    state = init_train_state(model, jax.random.PRNGKey(0), optim.ftrl(), optim.adam())
    ad.transform_batch(_raw_batch(5))  # touch keys so they admit
    blob = ad.export_tables(state.params, TABLES)
    assert blob["__keys__"].size > 0

    # import into a fresh adapter + params: rows must land on live keys
    ad2 = DynamicEmbeddingAdapter(capacity=CAP)
    model2 = WideDeepModel(CFG)
    state2 = init_train_state(model2, jax.random.PRNGKey(1), optim.ftrl(), optim.adam())
    params2 = ad2.import_tables(state2.params, blob, TABLES)
    # looking up an exported key must return the exported row
    k = blob["__keys__"][0]
    slot = ad2.store.lookup_or_insert(np.array([k]))[0]
    np.testing.assert_allclose(
        read_rows(TABLES["deep"][1], params2["deep"]["table"], [slot])[0],
        blob["deep/table"][0],
    )


def test_hash_embedding_lookup_api_parity():
    """Reference-shaped API: HashEmbeddingLookup with map_ids + arena."""
    hel = HashEmbeddingLookup(embedding_size=8, capacity=64, permit_filter_value=1)
    arena = hel.init(jax.random.PRNGKey(0))
    ids = np.array([[123456789, -5], [7, 123456789]])
    slots = hel.map_ids(ids)
    assert slots.shape == ids.shape
    out = hel(arena, slots)
    assert out.shape == (2, 2, 8)
    # same key -> same vector
    np.testing.assert_allclose(np.asarray(out)[0, 0], np.asarray(out)[1, 1])
    with pytest.raises(ValueError):
        HashEmbeddingLookup(embedding_size=8, permit_filter_value=0)
