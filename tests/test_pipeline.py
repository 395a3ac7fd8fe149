"""End-to-end input pipeline: prep pool ordering/overlap, adaptive
bucket re-jit, RecModel sink integration (VERDICT r2 items 1, 5, 9).

Reference contract: the dataset-sink engine overlaps host prep with
the device step (``mindspore_rec/train/rec_model.py:124-131``)."""

import time

import numpy as np
import pytest

import jax

from mindrec_tpu.data.pipeline import (
    AdaptiveBucket,
    HostPrepPool,
    SparseInputPipeline,
    round_bucket,
)
from mindrec_tpu.train.step import BucketOverflow, make_batch_sort


def _batches(n, bs=64, fields=4, vocab=1000, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        out.append({
            "ids": rng.integers(0, vocab, size=(bs, fields)).astype(np.int32),
            "wts": np.ones((bs, fields), np.float32),
            "label": rng.integers(0, 2, size=(bs, 1)).astype(np.float32),
        })
    return out


def test_prep_pool_order_and_parity():
    batches = _batches(12)
    prep = make_batch_sort(4)
    pool = HostPrepPool(iter(batches), prep, workers=2, depth=4)
    got = list(pool)
    assert len(got) == 12
    for raw, out in zip(batches, got):
        want = prep(dict(raw))
        np.testing.assert_array_equal(out["ids"], raw["ids"])
        np.testing.assert_array_equal(out["perm"], want["perm"])
        np.testing.assert_array_equal(out["uq_ids"], want["uq_ids"])


def test_prep_pool_overlaps_consumer():
    """50-step no-starvation gate: with prep (5 ms) slower than
    nothing but faster than the consumer 'step' (10 ms), one worker
    must hide prep entirely — wall time ~= steps * step, and the
    consumer never waits more than a small epsilon for a batch."""
    steps, prep_ms, step_ms = 50, 5, 10

    def src():
        for _ in range(steps):
            yield {"i": np.zeros(4)}

    def prep(b):
        time.sleep(prep_ms / 1e3)  # releases the GIL like the native call
        return b

    pool = HostPrepPool(src(), prep, workers=1, depth=3)
    it = iter(pool)
    next(it)  # pipeline warm
    t0 = time.perf_counter()
    waits = []
    n = 1
    while True:
        w0 = time.perf_counter()
        try:
            next(it)
        except StopIteration:
            break
        waits.append(time.perf_counter() - w0)
        n += 1
        time.sleep(step_ms / 1e3)  # the "device step"
    wall = time.perf_counter() - t0
    assert n == steps
    # serial would be ~steps*(prep+step)=0.75s; overlapped ~0.5s
    assert wall < steps * (prep_ms + step_ms) / 1e3 * 0.85
    # the queue never starves: no single wait approaches prep time
    assert np.median(waits) < prep_ms / 1e3 * 0.5


def test_prep_pool_propagates_errors_in_order():
    batches = _batches(6)

    def prep(b):
        if int(b["ids"][0, 0]) == -7:
            raise ValueError("boom")
        return b

    batches[3]["ids"][0, 0] = -7
    pool = HostPrepPool(iter(batches), prep, workers=2, depth=4)
    it = iter(pool)
    for _ in range(3):
        next(it)
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_adaptive_bucket_policy():
    logs = []
    pol = AdaptiveBucket(2048, headroom=1.5, warn_frac=0.9,
                         log=lambda *a, **k: logs.append(a[0]))
    pol.observe(100)
    assert not logs
    pol.observe(2000)  # > 90% of 2048
    assert len(logs) == 1 and "90%" in logs[0]
    new = pol.grow(2100)
    assert new == round_bucket(int(2100 * 1.5)) == pol.bucket
    assert pol.max_seen == 2000


def test_pipeline_regrows_on_overflow():
    """Mid-run id-diversity growth finishes without manual
    intervention: the pipeline re-buckets, re-preps the offending
    batch, and reports the new bucket via on_grow (VERDICT item 9)."""
    rng = np.random.default_rng(0)
    batches = []
    for i in range(8):
        vocab = 500 if i < 4 else 200_000  # diversity jumps mid-run
        bs = 700
        batches.append({
            "ids": rng.integers(0, vocab, size=(bs, 4)).astype(np.int32),
            "wts": np.ones((bs, 4), np.float32),
        })
    grows = []
    pol = AdaptiveBucket(2048, log=lambda *a, **k: None)
    pipe = SparseInputPipeline(
        iter(batches), field_size=4, policy=pol, workers=2,
        device=False, on_grow=grows.append,
    )
    got = list(pipe)
    assert len(got) == 8
    assert grows and grows[-1] == pol.bucket
    # the grown bucket fits the diverse batches
    assert pol.bucket >= max(
        np.unique(b["ids"]).size for b in batches
    )
    # every batch carries valid prep metadata
    for raw, out in zip(batches, got):
        n = raw["ids"].size
        nu = int(out["uidx_sorted"][-1]) + 1
        assert nu == np.unique(raw["ids"]).size
        np.testing.assert_array_equal(
            np.sort(out["perm"]), np.arange(n, dtype=np.int32)
        )


def test_recmodel_pipeline_sink():
    """RecModel(unique_bucket=...) + train(dataset_sink_mode=True) over
    RAW host batches: end-to-end wiring incl. an overflow re-jit."""
    import jax.numpy as jnp  # noqa: F401

    from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
    from mindrec_tpu.train.rec_model import RecModel

    cfg = WideDeepConfig(
        batch_size=32, field_size=4, vocab_size=50_000, emb_dim=8,
        deep_layer_dim=(16, 8), sparse=True,
    )
    model = WideDeepModel(cfg)
    rng = np.random.default_rng(1)

    def batch(vocab):
        return {
            "ids": rng.integers(0, vocab, size=(32, 4)).astype(np.int32),
            "wts": np.ones((32, 4), np.float32),
            "label": rng.integers(0, 2, size=(32, 1)).astype(np.float32),
        }

    data = [batch(100) for _ in range(3)] + [batch(50_000) for _ in range(3)]
    pol = AdaptiveBucket(64, quantum=16, log=lambda *a, **k: None)
    m = RecModel(model, unique_bucket=pol, seed=0)
    state = m.train(epoch=1, train_dataset=data, dataset_sink_mode=True)
    assert int(state.step) == 6
    assert m.bucket_policy.bucket > 64  # regrew mid-run, no crash
    assert m.bucket_policy.max_seen > 64
    assert jax.default_backend() == "cpu"


def test_recmodel_pipeline_multigroup():
    """host_prep=True on a multi-id-group model: the sink pipeline runs
    per-group lossless prep (prefixed metadata) and training completes."""
    from mindrec_tpu.models.multitable import (
        MultiTableConfig,
        MultiTableWideDeepModel,
    )
    from mindrec_tpu.train.rec_model import RecModel

    cfg = MultiTableConfig(
        batch_size=16, continue_field_size=4, indicator_field_size=2,
        emb128_field_size=1, emb64_single_field_size=2,
        multi_hot_sizes=(2, 3, 2, 2, 2, 2), emb_128_size=100,
        emb64_single_size=50, emb64_multi_size=60,
        deep_layer_dim=(16, 8), use_mixed_precision=False,
        loss_scale=1.0, sparse=True,
    )
    model = MultiTableWideDeepModel(cfg)
    rng = np.random.default_rng(2)

    def batch():
        from mindrec_tpu.models.multitable import MULTI_FIELDS

        B = cfg.batch_size
        b = {
            "continue_val": rng.uniform(size=(B, 4)).astype(np.float32),
            "indicator_id": rng.integers(0, 16, (B, 2)).astype(np.int32),
            "emb_128_id": rng.integers(0, 100, (B, 1)).astype(np.int32),
            "emb_64_single_id": rng.integers(0, 50, (B, 2)).astype(np.int32),
            "label": np.ones((B, 1), np.float32),
        }
        for name, L in zip(MULTI_FIELDS, cfg.multi_hot_sizes):
            b[f"multi_{name}_id"] = rng.integers(0, 60, (B, L)).astype(np.int32)
            b[f"multi_{name}_mask"] = np.ones((B, L), np.float32)
        return b

    m = RecModel(model, host_prep=True)
    state = m.train(epoch=1, train_dataset=[batch() for _ in range(3)],
                    dataset_sink_mode=True)
    assert int(state.step) == 3


def test_superbatch_yields_identical_batches():
    """superbatch=k (one device transfer per k batches, sliced apart
    device-side) must be invisible to the consumer: same batches, same
    order, tail group included."""
    batches = _batches(7, bs=32, fields=4, vocab=500)
    plain = list(SparseInputPipeline(
        iter(batches), field_size=4, policy=None, workers=1, device=True,
    ))
    sup = list(SparseInputPipeline(
        iter(batches), field_size=4, policy=None, workers=1, device=True,
        superbatch=3,  # 3+3+1: exercises the short tail group
    ))
    assert len(plain) == len(sup) == 7
    for a, b in zip(plain, sup):
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)
