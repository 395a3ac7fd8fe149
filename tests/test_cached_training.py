"""Cache-mode training (TB-scale adapter): correctness oracle.

The strongest check for the hierarchical cache is *cache-size
invariance*: training with a tiny HBM cache (constant evict/reload
traffic through the host tiers) must produce EXACTLY the same per-id
embedding-row trajectories as training with a cache big enough to never
evict — because rows and their FTRL/Adam state migrate losslessly.
This is the property whose violation was the reference's known eviction
bug (RELEASE.md:6).
"""

import numpy as np
import pytest


from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel

from mindrec_tpu.train import optim
from mindrec_tpu.train.cached import CachedTrainingAdapter, cached_train_step
from mindrec_tpu.train.step import init_train_state, make_train_step

V = 512         # virtual vocab
F, B = 4, 8     # fields, batch
D = 8           # emb dim
STEPS = 6


def _batches(seed=3):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(STEPS):
        out.append({
            "ids": rng.integers(0, V, (B, F)).astype(np.int64),
            "wts": rng.normal(size=(B, F)).astype(np.float32),
            "label": rng.integers(0, 2, (B, 1)).astype(np.float32),
        })
    return out


def _run(cache_rows, tmp_path, batches):
    cfg = WideDeepConfig(
        batch_size=B, field_size=F, vocab_size=cache_rows, emb_dim=D,
        deep_layer_dim=(16, 8), sparse=True, loss_scale=1.0,
    )
    model = WideDeepModel(cfg)
    opt_w, opt_d = optim.ftrl(loss_scale=1.0), optim.lazy_adam(loss_scale=1.0)
    state = init_train_state(model, 0, opt_w, opt_d)
    adapter = CachedTrainingAdapter(
        model, virtual_vocab=V, cache_rows=cache_rows, max_swap=B * F + 8,
        spill_dir=str(tmp_path),
    )
    # pre-populate tiers with per-id deterministic rows so both runs
    # start from identical virtual tables (host init_fn is call-order
    # dependent, so lazy init would diverge between cache sizes)
    ids = np.arange(V)
    rng = np.random.default_rng(7)
    for name, tiers in adapter.tiers.items():
        d = tiers["param"].dim
        tiers["param"].write(ids, rng.normal(0, 0.01, (V, d)).astype(np.float32))
        for tname, tier in tiers.items():
            if tname == "param":
                continue
            bias = 1.0 if tname == "accum" else 0.0
            tier.write(ids, np.full((V, d), bias, np.float32))

    step = make_train_step(model, opt_w, opt_d, jit=True, donate=False)
    losses = []
    for b in batches:
        state, (lw, ld) = cached_train_step(adapter, step, state, b)
        losses.append(float(lw))
    adapter.flush_all(state)

    # final virtual-table rows for every touched id
    touched = np.unique(np.concatenate([b["ids"].reshape(-1) for b in batches]))
    rows = {
        name: adapter.tiers[name]["param"].read(touched)
        for name in adapter.tiers
    }
    states = {
        (name, tname): adapter.tiers[name][tname].read(touched)
        for name in adapter.tiers
        for tname in adapter.tiers[name]
        if tname != "param"
    }
    return losses, rows, states, touched


def test_cache_size_invariance(tmp_path):
    batches = _batches()
    small = _run(cache_rows=40, tmp_path=tmp_path / "a", batches=batches)
    big = _run(cache_rows=V, tmp_path=tmp_path / "b", batches=batches)

    np.testing.assert_allclose(small[0], big[0], rtol=1e-5, atol=1e-6)
    for name in small[1]:
        np.testing.assert_allclose(
            small[1][name], big[1][name], rtol=1e-5, atol=1e-6,
            err_msg=f"param rows diverge for table {name}",
        )
    for key in small[2]:
        np.testing.assert_allclose(
            small[2][key], big[2][key], rtol=1e-5, atol=1e-6,
            err_msg=f"optimizer state diverges for {key}",
        )


def test_untouched_ids_keep_lazy_init(tmp_path):
    """Ids never seen must not be materialized in the tiers."""
    cfg = WideDeepConfig(
        batch_size=B, field_size=F, vocab_size=64, emb_dim=D,
        deep_layer_dim=(16,), sparse=True, loss_scale=1.0,
    )
    model = WideDeepModel(cfg)
    adapter = CachedTrainingAdapter(
        model, virtual_vocab=10_000_000_000, cache_rows=64,
        max_swap=B * F + 8, ram_bytes=256 * D * 4, spill_dir=str(tmp_path),
    )
    state = init_train_state(model, 0, optim.ftrl(), optim.lazy_adam())
    step = make_train_step(model, optim.ftrl(), optim.lazy_adam(), jit=True,
                           donate=False)
    b = {
        "ids": np.array([[5, 9_999_999_999, 12, 5]] * B, np.int64),
        "wts": np.ones((B, F), np.float32),
        "label": np.ones((B, 1), np.float32),
    }
    state, (lw, ld) = cached_train_step(adapter, step, state, b)
    assert np.isfinite(lw) and np.isfinite(ld)
    # huge-id row lives beyond the RAM cap -> allocated in the spill file
    adapter.flush_all(state)
    deep = adapter.tiers["deep"]["param"]
    assert 9_999_999_999 in deep._ssd_index


def test_cache_thrash_raises(tmp_path):
    cfg = WideDeepConfig(batch_size=B, field_size=F, vocab_size=8, emb_dim=D,
                         deep_layer_dim=(8,), sparse=True)
    model = WideDeepModel(cfg)
    adapter = CachedTrainingAdapter(
        model, virtual_vocab=V, cache_rows=8, max_swap=64,
        spill_dir=str(tmp_path),
    )
    b = {"ids": np.arange(B * F, dtype=np.int64).reshape(B, F)}
    with pytest.raises(RuntimeError, match="thrash"):
        adapter.prepare(b)


def _run_async(cache_rows, tmp_path, batches):
    """Same as :func:`_run` but driven through AsyncCachedTrainer (the
    pipelined r5 driver: worker-thread writeback->prepare chain +
    threaded per-tier reads)."""
    from mindrec_tpu.train.cached import AsyncCachedTrainer

    cfg = WideDeepConfig(
        batch_size=B, field_size=F, vocab_size=cache_rows, emb_dim=D,
        deep_layer_dim=(16, 8), sparse=True, loss_scale=1.0,
    )
    model = WideDeepModel(cfg)
    opt_w, opt_d = optim.ftrl(loss_scale=1.0), optim.lazy_adam(loss_scale=1.0)
    state = init_train_state(model, 0, opt_w, opt_d)
    adapter = CachedTrainingAdapter(
        model, virtual_vocab=V, cache_rows=cache_rows, max_swap=B * F + 8,
        spill_dir=str(tmp_path),
    )
    ids = np.arange(V)
    rng = np.random.default_rng(7)
    for name, tiers in adapter.tiers.items():
        d = tiers["param"].dim
        tiers["param"].write(ids, rng.normal(0, 0.01, (V, d)).astype(np.float32))
        for tname, tier in tiers.items():
            if tname == "param":
                continue
            bias = 1.0 if tname == "accum" else 0.0
            tier.write(ids, np.full((V, d), bias, np.float32))

    step = make_train_step(model, opt_w, opt_d, jit=True, donate=False)
    trainer = AsyncCachedTrainer(adapter, step, state)
    losses = []
    for b in batches:
        out = trainer.step(b)
        if out is not None:
            losses.append(float(out[0]))
    state = trainer.finish()
    adapter.flush_all(state)

    touched = np.unique(np.concatenate([b["ids"].reshape(-1) for b in batches]))
    rows = {
        name: adapter.tiers[name]["param"].read(touched)
        for name in adapter.tiers
    }
    states = {
        (name, tname): adapter.tiers[name][tname].read(touched)
        for name in adapter.tiers
        for tname in adapter.tiers[name]
        if tname != "param"
    }
    return losses, rows, states, touched


def test_async_trainer_matches_serial_protocol(tmp_path):
    """The pipelined driver must be bit-identical to the serial
    per-step protocol: only device-dispatch overlap changes, never the
    order of LRU/tier operations."""
    batches = _batches(seed=11)
    serial = _run(cache_rows=40, tmp_path=tmp_path / "s", batches=batches)
    pipe = _run_async(cache_rows=40, tmp_path=tmp_path / "p", batches=batches)
    np.testing.assert_array_equal(
        np.sort(np.asarray(serial[0])), np.sort(np.asarray(pipe[0]))
    )
    for name in serial[1]:
        np.testing.assert_array_equal(serial[1][name], pipe[1][name])
    for k in serial[2]:
        np.testing.assert_array_equal(serial[2][k], pipe[2][k])
