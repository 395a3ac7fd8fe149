"""Multitable Wide&Deep (Outbrain): forward shapes, pooling semantics,
training, grouped MAP metric integration."""

import jax
import numpy as np

from mindrec_tpu.models.multitable import (
    MULTI_FIELDS,
    MultiTableConfig,
    MultiTableWideDeepModel,
)
from mindrec_tpu.train import optim
from mindrec_tpu.train.metrics import GroupedMapMetric
from mindrec_tpu.train.step import init_train_state, make_train_step

CFG = MultiTableConfig(
    batch_size=16,
    continue_field_size=4,
    indicator_field_size=2,
    emb128_field_size=1,
    emb64_single_field_size=2,
    multi_hot_sizes=(3, 4, 3, 2, 2, 3),
    emb_128_size=100,
    emb64_single_size=50,
    emb64_multi_size=60,
    indicator_size=16,
    deep_layer_dim=(32, 16),
    use_mixed_precision=False,
    loss_scale=1.0,
)


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    B = cfg.batch_size
    b = {
        "continue_val": rng.uniform(size=(B, cfg.continue_field_size)).astype(np.float32),
        "indicator_id": rng.integers(0, cfg.indicator_size, (B, cfg.indicator_field_size)).astype(np.int32),
        "emb_128_id": rng.integers(0, cfg.emb_128_size, (B, cfg.emb128_field_size)).astype(np.int32),
        "emb_64_single_id": rng.integers(0, cfg.emb64_single_size, (B, cfg.emb64_single_field_size)).astype(np.int32),
        "label": (rng.uniform(size=(B, 1)) > 0.5).astype(np.float32),
        "display_id": np.repeat(np.arange(B // 4), 4).astype(np.int32),
    }
    for name, L in zip(MULTI_FIELDS, cfg.multi_hot_sizes):
        b[f"multi_{name}_id"] = rng.integers(0, cfg.emb64_multi_size, (B, L)).astype(np.int32)
        lens = rng.integers(1, L + 1, B)
        mask = (np.arange(L)[None, :] < lens[:, None]).astype(np.float32)
        b[f"multi_{name}_mask"] = mask
    return b


def test_forward_shape_and_input_dim():
    model = MultiTableWideDeepModel(CFG)
    params = model.init(jax.random.PRNGKey(0))
    b = _batch(CFG)
    out = model.apply(params, b)
    assert out.shape == (CFG.batch_size, 1)
    assert CFG.input_emb_dim == 4 + 2 * 64 + 1 * 128 + 2 * 64 + 6 * 64


def test_multihot_pooling_divides_by_full_length():
    """Reference ReduceMean semantics: mask-multiply then mean over the
    full hot dimension L (not mask sum)."""
    model = MultiTableWideDeepModel(CFG)
    params = model.init(jax.random.PRNGKey(0))
    b = _batch(CFG, seed=1)
    name = MULTI_FIELDS[0]
    ids, mask = b[f"multi_{name}_id"], b[f"multi_{name}_mask"]
    emb = np.asarray(model.emb64_multi(params["deep"]["emb64_multi"], ids))
    expect = (emb * mask[:, :, None]).mean(axis=1)
    hand = (emb * mask[:, :, None]).sum(axis=1) / ids.shape[1]
    np.testing.assert_allclose(expect, hand, rtol=1e-6)


def test_trains_loss_down_with_dual_optimizers():
    model = MultiTableWideDeepModel(CFG)
    opt_w = optim.ftrl(learning_rate=5e-2, l1=5e-4, l2=5e-4, initial_accum=0.1, loss_scale=1.0)
    opt_d = optim.adam(learning_rate=1e-3, eps=1e-6, loss_scale=1.0)
    state = init_train_state(model, jax.random.PRNGKey(0), opt_w, opt_d)
    step = make_train_step(model, opt_w, opt_d, sparse=False, jit=True, donate=False)
    b = _batch(CFG, seed=2)
    losses = []
    for _ in range(15):
        state, (lw, ld) = step(state, b)
        losses.append(float(ld))
    assert losses[-1] < losses[0]


def test_eval_with_grouped_map():
    model = MultiTableWideDeepModel(CFG)
    params = model.init(jax.random.PRNGKey(0))
    b = _batch(CFG, seed=3)
    probs = np.asarray(model.predict(params, b))
    m = GroupedMapMetric(k=12)
    m.update(probs, b["label"], b["display_id"])
    v = m.eval()
    assert 0.0 <= v <= 1.0
