"""DeepFM and DCN: shapes, FM identity, cross-layer math, learnability."""

import jax
import jax.numpy as jnp
import numpy as np

from mindrec_tpu.data.criteo import SyntheticCriteo
from mindrec_tpu.models.dcn import DCNConfig, DCNModel
from mindrec_tpu.models.deepfm import DeepFMConfig, DeepFMModel
from mindrec_tpu.train import optim
from mindrec_tpu.train.metrics import AUCMetric
from mindrec_tpu.train.step import init_train_state, make_eval_step, make_train_step


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "ids": rng.integers(0, cfg.vocab_size, size=(cfg.batch_size, cfg.field_size)).astype(np.int32),
        "wts": np.ones((cfg.batch_size, cfg.field_size), np.float32),
        "label": (rng.uniform(size=(cfg.batch_size, 1)) > 0.5).astype(np.float32),
    }


FM_SMALL = DeepFMConfig(
    batch_size=32, field_size=6, vocab_size=500, emb_dim=8,
    deep_layer_dim=(16,), use_mixed_precision=False, keep_prob=1.0,
    dropout_flag=False, loss_scale=1.0,
)

DCN_SMALL = DCNConfig(
    batch_size=32, field_size=6, vocab_size=500, emb_dim=8,
    deep_layer_dim=(16, 16), cross_layer_num=3, loss_scale=1.0,
)


def test_deepfm_forward_and_fm_identity():
    model = DeepFMModel(FM_SMALL)
    params = model.init(jax.random.PRNGKey(0))
    b = _batch(FM_SMALL)
    logits = model.apply(params, b["ids"], b["wts"])
    assert logits.shape == (FM_SMALL.batch_size, 1)

    # FM identity check: 0.5*((sum v)^2 - sum v^2) == sum_{i<j} v_i.v_j
    v = np.asarray(model.v_lookup(params["fm"]["table"], b["ids"]))  # [B,F,D]
    s = v.sum(axis=1)
    fm_fast = 0.5 * ((s ** 2).sum(-1) - (v ** 2).sum(axis=(1, 2)))
    fm_naive = np.zeros(v.shape[0])
    for i in range(v.shape[1]):
        for j in range(i + 1, v.shape[1]):
            fm_naive += (v[:, i] * v[:, j]).sum(-1)
    np.testing.assert_allclose(fm_fast, fm_naive, rtol=1e-4)


def test_dcn_cross_layer_math():
    model = DCNModel(DCN_SMALL)
    params = model.init(jax.random.PRNGKey(0))
    d = model.input_size
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(4, d)).astype(np.float32))
    out = model._cross_net(params["cross"][:1], x0)
    w, bias = params["cross"][0]["w"], params["cross"][0]["b"]
    expect = x0 * (x0 @ w)[:, None] + bias[None, :] + x0
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5)


def test_deepfm_trains_and_improves_auc():
    cfg = DeepFMConfig(
        batch_size=256, field_size=8, vocab_size=5000, emb_dim=8,
        deep_layer_dim=(32,), use_mixed_precision=False, keep_prob=1.0,
        dropout_flag=False, loss_scale=1024.0,
    )
    model = DeepFMModel(cfg)
    opt = optim.adam(learning_rate=3e-3, loss_scale=cfg.loss_scale)
    state = init_train_state(model, jax.random.PRNGKey(0), optim.ftrl(loss_scale=cfg.loss_scale), opt)
    step = make_train_step(model, optim.ftrl(loss_scale=cfg.loss_scale), opt, jit=True, donate=False)
    eval_step = make_eval_step(model)
    data = SyntheticCriteo(cfg.batch_size, cfg.field_size, cfg.vocab_size, steps=25, seed=1)

    def auc(params):
        m = AUCMetric()
        for s in range(3):
            b = SyntheticCriteo(cfg.batch_size, cfg.field_size, cfg.vocab_size, steps=3, seed=555).get_batch(s)
            p, l = eval_step(params, b)
            m.update(np.asarray(p), np.asarray(l))
        return m.eval()

    before = auc(state.params)
    for _ in range(2):
        for b in data:
            state, (lw, ld) = step(state, b)
    after = auc(state.params)
    assert after > before + 0.05, (before, after)


def test_dcn_trains_loss_down():
    model = DCNModel(DCN_SMALL)
    opt = optim.adam(learning_rate=1e-3)
    state = init_train_state(model, jax.random.PRNGKey(0), optim.ftrl(), opt)
    step = make_train_step(model, optim.ftrl(), opt, jit=True, donate=False)
    b = _batch(DCN_SMALL, seed=5)
    losses = []
    for _ in range(30):
        state, (lw, ld) = step(state, b)
        losses.append(float(ld))
    assert losses[-1] < losses[0]


def test_dcn_sparse_step_runs():
    cfg = DCNConfig(
        batch_size=32, field_size=6, vocab_size=500, emb_dim=8,
        deep_layer_dim=(16, 16), cross_layer_num=2, sparse=True, loss_scale=1.0,
    )
    model = DCNModel(cfg)
    opt = optim.adam(learning_rate=1e-3)
    state = init_train_state(model, jax.random.PRNGKey(0), optim.ftrl(), opt)
    step = make_train_step(model, optim.ftrl(), opt, jit=True, donate=False)
    b = _batch(cfg)
    state, (lw, ld) = step(state, b)
    assert np.isfinite(float(ld))


def test_dcn_one_hot_embedding_matches_gather():
    """Reference one-hot matmul gather option (deep_and_cross.py:188-203):
    same forward as the gather path (f32, no mixed precision)."""
    import dataclasses

    cfg = dataclasses.replace(DCN_SMALL, use_one_hot_embeddings=True)
    m_oh = DCNModel(cfg)
    m_g = DCNModel(DCN_SMALL)
    params = m_g.init(jax.random.PRNGKey(0))
    b = _batch(DCN_SMALL)
    out_oh = jax.jit(lambda p, i, w: m_oh.apply(p, i, w))(params, b["ids"], b["wts"])
    out_g = jax.jit(lambda p, i, w: m_g.apply(p, i, w))(params, b["ids"], b["wts"])
    np.testing.assert_allclose(np.asarray(out_oh), np.asarray(out_g), rtol=1e-5, atol=1e-6)
