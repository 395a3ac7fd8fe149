"""Wide&Deep model + train step: shapes, sparse/dense step equivalence,
loss decrease, end-to-end AUC learnability on synthetic criteo."""

import jax
import numpy as np

from mindrec_tpu.data.criteo import SyntheticCriteo
from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
from mindrec_tpu.ops.embedding import from_storage
from mindrec_tpu.train import optim
from mindrec_tpu.train.metrics import AUCMetric
from mindrec_tpu.train.step import init_train_state, make_eval_step, make_train_step

SMALL = WideDeepConfig(
    batch_size=64,
    field_size=8,
    vocab_size=1000,
    emb_dim=8,
    deep_layer_dim=(32, 16),
    use_mixed_precision=False,
    loss_scale=1.0,
)


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "ids": rng.integers(0, cfg.vocab_size, size=(cfg.batch_size, cfg.field_size)).astype(np.int32),
        "wts": np.ones((cfg.batch_size, cfg.field_size), np.float32),
        "label": (rng.uniform(size=(cfg.batch_size, 1)) > 0.5).astype(np.float32),
    }


def test_forward_shapes():
    model = WideDeepModel(SMALL)
    params = model.init(jax.random.PRNGKey(0))
    b = _batch(SMALL)
    logits = model.apply(params, b["ids"], b["wts"])
    assert logits.shape == (SMALL.batch_size, 1)
    probs = model.predict(params, b["ids"], b["wts"])
    assert np.all((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1))


def test_dense_step_decreases_loss():
    model = WideDeepModel(SMALL)
    state = init_train_state(model, jax.random.PRNGKey(0), optim.ftrl(), optim.adam(learning_rate=1e-2))
    step = make_train_step(model, optim.ftrl(), optim.adam(learning_rate=1e-2), jit=True, donate=False)
    b = _batch(SMALL)
    losses = []
    for _ in range(20):
        state, (lw, ld) = step(state, b)
        losses.append(float(ld))
    assert losses[-1] < losses[0]


def test_sparse_step_matches_dense_embedding_grads():
    """One SGD step: the sparse (unique->rows->scatter) path must produce
    the same new embedding table as the dense-grad path."""
    cfg = WideDeepConfig(
        batch_size=16,
        field_size=4,
        vocab_size=50,
        emb_dim=4,
        deep_layer_dim=(8,),
        use_mixed_precision=False,
        loss_scale=1.0,
    )
    sgd = optim.sgd(0.1)

    dense_model = WideDeepModel(cfg)
    sparse_model = WideDeepModel(
        WideDeepConfig(**{**cfg.__dict__, "sparse": True})
    )
    key = jax.random.PRNGKey(7)
    state_dense = init_train_state(dense_model, key, sgd, sgd)
    state_sparse = init_train_state(sparse_model, key, sgd, sgd)
    # identical init (sparse tables are stored feature-major; compare in
    # the logical [V, D] view)
    np.testing.assert_allclose(
        np.asarray(state_dense.params["deep"]["table"]),
        from_storage(sparse_model.deep_spec, state_sparse.params["deep"]["table"]),
    )

    b = _batch(cfg, seed=3)
    step_dense = make_train_step(dense_model, sgd, sgd, sparse=False, jit=True, donate=False)
    step_sparse = make_train_step(sparse_model, sgd, sgd, sparse=True, jit=True, donate=False)
    sd, (lw_d, ld_d) = step_dense(state_dense, b)
    ss, (lw_s, ld_s) = step_sparse(state_sparse, b)
    # same loss (l2 off in sparse; set l2 comparable by checking wide loss)
    np.testing.assert_allclose(float(lw_d), float(lw_s), rtol=1e-5)
    # same wide table update (FTRL-free: sgd) — wide has no l2 either way
    np.testing.assert_allclose(
        np.asarray(sd.params["wide"]["table"])[: cfg.vocab_size],
        from_storage(sparse_model.wide_spec, ss.params["wide"]["table"])[: cfg.vocab_size],
        rtol=1e-4,
        atol=1e-7,
    )
    # deep table update parity too (through the fold-free sparse path)
    np.testing.assert_allclose(
        np.asarray(sd.params["deep"]["table"])[: cfg.vocab_size],
        from_storage(sparse_model.deep_spec, ss.params["deep"]["table"])[: cfg.vocab_size],
        rtol=1e-4,
        atol=1e-7,
    )


def test_e2e_auc_improves_on_synthetic():
    cfg = WideDeepConfig(
        batch_size=256,
        field_size=8,
        vocab_size=5000,
        emb_dim=8,
        deep_layer_dim=(64, 32),
        use_mixed_precision=False,
        sparse=True,
        loss_scale=1024.0,
    )
    model = WideDeepModel(cfg)
    data = SyntheticCriteo(cfg.batch_size, cfg.field_size, cfg.vocab_size, steps=30, seed=1)
    opt_w = optim.ftrl(loss_scale=cfg.loss_scale)
    opt_d = optim.adam(learning_rate=3e-3, loss_scale=cfg.loss_scale)
    state = init_train_state(model, jax.random.PRNGKey(0), opt_w, opt_d)
    step = make_train_step(model, opt_w, opt_d, jit=True, donate=False)
    eval_step = make_eval_step(model)

    def auc_now(params):
        m = AUCMetric()
        for s in range(3):
            b = SyntheticCriteo(cfg.batch_size, cfg.field_size, cfg.vocab_size, steps=3, seed=999).get_batch(s)
            probs, labels = eval_step(params, b)
            m.update(np.asarray(probs), np.asarray(labels))
        return m.eval()

    auc_before = auc_now(state.params)
    for epoch in range(3):
        for b in data:
            state, _ = step(state, b)
    auc_after = auc_now(state.params)
    assert auc_after > auc_before + 0.05, (auc_before, auc_after)
    assert auc_after > 0.65


def test_dummy_row_stays_zero_in_sparse_training():
    cfg = WideDeepConfig(
        batch_size=32, field_size=4, vocab_size=100, emb_dim=4,
        deep_layer_dim=(8,), use_mixed_precision=False, sparse=True, loss_scale=1.0,
    )
    model = WideDeepModel(cfg)
    opt_w, opt_d = optim.ftrl(), optim.adam()
    state = init_train_state(model, jax.random.PRNGKey(0), opt_w, opt_d)
    step = make_train_step(model, opt_w, opt_d, jit=True, donate=False)
    for s in range(5):
        state, _ = step(state, _batch(cfg, seed=s))
    np.testing.assert_allclose(
        from_storage(model.deep_spec, state.params["deep"]["table"])[cfg.vocab_size],
        0.0,
        atol=1e-12,
    )
