"""Optimizer unit tests: dense/sparse consistency, FTRL/Adam behavior."""

import jax.numpy as jnp
import numpy as np

from mindrec_tpu.train import optim


def test_sgd_dense():
    opt = optim.sgd(0.1)
    p = {"a": jnp.ones((3,)), "b": {"c": jnp.zeros((2, 2))}}
    g = {"a": jnp.ones((3,)), "b": {"c": jnp.ones((2, 2))}}
    s = opt.init(p)
    p2, s2 = opt.update(g, s, p)
    np.testing.assert_allclose(p2["a"], 0.9 * np.ones(3), rtol=1e-6)
    np.testing.assert_allclose(p2["b"]["c"], -0.1 * np.ones((2, 2)), rtol=1e-6)


def test_adam_matches_reference_formula():
    opt = optim.adam(learning_rate=1e-2, b1=0.9, b2=0.999, eps=1e-8)
    p = jnp.array([1.0, 2.0])
    g = jnp.array([0.5, -0.5])
    s = opt.init_leaf(p)
    p2, s2 = opt.update_leaf(g, s, p)
    # step 1: m=0.1g, v=0.001g^2, mhat=g, vhat=g^2 -> update = lr*g/(|g|+~eps)
    lr_t = 1e-2 * np.sqrt(1 - 0.999) / (1 - 0.9)
    expect = np.array([1.0, 2.0]) - lr_t * np.array([0.05, -0.05]) / (
        np.sqrt(0.001 * 0.25) + 1e-8
    )
    np.testing.assert_allclose(np.asarray(p2), expect, rtol=1e-5)


def test_ftrl_sparse_matches_dense():
    """Row-sparse FTRL on touched rows == dense FTRL when untouched rows
    have zero grad AND zero weight (untouched-row drift from w=0 is the
    documented FTRL-dense behavior; with w=0, sigma*w=0 so no drift)."""
    opt = optim.ftrl(learning_rate=0.05)
    table = jnp.zeros((10, 4))
    grads_rows = jnp.array([[1.0, -1.0, 0.5, 0.0], [0.2, 0.2, 0.2, 0.2]])
    ids = jnp.array([2, 7])

    s_rows = opt.init_leaf(table)
    t_sparse, s_sparse = opt.update_rows(grads_rows, ids, s_rows, table)

    dense_g = jnp.zeros_like(table).at[ids].set(grads_rows)
    s_dense = opt.init_leaf(table)
    t_dense, _ = opt.update_leaf(dense_g, s_dense, table)

    np.testing.assert_allclose(np.asarray(t_sparse), np.asarray(t_dense), rtol=1e-6)


def test_lazy_adam_rows_only_touch_given_rows():
    opt = optim.lazy_adam(learning_rate=1e-2)
    table = jnp.ones((6, 3))
    s = opt.init_leaf(table)
    ids = jnp.array([1, 4])
    g = jnp.ones((2, 3))
    t2, s2 = opt.update_rows(g, ids, s, table)
    t2 = np.asarray(t2)
    np.testing.assert_allclose(t2[[0, 2, 3, 5]], 1.0)
    assert np.all(t2[[1, 4]] < 1.0)
    # moments advanced only for touched rows
    m = np.asarray(s2["m"])
    assert np.all(m[[0, 2, 3, 5]] == 0.0)
    assert np.all(m[[1, 4]] != 0.0)


def test_loss_scale_unscaling():
    opt_scaled = optim.sgd(0.1, loss_scale=1024.0)
    opt_plain = optim.sgd(0.1)
    p = jnp.array([1.0])
    g = jnp.array([0.5])
    p_a, _ = opt_scaled.update_leaf(g * 1024.0, opt_scaled.init_leaf(p), p)
    p_b, _ = opt_plain.update_leaf(g, opt_plain.init_leaf(p), p)
    np.testing.assert_allclose(np.asarray(p_a), np.asarray(p_b), rtol=1e-6)


def test_ftrl_shrinks_toward_zero_with_l1():
    opt = optim.ftrl(learning_rate=0.5, l1=10.0)
    p = jnp.array([0.0])
    g = jnp.array([0.01])
    s = opt.init_leaf(p)
    p2, _ = opt.update_leaf(g, s, p)
    # tiny grad, huge l1 -> weight stays at exactly 0
    np.testing.assert_allclose(np.asarray(p2), 0.0)


def test_adam_bf16_state_tracks_f32():
    """bf16 m/v storage (state_dtype) stays close to f32 Adam over many
    steps — the quality gate for running the bandwidth-saving bf16
    moments in the sparse streaming update."""
    opt32 = optim.adam(learning_rate=1e-2)
    opt16 = optim.adam(learning_rate=1e-2, state_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    p32 = p16 = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    s32, s16 = opt32.init_leaf(p32), opt16.init_leaf(p16)
    assert s16["m"].dtype == jnp.bfloat16
    for i in range(50):
        g = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
        p32, s32 = opt32.update_leaf(g, s32, p32)
        p16, s16 = opt16.update_leaf(g, s16, p16)
    # trajectories agree to ~bf16 resolution accumulated over 50 steps
    np.testing.assert_allclose(np.asarray(p16), np.asarray(p32), atol=3e-2)
    assert s16["m"].dtype == jnp.bfloat16 and s16["v"].dtype == jnp.bfloat16
