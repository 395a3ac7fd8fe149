"""Mesh-parallel training semantics on the virtual 8-device CPU mesh.

Covers the reference's parallel regimes (SURVEY §2.3):
* DP: batch sharded, replicated params — post-step params equal the
  single-device step on the same global batch (``DistributedGradReducer``
  gradients-mean parity, ``wide_and_deep.py:455-470``);
* hybrid DP+MP: embedding tables row-sliced over the model axis
  (TABLE_ROW_SLICE, ``wide_and_deep.py:232-249``) — numerical parity
  with the unsharded sparse step, and the optimizer state shards with
  its table;
* full-batch input mode (``set_auto_parallel_context(full_batch=True)``,
  ``train_and_eval_parameter_server_distribute.py:95-96``);
* column slice (``default_config.yaml:38``) — numerical parity too.
"""

import jax
import numpy as np
import pytest

from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
from mindrec_tpu.parallel.mesh import shard_batch, shard_train_state
from mindrec_tpu.train import optim
from mindrec_tpu.train.step import (
    flatten_params,
    init_train_state,
    make_train_step,
)


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


def _run_steps(model, opts, state, batches):
    step = make_train_step(model, *opts, jit=True, donate=False)
    lw = ld = None
    for batch in batches:
        state, (lw, ld) = step(state, batch)
    return state, float(lw), float(ld)


def _assert_params_equal(state_a, state_b, rtol=1e-5, atol=1e-6):
    flat_a, _ = flatten_params(state_a.params)
    flat_b, _ = flatten_params(state_b.params)
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (key, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol,
            err_msg=f"param {key} diverged",
        )


def test_dp_matches_single_device(mesh8):
    """Two data-parallel steps over the mesh == two single-device steps
    on the same global batches: POST-STEP params must match, which fails
    if gradient reduction is broken (not just the pre-update losses)."""
    cfg = _cfg()
    model = WideDeepModel(cfg)
    opts = (optim.ftrl(), optim.lazy_adam())
    state = init_train_state(model, jax.random.PRNGKey(0), *opts)
    batches = [_batch(cfg, seed=s) for s in (0, 1)]

    ref_state, lw_ref, ld_ref = _run_steps(model, opts, state, batches)

    with mesh8:
        state_m = shard_train_state(state, model, mesh8)
        batches_m = [shard_batch(b, mesh8) for b in batches]
        state2, lw, ld = _run_steps(model, opts, state_m, batches_m)
    assert lw == pytest.approx(lw_ref, rel=1e-4)
    assert ld == pytest.approx(ld_ref, rel=1e-4)
    _assert_params_equal(state2, ref_state)


def test_dp_diverges_if_not_reduced(mesh8):
    """Sanity check for the parity oracle itself: training on HALF the
    global batch produces different post-step params, i.e. the
    _assert_params_equal gate actually detects broken grad semantics."""
    cfg = _cfg()
    model = WideDeepModel(cfg)
    opts = (optim.ftrl(), optim.lazy_adam())
    state = init_train_state(model, jax.random.PRNGKey(0), *opts)
    batch = _batch(cfg)
    half = {k: v[: cfg.batch_size // 2] for k, v in batch.items()}

    ref_state, _, _ = _run_steps(model, opts, state, [batch])
    alt_state, _, _ = _run_steps(model, opts, state, [half])
    with pytest.raises(AssertionError):
        _assert_params_equal(ref_state, alt_state)


def test_hybrid_row_slice_matches_unsharded(mesh8):
    """Row-sliced sparse training == the identical sparse step run
    unsharded on one device (exact semantics; tolerance only for
    collective reduction order)."""
    cfg = _cfg(sparse=True, deep_table_slice_mode="table_row_slice")
    model = WideDeepModel(cfg, mesh=mesh8)
    opts = (optim.ftrl(), optim.lazy_adam())
    state = init_train_state(model, jax.random.PRNGKey(0), *opts)
    batches = [_batch(cfg, seed=s) for s in (0, 1)]

    ref_state, lw_ref, ld_ref = _run_steps(model, opts, state, batches)

    with mesh8:
        state_m = shard_train_state(state, model, mesh8)
        batches_m = [shard_batch(b, mesh8) for b in batches]
        state2, lw, ld = _run_steps(model, opts, state_m, batches_m)
    assert lw == pytest.approx(lw_ref, rel=1e-4)
    assert ld == pytest.approx(ld_ref, rel=1e-4)
    _assert_params_equal(state2, ref_state)
    # deep table is actually sharded over the model axis
    sh = state2.params["deep"]["table"].sharding
    assert "model" in str(sh.spec)


def test_sparse_opt_state_shards_with_table(mesh8):
    """Feature-major [Dp, Vc] optimizer state must shard along the vocab
    axis exactly like its table — NOT silently replicate (the whole
    point of model sharding is per-device state memory)."""
    cfg = _cfg(sparse=True, deep_table_slice_mode="table_row_slice")
    model = WideDeepModel(cfg, mesh=mesh8)
    opts = (optim.ftrl(), optim.lazy_adam())
    state = init_train_state(model, jax.random.PRNGKey(0), *opts)
    with mesh8:
        state_m = shard_train_state(state, model, mesh8)
    for key, (name, spec) in (
        ("deep/table", ("deep", model.deep_spec)),
        ("wide/table", ("wide", model.wide_spec)),
    ):
        if spec.slice_mode == "none":
            continue
        table = state_m.params["deep"]["table"]
        table_spec = table.sharding.spec
        opt_state = state_m.opt_d.get(key) or state_m.opt_w.get(key)
        for tname, leaf in opt_state.items():
            if getattr(leaf, "ndim", 0) != 2:
                continue  # scalars (adam step counter) stay replicated
            assert leaf.sharding.spec == table_spec, (
                f"{key} opt leaf {tname}: sharding {leaf.sharding.spec} "
                f"!= table {table_spec}"
            )
    # per-device bytes actually drop: addressable shard is 1/model_size
    leaf = state_m.opt_d["deep/table"]["m"]
    shard_elems = leaf.addressable_shards[0].data.size
    assert shard_elems * mesh8.shape["model"] == leaf.size


def test_full_batch_mode(mesh8):
    """full_batch=True: replicated inputs + sharded tables give the same
    post-step params as the sharded-input run."""
    cfg = _cfg(sparse=True, deep_table_slice_mode="table_row_slice")
    model = WideDeepModel(cfg, mesh=mesh8)
    opts = (optim.ftrl(), optim.lazy_adam())
    state = init_train_state(model, jax.random.PRNGKey(0), *opts)
    batch = _batch(cfg)
    with mesh8:
        sA = shard_train_state(state, model, mesh8)
        stA, lw_a, ld_a = _run_steps(model, opts, sA, [shard_batch(batch, mesh8)])
        sB = shard_train_state(state, model, mesh8)
        stB, lw_b, ld_b = _run_steps(
            model, opts, sB, [shard_batch(batch, mesh8, full_batch=True)]
        )
    assert lw_b == pytest.approx(lw_a, rel=1e-4)
    assert ld_b == pytest.approx(ld_a, rel=1e-4)
    _assert_params_equal(stA, stB)


def test_column_slice_matches_unsharded(mesh8):
    """TABLE_COLUMN_SLICE: the embedding dim sharded over the model axis
    (reference deep_table_slice_mode column_slice,
    ``default_config.yaml:38``) — numerical parity with the unsharded
    sparse step."""
    cfg = _cfg(sparse=True, deep_table_slice_mode="table_column_slice")
    model = WideDeepModel(cfg, mesh=mesh8)
    opts = (optim.ftrl(), optim.lazy_adam())
    state = init_train_state(model, jax.random.PRNGKey(0), *opts)
    batches = [_batch(cfg, seed=s) for s in (0, 1)]

    ref_state, lw_ref, ld_ref = _run_steps(model, opts, state, batches)

    with mesh8:
        state_m = shard_train_state(state, model, mesh8)
        batches_m = [shard_batch(b, mesh8) for b in batches]
        state2, lw, ld = _run_steps(model, opts, state_m, batches_m)
    assert lw == pytest.approx(lw_ref, rel=1e-4)
    assert ld == pytest.approx(ld_ref, rel=1e-4)
    _assert_params_equal(state2, ref_state)


@pytest.mark.parametrize("which", ["deepfm", "dcn"])
def test_other_models_row_slice_matches_unsharded(mesh8, which):
    """DeepFM and DCN sharded sparse training == the unsharded step
    (the W&D parity standard applied to the rest of the zoo)."""
    if which == "deepfm":
        from mindrec_tpu.models.deepfm import DeepFMConfig, DeepFMModel

        cfg = DeepFMConfig(batch_size=32, field_size=8, vocab_size=512,
                           emb_dim=8, deep_layer_dim=(32, 16),
                           use_mixed_precision=False, sparse=True,
                           loss_scale=1.0,
                           table_slice_mode="table_row_slice")
        model = DeepFMModel(cfg, mesh=mesh8)
        opts = (optim.adam(loss_scale=1.0), optim.adam(loss_scale=1.0))
        table_path = ("fm", "table")
    else:
        from mindrec_tpu.models.dcn import DCNConfig, DCNModel

        cfg = DCNConfig(batch_size=32, field_size=8, vocab_size=512,
                        emb_dim=8, deep_layer_dim=(32, 16),
                        cross_layer_num=2, sparse=True, loss_scale=1.0,
                        table_slice_mode="table_row_slice")
        model = DCNModel(cfg, mesh=mesh8)
        opts = (optim.adam(loss_scale=1.0), optim.adam(loss_scale=1.0))
        table_path = ("emb", "table")

    state = init_train_state(model, jax.random.PRNGKey(0), *opts)
    batches = [_batch(cfg, seed=s) for s in (0, 1)]
    ref_state, lw_ref, ld_ref = _run_steps(model, opts, state, batches)

    with mesh8:
        state_m = shard_train_state(state, model, mesh8)
        batches_m = [shard_batch(b, mesh8) for b in batches]
        state2, lw, ld = _run_steps(model, opts, state_m, batches_m)
    assert ld == pytest.approx(ld_ref, rel=1e-4)
    _assert_params_equal(state2, ref_state)
    node = state2.params
    for pth in table_path:
        node = node[pth]
    assert "model" in str(node.sharding.spec)
