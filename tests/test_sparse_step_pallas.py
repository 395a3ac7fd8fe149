"""The pallas sparse step (sort+streamed kernels, interpret mode) must
match the generic sparse step (unique+segment-sum+scatter)."""

import jax
import numpy as np
import pytest

from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
from mindrec_tpu.ops.pallas import stream_update
from mindrec_tpu.train import optim
from mindrec_tpu.train.step import init_train_state, make_train_step

CFG = WideDeepConfig(
    batch_size=32,
    field_size=4,
    vocab_size=900,  # padded to 1024
    emb_dim=8,
    deep_layer_dim=(16,),
    use_mixed_precision=False,
    sparse=True,
    loss_scale=1024.0,
)


@pytest.fixture(autouse=True)
def _interpret_kernels():
    stream_update.INTERPRET = True
    yield
    stream_update.INTERPRET = False


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "ids": rng.integers(0, CFG.vocab_size, size=(CFG.batch_size, CFG.field_size)).astype(np.int32),
        "wts": np.ones((CFG.batch_size, CFG.field_size), np.float32),
        "label": (rng.uniform(size=(CFG.batch_size, 1)) > 0.5).astype(np.float32),
    }


def test_pallas_step_matches_generic():
    model = WideDeepModel(CFG)
    opt_w = optim.ftrl(loss_scale=CFG.loss_scale)
    opt_d = optim.lazy_adam(loss_scale=CFG.loss_scale)
    key = jax.random.PRNGKey(0)

    s_gen = init_train_state(model, key, opt_w, opt_d)
    s_pal = init_train_state(model, key, opt_w, opt_d)

    import jax.numpy as jnp

    step_gen = make_train_step(model, opt_w, opt_d, jit=True, donate=False, use_pallas=False)
    step_pal = make_train_step(
        model, opt_w, opt_d, jit=True, donate=False, use_pallas=True,
        matmul_dtype=jnp.float32,  # exact parity (prod uses bf16 one-hots)
    )

    for i in range(3):
        b = _batch(seed=i)
        s_gen, (lw_g, ld_g) = step_gen(s_gen, b)
        s_pal, (lw_p, ld_p) = step_pal(s_pal, b)
        np.testing.assert_allclose(float(ld_g), float(ld_p), rtol=1e-5)

    np.testing.assert_allclose(
        np.asarray(s_pal.params["deep"]["table"]),
        np.asarray(s_gen.params["deep"]["table"]),
        rtol=2e-2, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s_pal.params["wide"]["table"]),
        np.asarray(s_gen.params["wide"]["table"]),
        rtol=2e-2, atol=1e-5,
    )
    # optimizer state parity too (deep table moments)
    np.testing.assert_allclose(
        np.asarray(s_pal.opt_d["deep/table"]["m"]),
        np.asarray(s_gen.opt_d["deep/table"]["m"]),
        rtol=2e-2, atol=1e-5,
    )


@pytest.mark.parametrize("row_layout,bucket", [
    (False, None), (True, None), (True, 2048),
])
def test_pallas_layouts_match_generic(row_layout, bucket):
    """Both streamed formulations (feature-major and row-major
    512B-crossing) and the static unique bucket must match the generic
    step exactly.  The feature-major formulation (row_layout=False)
    needs the legacy storage layout — the default is row_packed."""
    import dataclasses

    import jax.numpy as jnp

    cfg = (
        dataclasses.replace(CFG, table_layout="feature_major")
        if not row_layout
        else CFG
    )
    model = WideDeepModel(cfg)
    opt_w = optim.ftrl(loss_scale=CFG.loss_scale)
    opt_d = optim.lazy_adam(loss_scale=CFG.loss_scale)
    key = jax.random.PRNGKey(1)
    s_gen = init_train_state(model, key, opt_w, opt_d)
    s_pal = init_train_state(model, key, opt_w, opt_d)
    step_gen = make_train_step(model, opt_w, opt_d, jit=True, donate=False,
                               use_pallas=False)
    step_pal = make_train_step(
        model, opt_w, opt_d, jit=True, donate=False, use_pallas=True,
        matmul_dtype=jnp.float32, row_layout=row_layout,
        unique_bucket=bucket,
    )
    for i in range(2):
        b = _batch(seed=10 + i)
        s_gen, (lw_g, ld_g) = step_gen(s_gen, b)
        s_pal, (lw_p, ld_p) = step_pal(s_pal, b)
        np.testing.assert_allclose(float(ld_g), float(ld_p), rtol=1e-5)
        np.testing.assert_allclose(float(lw_g), float(lw_p), rtol=1e-5)
    for tbl in ("deep", "wide"):
        np.testing.assert_allclose(
            np.asarray(s_pal.params[tbl]["table"]),
            np.asarray(s_gen.params[tbl]["table"]),
            rtol=2e-2, atol=1e-5, err_msg=f"{tbl} table diverged",
        )
    np.testing.assert_allclose(
        np.asarray(s_pal.opt_d["deep/table"]["m"]),
        np.asarray(s_gen.opt_d["deep/table"]["m"]),
        rtol=2e-2, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s_pal.opt_w["wide/table"]["accum"]),
        np.asarray(s_gen.opt_w["wide/table"]["accum"]),
        rtol=2e-2, atol=1e-5,
    )


def test_pallas_step_with_pipeline_prep_matches_generic():
    """The input pipeline's hot config — native minimal prep (no
    sorted_ids/inv) with the unique buffer TRIMMED to the bucket — must
    drive the row-layout pallas step to the exact generic result, and a
    mid-run bucket growth (longer uq_ids => shape-driven re-trace) must
    not disturb parity."""
    import jax.numpy as jnp

    from mindrec_tpu.data.pipeline import AdaptiveBucket, SparseInputPipeline

    model = WideDeepModel(CFG)
    opt_w = optim.ftrl(loss_scale=CFG.loss_scale)
    opt_d = optim.lazy_adam(loss_scale=CFG.loss_scale)
    key = jax.random.PRNGKey(2)
    s_gen = init_train_state(model, key, opt_w, opt_d)
    s_pal = init_train_state(model, key, opt_w, opt_d)
    step_gen = make_train_step(model, opt_w, opt_d, jit=True, donate=False,
                               use_pallas=False)
    # unique_bucket=None: the trimmed uq_ids length drives the bucket
    step_pal = make_train_step(
        model, opt_w, opt_d, jit=True, donate=False, use_pallas=True,
        matmul_dtype=jnp.float32, row_layout=True,
    )
    raw = [_batch(seed=20 + i) for i in range(3)]
    pol = AdaptiveBucket(16, quantum=16, log=lambda *a, **k: None)
    pipe = SparseInputPipeline(iter(raw), field_size=CFG.field_size,
                               policy=pol, workers=1, device=False)
    prepped = list(pipe)
    assert pol.bucket > 16  # grew: batches have ~110 distinct ids
    assert any(p["uq_ids"].shape[0] != prepped[0]["uq_ids"].shape[0]
               or i == 0 for i, p in enumerate(prepped))
    for b_raw, b_pal in zip(raw, prepped):
        assert "sorted_ids" not in b_pal and "inv" not in b_pal
        s_gen, (lw_g, ld_g) = step_gen(s_gen, b_raw)
        s_pal, (lw_p, ld_p) = step_pal(s_pal, b_pal)
        np.testing.assert_allclose(float(ld_g), float(ld_p), rtol=1e-5)
    for tbl in ("deep", "wide"):
        np.testing.assert_allclose(
            np.asarray(s_pal.params[tbl]["table"]),
            np.asarray(s_gen.params[tbl]["table"]),
            rtol=2e-2, atol=1e-5, err_msg=f"{tbl} table diverged",
        )


def test_row_packed_matches_feature_major_layout():
    """The two storage layouts of the same spec must train to the same
    logical tables: layout is an implementation detail, not semantics."""
    import dataclasses

    import jax.numpy as jnp

    from mindrec_tpu.ops.embedding import from_storage

    models = {}
    states = {}
    steps = {}
    for layout in ("row_packed", "feature_major"):
        cfg = dataclasses.replace(CFG, table_layout=layout)
        m = WideDeepModel(cfg)
        opt_w = optim.ftrl(loss_scale=CFG.loss_scale)
        opt_d = optim.lazy_adam(loss_scale=CFG.loss_scale)
        models[layout] = m
        states[layout] = init_train_state(m, jax.random.PRNGKey(7), opt_w, opt_d)
        steps[layout] = make_train_step(
            m, opt_w, opt_d, jit=True, donate=False, use_pallas=True,
            matmul_dtype=jnp.float32,
        )
    # identical logical init by construction (init draws in logical shape)
    for i in range(3):
        b = _batch(seed=40 + i)
        for layout in models:
            states[layout], (lw, ld) = steps[layout](states[layout], b)
    for tbl in ("wide", "deep"):
        lp = from_storage(
            models["row_packed"].table_specs[tbl][1],
            states["row_packed"].params[tbl]["table"],
        )
        lf = from_storage(
            models["feature_major"].table_specs[tbl][1],
            states["feature_major"].params[tbl]["table"],
        )
        np.testing.assert_allclose(
            lp, lf, rtol=2e-2, atol=1e-5, err_msg=f"{tbl} layouts diverged"
        )
