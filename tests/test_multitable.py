"""Multitable Wide&Deep (Outbrain): forward shapes, pooling semantics,
training, grouped MAP metric integration."""

import jax
import jax.numpy as jnp
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


def _flatten(params):
    from mindrec_tpu.train.step import flatten_params

    return flatten_params(params)[0]


def test_sparse_step_matches_dense_step():
    """Row-sparse multi-group training == the dense-grad step on every
    TOUCHED row (bit-parity standard), with the documented lazy-vs-dense
    FTRL difference on untouched rows: dense FTRL recomputes w from
    (accum, linear) and so zeroes never-touched rows, while the lazy
    sparse path leaves them at init — the reference's own
    dense-optimizer vs IndexedSlices split behaves identically."""
    import dataclasses

    from mindrec_tpu.ops.embedding import from_storage

    cfg_d = dataclasses.replace(CFG, sparse=False)
    cfg_s = dataclasses.replace(CFG, sparse=True)
    opts = lambda: (
        optim.ftrl(learning_rate=5e-2, l1=5e-4, l2=5e-4, initial_accum=0.1, loss_scale=1.0),
        optim.adam(learning_rate=1e-3, eps=1e-6, loss_scale=1.0),
    )
    batches = [_batch(CFG, seed=s) for s in (5, 6)]

    # per-group touched logical ids
    group_ids = {
        "indicator": np.unique([b["indicator_id"] for b in batches]),
        "emb128": np.unique([b["emb_128_id"] for b in batches]),
        "emb64_single": np.unique([b["emb_64_single_id"] for b in batches]),
        "multi": np.unique(
            np.concatenate(
                [b[f"multi_{n}_id"].reshape(-1) for b in batches for n in MULTI_FIELDS]
            )
        ),
    }
    table_group = {
        "emb64_indicator": "indicator", "w_indicator": "indicator",
        "emb128": "emb128", "w128": "emb128",
        "emb64_single": "emb64_single", "w64_single": "emb64_single",
        "emb64_multi": "multi", "w64_multi": "multi",
    }

    results = {}
    for tag, cfg in (("dense", cfg_d), ("sparse", cfg_s)):
        model = MultiTableWideDeepModel(cfg)
        ow, od = opts()
        state = init_train_state(model, jax.random.PRNGKey(0), ow, od)
        # zero-init the wide (FTRL) tables: zero is FTRL's fixed point,
        # so dense recompute-from-state and lazy no-touch agree on
        # never-touched rows and full loss/param parity holds
        wide = {
            k: (jnp.zeros_like(v) if hasattr(v, "dtype") and v.ndim == 2 else v)
            for k, v in state.params["wide"].items()
        }
        state = state._replace(params={**state.params, "wide": wide})
        step = make_train_step(model, ow, od, jit=True, donate=False,
                               use_pallas=False)
        lw = ld = None
        for b in batches:
            state, (lw, ld) = step(state, b)
        logical = {}
        for name, (path, spec) in model.table_specs.items():
            node = state.params
            for p in path:
                node = node[p]
            logical[name] = from_storage(spec, np.asarray(node))[: spec.vocab_size]
        results[tag] = (float(lw), float(ld), logical,
                        {k: np.asarray(v) for k, v in _flatten(state.params)
                         if "mlp" in k or "bias" in k or "continue" in k})

    # identical semantics, different graphs: XLA reassociates f32 sums
    # differently between the two formulations (~1e-6), and Adam's
    # 1/(sqrt(v)+eps) rescaling amplifies that for near-zero grads —
    # tolerances sized for that noise floor, NOT for semantic drift
    np.testing.assert_allclose(results["sparse"][0], results["dense"][0], rtol=1e-4)
    np.testing.assert_allclose(results["sparse"][1], results["dense"][1], rtol=1e-4)
    for name in results["dense"][2]:
        ids = group_ids[table_group[name]]
        np.testing.assert_allclose(
            results["sparse"][2][name], results["dense"][2][name],
            rtol=1e-3, atol=1e-4, err_msg=f"table {name} diverged",
        )
        assert np.abs(results["dense"][2][name][ids]).sum() > 0  # really trained
    for key in results["dense"][3]:
        np.testing.assert_allclose(
            results["sparse"][3][key], results["dense"][3][key],
            rtol=1e-3, atol=1e-4, err_msg=f"dense param {key} diverged",
        )


def test_sparse_sharded_emb128_trains(mesh8):
    """Hybrid: the 650k-row table row-sliced over the model axis while
    the other 7 tables replicate — post-step parity with unsharded."""
    import dataclasses

    from mindrec_tpu.parallel.mesh import shard_batch, shard_train_state

    cfg = dataclasses.replace(
        CFG, sparse=True, emb128_slice_mode="table_row_slice"
    )
    opts = (
        optim.ftrl(learning_rate=5e-2, l1=5e-4, l2=5e-4, initial_accum=0.1, loss_scale=1.0),
        optim.adam(learning_rate=1e-3, eps=1e-6, loss_scale=1.0),
    )
    model = MultiTableWideDeepModel(cfg, mesh=mesh8)
    state = init_train_state(model, jax.random.PRNGKey(0), *opts)
    step = make_train_step(model, *opts, jit=True, donate=False,
                           use_pallas=False)
    b = _batch(CFG, seed=7)

    ref_state, _ = step(state, b)

    with mesh8:
        state_m = shard_train_state(state, model, mesh8)
        b_m = shard_batch(b, mesh8)
        state2, (lw, ld) = step(state_m, b_m)
    assert np.isfinite(float(lw)) and np.isfinite(float(ld))
    sh = state2.params["deep"]["emb128"].sharding
    assert "model" in str(sh.spec)
    np.testing.assert_allclose(
        np.asarray(state2.params["deep"]["emb128"]),
        np.asarray(ref_state.params["deep"]["emb128"]),
        rtol=1e-5, atol=1e-6,
    )


def test_pallas_multigroup_matches_generic():
    """The row-layout streamed (pallas) path now handles MULTI-GROUP
    models: each id group gets its own sorted stream / unique buffer /
    segment-sum, and every table updates from its group's stream.
    Parity vs the generic gather/scatter sparse path (VERDICT r2 item
    3; reference flagship config wide_and_deep_multitable/src/
    wide_and_deep.py:271-349)."""
    import dataclasses

    import jax.numpy as jnp

    from mindrec_tpu.ops.pallas import stream_update

    cfg = dataclasses.replace(CFG, sparse=True)
    stream_update.INTERPRET = True
    try:
        opts = lambda: (
            optim.ftrl(learning_rate=5e-2, l1=5e-4, l2=5e-4,
                       initial_accum=0.1, loss_scale=1.0),
            optim.adam(learning_rate=1e-3, eps=1e-6, loss_scale=1.0),
        )
        model = MultiTableWideDeepModel(cfg)
        ow, od = opts()
        s_gen = init_train_state(model, jax.random.PRNGKey(0), ow, od)
        s_pal = init_train_state(model, jax.random.PRNGKey(0), ow, od)
        step_gen = make_train_step(model, ow, od, jit=True, donate=False,
                                   use_pallas=False)
        step_pal = make_train_step(
            model, ow, od, jit=True, donate=False, use_pallas=True,
            row_layout=True, matmul_dtype=jnp.float32,
        )
        for s in (7, 8):
            b = _batch(CFG, seed=s)
            s_gen, (lw_g, ld_g) = step_gen(s_gen, b)
            s_pal, (lw_p, ld_p) = step_pal(s_pal, b)
            np.testing.assert_allclose(float(ld_g), float(ld_p), rtol=1e-5)
            np.testing.assert_allclose(float(lw_g), float(lw_p), rtol=1e-5)
        for side, name in (("deep", "emb128"), ("deep", "emb64_single"),
                           ("deep", "emb64_multi"), ("deep", "emb64_indicator"),
                           ("wide", "emb128_w"), ("wide", "emb64_multi_w"),
                           ("wide", "indicator_w")):
            np.testing.assert_allclose(
                np.asarray(s_pal.params[side][name]),
                np.asarray(s_gen.params[side][name]),
                rtol=2e-2, atol=1e-6, err_msg=f"{side}/{name} diverged",
            )
        np.testing.assert_allclose(
            np.asarray(s_pal.opt_d["deep/emb64_multi"]["m"]),
            np.asarray(s_gen.opt_d["deep/emb64_multi"]["m"]),
            rtol=2e-2, atol=1e-6,
        )
    finally:
        stream_update.INTERPRET = False


def test_pallas_multigroup_host_prep_matches_device_meta():
    """make_batch_sort(groups=model.table_groups) emits per-group
    prefixed sort metadata; the streamed step consumes it and matches
    the same step deriving the metadata on device."""
    import dataclasses

    import jax.numpy as jnp

    from mindrec_tpu.ops.pallas import stream_update
    from mindrec_tpu.train.step import make_batch_sort

    cfg = dataclasses.replace(CFG, sparse=True)
    stream_update.INTERPRET = True
    try:
        ow = optim.ftrl(learning_rate=5e-2, l1=5e-4, l2=5e-4,
                        initial_accum=0.1, loss_scale=1.0)
        od = optim.adam(learning_rate=1e-3, eps=1e-6, loss_scale=1.0)
        model = MultiTableWideDeepModel(cfg)
        s_dev = init_train_state(model, jax.random.PRNGKey(1), ow, od)
        s_hst = init_train_state(model, jax.random.PRNGKey(1), ow, od)
        step = make_train_step(model, ow, od, jit=True, donate=False,
                               use_pallas=True, row_layout=True,
                               matmul_dtype=jnp.float32)
        prep = make_batch_sort(0, groups=model.table_groups)
        b = _batch(CFG, seed=11)
        bp = prep(dict(b))
        assert "multi:perm" in bp and "emb128:uq_ids" in bp
        s_dev, (_, ld_d) = step(s_dev, b)
        s_hst, (_, ld_h) = step(s_hst, bp)
        np.testing.assert_allclose(float(ld_d), float(ld_h), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(s_hst.params["deep"]["emb64_multi"]),
            np.asarray(s_dev.params["deep"]["emb64_multi"]),
            rtol=1e-5, atol=1e-7,
        )
    finally:
        stream_update.INTERPRET = False


def test_pallas_compacted_backward_matches_device_meta():
    """Masked-position compaction (kept_budget): the multi group's
    sorted backward stream contains only mask==1 positions (+ sentinel
    pads).  Masked positions carry identically-zero gradients (both
    towers multiply by the mask), so results match the uncompacted
    path EXACTLY — except the documented semantic that masked-only ids
    are NOT "touched" (no zero-grad lazy-optimizer visit).  The batch
    uses the realistic padding convention (masked slots hold id 0), so
    parity is exact on every row except the padding row."""
    import dataclasses

    import jax.numpy as jnp

    from mindrec_tpu.ops.pallas import stream_update
    from mindrec_tpu.train.step import make_batch_sort, prep_groups

    # multi vocab above the tiny-vocab bound so the group uses the
    # sorted stream (compaction targets the sorted backward)
    cfg = dataclasses.replace(CFG, sparse=True, emb64_multi_size=5000)
    stream_update.INTERPRET = True
    try:
        ow = optim.ftrl(learning_rate=5e-2, l1=5e-4, l2=5e-4,
                        initial_accum=0.1, loss_scale=1.0)
        od = optim.adam(learning_rate=1e-3, eps=1e-6, loss_scale=1.0)
        model = MultiTableWideDeepModel(cfg)
        s_dev = init_train_state(model, jax.random.PRNGKey(3), ow, od)
        s_cmp = init_train_state(model, jax.random.PRNGKey(3), ow, od)
        step = make_train_step(model, ow, od, jit=True, donate=False,
                               use_pallas=True, row_layout=True,
                               matmul_dtype=jnp.float32)
        groups = prep_groups(model)
        assert "multi" in groups
        prep = make_batch_sort(0, groups=groups, minimal=True,
                               kept_budget={"multi": 256})
        for s in (13, 14):
            b = _batch(cfg, seed=s)
            for n in MULTI_FIELDS:  # padding convention: masked -> id 0
                ids = b[f"multi_{n}_id"]
                ids[b[f"multi_{n}_mask"] == 0] = 0
            bp = prep(dict(b))
            n_multi = sum(b[f"multi_{n}_id"].size for n in MULTI_FIELDS)
            kept = int(sum(b[f"multi_{n}_mask"].sum() for n in MULTI_FIELDS))
            assert bp["multi:perm"].shape[0] == 256 < n_multi + 256
            assert kept < 256
            s_dev, (_, ld_d) = step(s_dev, b)       # device-derived meta
            s_cmp, (_, ld_c) = step(s_cmp, bp)      # compacted host meta
            np.testing.assert_allclose(float(ld_d), float(ld_c), rtol=1e-6)
        from mindrec_tpu.ops.embedding import from_storage

        for side, name, spec in (
            ("deep", "emb64_multi", model.emb64_multi.spec),
            ("wide", "emb64_multi_w", model.w64_multi.spec),
        ):
            got = from_storage(spec, s_cmp.params[side][name])
            want = from_storage(spec, s_dev.params[side][name])
            np.testing.assert_allclose(
                got[1:], want[1:],  # row 0 = padding id: touched only
                rtol=1e-5, atol=1e-7,  # by the uncompacted path
                err_msg=f"{side}/{name} diverged",
            )
        np.testing.assert_allclose(
            np.asarray(s_cmp.params["deep"]["emb128"]),
            np.asarray(s_dev.params["deep"]["emb128"]),
            rtol=1e-5, atol=1e-7,
        )
    finally:
        stream_update.INTERPRET = False
