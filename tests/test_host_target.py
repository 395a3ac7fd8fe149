"""Host-resident table regime (reference CPU-target EmbeddingLookup +
optimizer.target="CPU", wide_and_deep.py:217,431-433): training with the
tables living in host tiers must match the ordinary device sparse step
row for row."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
from mindrec_tpu.ops.embedding import from_storage
from mindrec_tpu.train import optim
from mindrec_tpu.train.host_target import HostTargetAdapter, init_dense_state
from mindrec_tpu.train.step import init_train_state, make_train_step

CFG = WideDeepConfig(
    batch_size=16,
    field_size=4,
    vocab_size=500,
    emb_dim=8,
    deep_layer_dim=(16, 8),
    use_mixed_precision=False,
    sparse=True,
    parameter_server=True,  # the reference condition for the host regime
    loss_scale=1.0,
)


def _batch(seed):
    rng = np.random.default_rng(seed)
    return {
        "ids": rng.integers(0, CFG.vocab_size, (CFG.batch_size, CFG.field_size)).astype(np.int32),
        "wts": np.ones((CFG.batch_size, CFG.field_size), np.float32),
        "label": rng.integers(0, 2, (CFG.batch_size, 1)).astype(np.float32),
    }


def test_spec_declares_host_target():
    model = WideDeepModel(CFG)
    assert model.deep_spec.target == "host"
    assert model.wide_spec.target == "host"
    dev = WideDeepModel(dataclasses.replace(CFG, parameter_server=False))
    assert dev.deep_spec.target == "device"


def test_host_target_matches_device_sparse_step(tmp_path):
    opts = lambda: (optim.ftrl(loss_scale=1.0), optim.lazy_adam(loss_scale=1.0))
    batches = [_batch(s) for s in range(4)]
    touched = np.unique(np.concatenate([b["ids"].reshape(-1) for b in batches]))

    # device reference: the ordinary sparse step
    model = WideDeepModel(CFG)
    ow, od = opts()
    ref_state = init_train_state(model, jax.random.PRNGKey(0), ow, od)
    step = make_train_step(model, ow, od, jit=True, donate=False,
                           use_pallas=False)
    init_logical = {}
    for name, (path, spec) in model.table_specs.items():
        node = ref_state.params
        for p in path:
            node = node[p]
        init_logical[name] = from_storage(spec, np.asarray(node))
    for b in batches:
        ref_state, (lw_r, ld_r) = step(ref_state, b)

    # host-target run: same dense init (same PRNGKey), tiers pre-seeded
    # with the SAME initial table rows
    ow2, od2 = opts()
    adapter = HostTargetAdapter(
        model, vocab_size=CFG.vocab_size, unique_bucket=128,
        opt_w=ow2, opt_d=od2, spill_dir=str(tmp_path),
        matmul_dtype=jnp.float32,
    )
    all_ids = np.arange(CFG.vocab_size)
    for name in adapter.tables:
        adapter.tiers[name]["param"].write(
            all_ids, init_logical[name][: CFG.vocab_size]
        )
    state = init_dense_state(model, jax.random.PRNGKey(0), ow2, od2)
    assert "table" not in state.params["deep"], "tables must be host-resident"
    for b in batches:
        state, (lw_h, ld_h) = adapter.train_step(state, b)

    np.testing.assert_allclose(float(lw_h), float(lw_r), rtol=1e-4)
    np.testing.assert_allclose(float(ld_h), float(ld_r), rtol=1e-4)
    # table rows: host tiers vs the device-trained storage
    for name, (path, spec) in model.table_specs.items():
        node = ref_state.params
        for p in path:
            node = node[p]
        want = from_storage(spec, np.asarray(node))[touched]
        got = adapter.read_rows(name, touched)
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-5,
            err_msg=f"host-target table {name} diverged from device training",
        )
    # dense params too
    np.testing.assert_allclose(
        np.asarray(state.params["deep"]["mlp"][0]["w"]),
        np.asarray(ref_state.params["deep"]["mlp"][0]["w"]),
        rtol=1e-4, atol=1e-5,
    )
