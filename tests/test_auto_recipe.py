"""RecModel input_recipe='auto' + the fused superbatch driver.

The auto recipe is link-measured (no-op on the CPU test backend), so
these tests pin (a) that 'auto' is harmless where the link is not the
bottleneck, and (b) that the FUSED slice/decode/step driver — the path
the recipe selects on high-fixed-cost links — trains bit-compatibly
with the plain per-batch pipeline, including a padded tail supergroup
(no mid-stream retrace: __sb_n__ rides every group).
"""

import numpy as np

from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
from mindrec_tpu.train import optim
from mindrec_tpu.train.rec_model import RecModel

CFG = WideDeepConfig(
    batch_size=32, field_size=4, vocab_size=900, emb_dim=8,
    deep_layer_dim=(16,), use_mixed_precision=False, sparse=True,
    loss_scale=1024.0,
)


def _batches(n, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {
            "ids": rng.integers(0, CFG.vocab_size, (32, 4)).astype(np.int32),
            "wts": np.ones((32, 4), np.float32),
            "label": (rng.uniform(size=(32, 1)) > 0.5).astype(np.float32),
        }
        for _ in range(n)
    ]


def _rm(**kw):
    return RecModel(
        WideDeepModel(CFG),
        opt_w=optim.ftrl(loss_scale=CFG.loss_scale),
        opt_d=optim.lazy_adam(loss_scale=CFG.loss_scale),
        seed=3,
        unique_bucket=2048,
        **kw,
    )


def test_auto_recipe_noop_on_cpu():
    rm = _rm(input_recipe="auto")
    batches = _batches(5)
    rm.train(1, batches, dataset_sink_mode=True)
    assert rm._fused is None  # cpu backend: recipe resolution no-ops
    assert int(rm.state.step) == 5


def test_fused_superbatch_driver_matches_plain(tmp_path):
    """Force the fused driver (superbatch 3, wire encode, device prep,
    padded tail) and compare the trained tables against the plain
    per-batch device-prep path over the same 7 batches (7 = 2 full
    groups + a padded tail of 1)."""
    from mindrec_tpu.data.wire import BatchWire

    batches = _batches(7, seed=9)

    plain = _rm(
        prep_placement="device",
        wire=BatchWire.for_sparse(CFG.vocab_size, 32, 4, host_prep=False),
    )
    plain.train(1, list(batches), dataset_sink_mode=True)

    fused = _rm(
        prep_placement="device",
        wire=BatchWire.for_sparse(CFG.vocab_size, 32, 4, host_prep=False),
    )
    fused._superbatch = 3
    fused._build_fused(fused.bucket_policy.bucket)
    fused.train(1, list(batches), dataset_sink_mode=True)

    assert int(plain.state.step) == 7
    assert int(fused.state.step) == 7
    for tbl in ("wide", "deep"):
        np.testing.assert_allclose(
            np.asarray(fused.state.params[tbl]["table"]),
            np.asarray(plain.state.params[tbl]["table"]),
            rtol=1e-5, atol=1e-6, err_msg=f"{tbl} diverged",
        )
