"""Compact wire format + device-prep pipeline mode (``data/wire.py``).

The wire shrinks host->device bytes for transfer-bound links; decoded
batches must be bit-identical in layout to the un-packed path so the
step trace is shared.  Reference analog: the dataset-sink device queue
(``mindspore_rec/train/rec_model.py:124-131``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mindrec_tpu.data.criteo import SyntheticCriteo
from mindrec_tpu.data.pipeline import AdaptiveBucket, SparseInputPipeline
from mindrec_tpu.data.wire import (
    SENTINEL,
    BatchWire,
    _int_nbytes,
    choose_prep,
)
from mindrec_tpu.train.step import make_batch_sort


def test_int_nbytes_ladder():
    assert _int_nbytes(255) == 1
    assert _int_nbytes(256) == 2
    assert _int_nbytes(65535) == 2
    assert _int_nbytes(65536) == 3
    assert _int_nbytes((1 << 24) - 1) == 3
    assert _int_nbytes(1 << 24) == 4


@pytest.mark.parametrize("arena", [True, False])
@pytest.mark.parametrize("bound", [200, 60_000, 5_860_000, 1 << 25])
def test_int_roundtrip_exact(bound, arena):
    rng = np.random.default_rng(0)
    v = rng.integers(0, bound, size=(32, 7)).astype(np.int32)
    w = BatchWire({"ids": bound}, arena=arena)
    dec = w.decoder(jit=False)
    out = dec(w.encode({"ids": v}))
    np.testing.assert_array_equal(np.asarray(out["ids"]), v)
    assert np.asarray(out["ids"]).dtype == np.int32


def test_sentinel_roundtrip():
    bound = 5_860_000  # 3-byte lane; sentinel travels as code `bound`
    v = np.array([0, 17, bound - 1, SENTINEL, 3, SENTINEL], np.int32)
    w = BatchWire({"uq_ids": bound}, sentinel_keys=("uq_ids",))
    out = w.decoder(jit=False)(w.encode({"uq_ids": v}))
    np.testing.assert_array_equal(np.asarray(out["uq_ids"]), v)


def test_float_and_bit_codecs():
    w = BatchWire({}, lossy=("wts",), bit=("label",), arena=False)
    wts = np.random.default_rng(1).random((16, 4)).astype(np.float32)
    label = np.random.default_rng(2).integers(0, 2, (16, 1)).astype(np.float32)
    enc = w.encode({"wts": wts, "label": label, "extra": wts})
    assert enc["label"].dtype == np.uint8
    assert enc["wts"].itemsize == 2
    assert enc["extra"] is wts  # passthrough untouched
    out = w.decoder(jit=False)(enc)
    np.testing.assert_array_equal(np.asarray(out["label"]), label)
    np.testing.assert_allclose(np.asarray(out["wts"]), wts, rtol=8e-3)
    assert np.asarray(out["wts"]).dtype == np.float32


def test_arena_single_buffer_roundtrip():
    """Arena mode: planned keys fuse into ONE u8 buffer (one device_put
    per batch — per-put fixed cost is ~10-20 ms through the tunnel,
    benchmarks/transfer_probe.py); raw f32 keys ride bit-exactly;
    unplanned keys pass through."""
    from mindrec_tpu.data.wire import ARENA_KEY

    rng = np.random.default_rng(4)
    b = {
        "ids": rng.integers(0, 5_860_000, (16, 5)).astype(np.int32),
        "wts": rng.standard_normal((16, 5)).astype(np.float32),
        "label": rng.integers(0, 2, (16, 1)).astype(np.float32),
        "aux": np.arange(3),
    }
    w = BatchWire({"ids": 5_860_000}, lossy=(), raw=("wts",),
                  bit=("label",))
    enc = w.encode(b)
    assert set(enc) == {ARENA_KEY, "aux"}
    assert enc[ARENA_KEY].dtype == np.uint8 and enc[ARENA_KEY].ndim == 1
    assert enc[ARENA_KEY].nbytes == 16 * 5 * 3 + 16 * 5 * 4 + 16
    out = w.decoder(jit=False)(enc)
    np.testing.assert_array_equal(np.asarray(out["ids"]), b["ids"])
    np.testing.assert_array_equal(np.asarray(out["wts"]), b["wts"])
    np.testing.assert_array_equal(np.asarray(out["label"]), b["label"])
    np.testing.assert_array_equal(np.asarray(out["aux"]), b["aux"])
    # layout drift is an error, not silent corruption
    bad = dict(b)
    bad["ids"] = b["ids"][:8]
    with pytest.raises(ValueError, match="layout"):
        w.encode(bad)


def test_field_wire_roundtrip_and_size():
    """Schema-aware plan: per-field id widths, value-only weights.
    Ids round-trip exactly; constant (categorical) weight columns decode
    to 1.0; the payload is materially below the flat int24 plan."""
    from mindrec_tpu.data.criteo import criteo_field_sizes

    bs, F, vocab = 256, 39, 5_860_000
    sizes = criteo_field_sizes(vocab, F)
    data = SyntheticCriteo(bs, F, vocab, steps=1, seed=11, fields="criteo")
    b = data.get_batch(0)
    dense = tuple(range(13))
    b["wts"][:, list(dense)] = np.random.default_rng(3).random(
        (bs, 13)
    ).astype(np.float32)
    w = BatchWire.for_fields(sizes, bs, wt_value_fields=dense,
                             lossy_wts=False)
    enc = w.encode(b)
    out = w.decoder(jit=False)(enc)
    np.testing.assert_array_equal(np.asarray(out["ids"]), b["ids"])
    np.testing.assert_array_equal(np.asarray(out["wts"]), b["wts"])
    np.testing.assert_array_equal(np.asarray(out["label"]), b["label"])
    flat = BatchWire.for_sparse(vocab, bs, F)
    assert w.wire_bytes(b) < 0.75 * flat.wire_bytes(b)
    # out-of-field-range ids are a loud error, not silent wrap
    bad = dict(b)
    bad["ids"] = b["ids"].copy()
    bad["ids"][0, 0] = np.int32(vocab - 1)  # field 0 is a 64-slot range
    w2 = BatchWire.for_fields(sizes, bs, wt_value_fields=dense)
    with pytest.raises(ValueError, match="field range"):
        w2.encode(bad)


def test_field_wire_lossy_wts_roundtrip():
    sizes = [64, 1000, 70_000]
    rng = np.random.default_rng(5)
    offs = np.array([0, 64, 1064])
    ids = (
        rng.integers(0, [64, 1000, 70_000], size=(32, 3)) + offs[None, :]
    ).astype(np.int32)
    wts = np.ones((32, 3), np.float32)
    wts[:, 0] = rng.random(32, dtype=np.float32)
    b = {"ids": ids, "wts": wts,
         "label": rng.integers(0, 2, (32, 1)).astype(np.float32)}
    w = BatchWire.for_fields(sizes, 32, wt_value_fields=(0,))
    out = w.decoder(jit=False)(w.encode(b))
    np.testing.assert_array_equal(np.asarray(out["ids"]), ids)
    np.testing.assert_allclose(np.asarray(out["wts"])[:, 0], wts[:, 0],
                               rtol=8e-3)
    np.testing.assert_array_equal(np.asarray(out["wts"])[:, 1:], wts[:, 1:])


def test_wire_bytes_matches_encoded_size():
    data = SyntheticCriteo(64, 8, 70_000, steps=1, seed=0)
    b = data.get_batch(0)
    w = BatchWire.for_sparse(70_000, 64, 8)
    enc = w.encode(b)
    assert w.wire_bytes(b) == sum(np.asarray(v).nbytes for v in enc.values())
    # the packed payload is materially smaller: ids 4->3, wts 4->2,
    # label 4->1 bytes
    raw = sum(np.asarray(v).nbytes for v in b.values())
    assert w.wire_bytes(b) < 0.7 * raw


def test_prep_metadata_roundtrip_exact():
    """Host-prep metadata (perm/uidx/uidx_sorted/uq_ids incl. the
    sentinel padding) survives the wire bit-exactly."""
    data = SyntheticCriteo(64, 8, 70_000, steps=1, seed=3)
    raw = data.get_batch(0)
    prep = make_batch_sort(8, minimal=True)
    b = prep(dict(raw))
    w = BatchWire.for_sparse(70_000, 64, 8, host_prep=True, lossy_wts=False)
    out = w.decoder(jit=False)(w.encode(b))
    for k in ("ids", "perm", "uidx", "uidx_sorted", "uq_ids", "label"):
        np.testing.assert_array_equal(
            np.asarray(out[k]), b[k], err_msg=k
        )
    np.testing.assert_array_equal(np.asarray(out["wts"]), b["wts"])


def _loss_stream(pipe, model_cfg, steps):
    from mindrec_tpu.models.wide_deep import WideDeepModel
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.step import init_train_state, make_train_step

    model = WideDeepModel(model_cfg)
    opt_w = optim.ftrl(loss_scale=model_cfg.loss_scale)
    opt_d = optim.lazy_adam(loss_scale=model_cfg.loss_scale)
    state = init_train_state(model, jax.random.PRNGKey(0), opt_w, opt_d)
    step = make_train_step(model, opt_w, opt_d, jit=True, donate=False)
    out = []
    it = iter(pipe)
    for _ in range(steps):
        state, (lw, ld) = step(state, next(it))
        out.append(float(ld))
    return out


def test_device_prep_pipeline_matches_host_prep():
    """Same model, same batches: host-prep pipeline vs device-prep +
    lossless wire produce identical losses (the generic CPU step derives
    metadata itself, so this pins the wire's transparency end-to-end)."""
    from mindrec_tpu.models.wide_deep import WideDeepConfig

    vocab, bs, F, steps = 70_000, 64, 8, 4
    cfg = WideDeepConfig(
        batch_size=bs, field_size=F, vocab_size=vocab, emb_dim=8,
        deep_layer_dim=(32, 16), sparse=True, loss_scale=128.0,
    )

    def src():
        data = SyntheticCriteo(bs, F, vocab, steps=steps, seed=5)
        return (data.get_batch(s) for s in range(steps))

    policy = lambda: AdaptiveBucket(bs * F, log=lambda *a, **k: None)
    host = SparseInputPipeline(
        src(), field_size=F, policy=policy(), device=False,
    )
    wire = BatchWire.for_sparse(vocab, bs, F, lossy_wts=False)
    dev = SparseInputPipeline(
        src(), field_size=F, policy=policy(), device=False,
        wire=wire, host_prep=False,
    )
    a = _loss_stream(host, cfg, steps)
    b = _loss_stream(dev, cfg, steps)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_device_prep_audit_grows_bucket():
    """The device-prep host audit catches a bucket overflow (which the
    device path would silently truncate) and grows the policy."""
    bs, F, vocab = 64, 8, 4096
    rng = np.random.default_rng(7)
    batches = [{
        "ids": rng.permutation(vocab)[: bs * F].reshape(bs, F).astype(np.int32),
        "wts": np.ones((bs, F), np.float32),
        "label": np.zeros((bs, 1), np.float32),
    } for _ in range(3)]
    policy = AdaptiveBucket(64, quantum=64, log=lambda *a, **k: None)
    assert policy.bucket < bs * F
    grown = []
    pipe = SparseInputPipeline(
        iter(batches), field_size=F, policy=policy, device=False,
        host_prep=False, audit_every=1, on_grow=grown.append,
    )
    out = list(pipe)
    assert len(out) == 3
    assert grown and policy.bucket >= bs * F


def test_recmodel_device_prep_placement():
    """RecModel(prep_placement='device', wire=...): trains end-to-end
    over raw batches (audit + wire decode + explicit-bucket step) with
    the same losses as host placement, and a mid-run overflow grows the
    bucket + rebuilds the step without crashing."""
    from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
    from mindrec_tpu.train.callbacks import Callback
    from mindrec_tpu.train.rec_model import RecModel

    class Losses(Callback):
        def __init__(self):
            self.vals = []

        def on_train_step_end(self, ctx):
            self.vals.append(float(ctx.net_outputs[1]))

    vocab, bs, F = 50_000, 32, 4
    cfg = WideDeepConfig(
        batch_size=bs, field_size=F, vocab_size=vocab, emb_dim=8,
        deep_layer_dim=(16, 8), sparse=True,
    )
    rng = np.random.default_rng(1)

    def batch(v):
        return {
            "ids": rng.integers(0, v, size=(bs, F)).astype(np.int32),
            "wts": np.ones((bs, F), np.float32),
            "label": rng.integers(0, 2, size=(bs, 1)).astype(np.float32),
        }

    data = [batch(40) for _ in range(3)] + [batch(vocab) for _ in range(3)]
    wire = BatchWire.for_sparse(vocab, bs, F, lossy_wts=False)

    def run(**kw):
        pol = AdaptiveBucket(48, quantum=16, log=lambda *a, **k: None)
        m = RecModel(WideDeepModel(cfg), unique_bucket=pol, seed=0,
                     audit_every=1, **kw)
        cb = Losses()
        state = m.train(epoch=1, train_dataset=[dict(b) for b in data],
                        dataset_sink_mode=True, callbacks=[cb])
        return state, cb.vals, pol

    s_host, l_host, _ = run()
    s_dev, l_dev, pol = run(prep_placement="device", wire=wire)
    assert int(s_dev.step) == 6
    np.testing.assert_allclose(l_host, l_dev, rtol=0, atol=0)
    assert pol.bucket > 48  # audit caught the overflow batch and regrew


def test_recmodel_device_prep_requires_bucket():
    from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
    from mindrec_tpu.train.rec_model import RecModel

    cfg = WideDeepConfig(batch_size=8, field_size=2, vocab_size=100,
                         emb_dim=4, deep_layer_dim=(8,), sparse=True)
    with pytest.raises(ValueError, match="unique_bucket"):
        RecModel(WideDeepModel(cfg), prep_placement="device")


def test_choose_prep_placement():
    # PCIe-class link: transfer negligible -> host prep (smaller step)
    fast = 12e9
    assert choose_prep(22.4, 29.4, 11.2, 12_700_000, 3_200_000, fast) == "host"
    # dev-tunnel-class link: metadata bytes dominate -> device prep
    slow = 60e6
    assert choose_prep(22.4, 29.4, 11.2, 12_700_000, 3_200_000, slow) == "device"
