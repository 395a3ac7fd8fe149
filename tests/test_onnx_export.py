"""ONNX export parity: the emitted graphs compute exactly
``model.predict`` (f32 serving precision) for wide_deep / deepfm / dcn
(VERDICT r2 item 7; reference ``models/deepfm/export.py:40-48``).

Validation runs the in-repo reference evaluator
(``serving/onnx_ref.py``); when onnxruntime is installed the same file
is additionally executed by the real runtime."""

import numpy as np
import pytest

import jax

from mindrec_tpu.io.onnx import export_onnx
from mindrec_tpu.serving.onnx_ref import load_onnx, run_onnx


def _make(kind):
    if kind == "wide_deep":
        from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel

        cfg = WideDeepConfig(batch_size=8, field_size=5, vocab_size=300,
                             emb_dim=8, deep_layer_dim=(16, 8),
                             use_mixed_precision=False)
        return WideDeepModel(cfg)
    if kind == "deepfm":
        from mindrec_tpu.models.deepfm import DeepFMConfig, DeepFMModel

        cfg = DeepFMConfig(batch_size=8, field_size=5, vocab_size=300,
                           emb_dim=8, deep_layer_dim=(16, 8),
                           use_mixed_precision=False)
        return DeepFMModel(cfg)
    from mindrec_tpu.models.dcn import DCNConfig, DCNModel

    cfg = DCNConfig(batch_size=8, field_size=5, vocab_size=300, emb_dim=8,
                    cross_layer_num=3, deep_layer_dim=(16, 16),
                    use_mixed_precision=False)
    return DCNModel(cfg)


def det_params(model):
    """Deterministic numpy parameters (no jax PRNG): leaf k's values are
    a fixed small-integer pattern, so the exported golden bytes are
    stable across jax versions and platforms."""
    params = model.init(jax.random.PRNGKey(0))
    counter = [0]

    def fill(leaf):
        i = counter[0]
        counter[0] += 1
        n = int(np.prod(leaf.shape)) if leaf.ndim else 1
        vals = (((np.arange(n) * 37 + i * 101) % 29) - 14) / 64.0
        return vals.reshape(leaf.shape).astype(np.float32)

    return jax.tree.map(fill, params)


@pytest.mark.parametrize("kind", ["wide_deep", "deepfm", "dcn"])
def test_onnx_matches_predict(kind, tmp_path):
    model = _make(kind)
    params = model.init(jax.random.PRNGKey(3))
    rng = np.random.default_rng(0)
    B, F = 8, model.config.field_size
    ids = rng.integers(0, model.config.vocab_size, (B, F)).astype(np.int32)
    wts = rng.uniform(0.5, 1.5, (B, F)).astype(np.float32)
    want = np.asarray(model.predict(params, ids, wts))

    p = export_onnx(tmp_path / f"{kind}.onnx", kind, model, params)
    data = open(p, "rb").read()
    m = load_onnx(data)
    assert m["inputs"] == ["ids", "wts"] and m["outputs"] == ["prob"]
    assert m["opset"] == 11
    got = run_onnx(data, {"ids": ids, "wts": wts})["prob"]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # different batch size through the symbolic batch dim
    ids2, wts2 = ids[:3], wts[:3]
    got2 = run_onnx(data, {"ids": ids2, "wts": wts2})["prob"]
    np.testing.assert_allclose(
        got2, np.asarray(model.predict(params, ids2, wts2)),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("kind", ["wide_deep", "deepfm", "dcn"])
def test_onnx_external_validation(kind, tmp_path):
    """Unconditional external-format validation (VERDICT r3 item 4):

    1. the export of a DETERMINISTIC model byte-matches the committed
       golden (``tests/golden/{kind}.onnx``, provenance in
       ``tests/golden/make_goldens.py``);
    2. ``protoc --decode_raw`` — an independent protobuf implementation
       — parses the file and shows the ModelProto skeleton
       (ir_version=field 1, graph=field 7, opset_import=field 8);
    3. the in-repo numpy evaluator executes it to predict() parity;
    4. when onnxruntime is installed, the REAL runtime executes the
       same golden file too.
    """
    import pathlib
    import shutil
    import subprocess

    model = _make(kind)
    params = det_params(model)
    p = export_onnx(tmp_path / f"{kind}.onnx", kind, model, params)
    data = open(p, "rb").read()

    golden = pathlib.Path(__file__).parent / "golden" / f"{kind}.onnx"
    assert data == golden.read_bytes(), (
        f"export no longer byte-matches the committed golden {golden}; "
        "if the change is intentional, regenerate via "
        "tests/golden/make_goldens.py and re-validate with protoc/"
        "onnxruntime"
    )

    if shutil.which("protoc"):
        out = subprocess.run(
            ["protoc", "--decode_raw"], input=data,
            capture_output=True, check=True,
        ).stdout.decode()
        # top-level ModelProto fields: ir_version(1), graph(7), opset(8)
        top = set()
        depth = 0
        for line in out.splitlines():
            s = line.strip()
            depth += s.count("{") - s.count("}")
            if depth == (1 if "{" in s else 0) and s and s[0].isdigit():
                top.add(int(s.split(":")[0].split(" ")[0]))
        assert {1, 7, 8} <= top, (top, out[:400])

    rng = np.random.default_rng(1)
    B, F = 6, model.config.field_size
    ids = rng.integers(0, model.config.vocab_size, (B, F)).astype(np.int32)
    wts = rng.uniform(0.5, 1.5, (B, F)).astype(np.float32)
    want = np.asarray(model.predict(params, ids, wts))
    got = run_onnx(data, {"ids": ids, "wts": wts})["prob"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    try:
        import onnxruntime as ort
    except ImportError:
        return
    sess = ort.InferenceSession(p, providers=["CPUExecutionProvider"])
    (got,) = sess.run(["prob"], {"ids": ids, "wts": wts})
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_onnx_multitable_matches_predict(tmp_path):
    """4th zoo model: the multitable Outbrain W&D exports with its own
    21-column signature and matches predict exactly."""
    from mindrec_tpu.models.multitable import (
        MULTI_FIELDS,
        MultiTableConfig,
        MultiTableWideDeepModel,
    )

    cfg = MultiTableConfig(
        batch_size=8, continue_field_size=4, indicator_field_size=2,
        emb128_field_size=1, emb64_single_field_size=2,
        multi_hot_sizes=(2, 3, 2, 2, 2, 2), emb_128_size=100,
        emb64_single_size=50, emb64_multi_size=60,
        deep_layer_dim=(16, 8), use_mixed_precision=False,
    )
    model = MultiTableWideDeepModel(cfg)
    params = model.init(jax.random.PRNGKey(5))
    rng = np.random.default_rng(2)
    B = 8
    batch = {
        "continue_val": rng.uniform(size=(B, 4)).astype(np.float32),
        "indicator_id": rng.integers(0, 16, (B, 2)).astype(np.int32),
        "emb_128_id": rng.integers(0, 100, (B, 1)).astype(np.int32),
        "emb_64_single_id": rng.integers(0, 50, (B, 2)).astype(np.int32),
    }
    for name, L in zip(MULTI_FIELDS, cfg.multi_hot_sizes):
        batch[f"multi_{name}_id"] = rng.integers(0, 60, (B, L)).astype(np.int32)
        lens = rng.integers(1, L + 1, B)
        batch[f"multi_{name}_mask"] = (
            np.arange(L)[None, :] < lens[:, None]
        ).astype(np.float32)
    want = np.asarray(model.predict(params, batch))

    p = export_onnx(tmp_path / "mt.onnx", "multitable", model, params)
    data = open(p, "rb").read()
    got = run_onnx(data, batch)["prob"]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
