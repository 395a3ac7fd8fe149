"""Export roundtrip + C++ inference client parity with Python forward."""

import subprocess
from pathlib import Path

import jax
import numpy as np
import pytest

from mindrec_tpu.io.export import export_model, load_model
from mindrec_tpu.models.dcn import DCNConfig, DCNModel
from mindrec_tpu.models.deepfm import DeepFMConfig, DeepFMModel
from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel

CLIENT = Path(__file__).resolve().parent.parent / "mindrec_tpu/serving/infer_client"


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "ids": rng.integers(0, cfg.vocab_size, size=(8, cfg.field_size)).astype(np.int32),
        "wts": rng.uniform(0.5, 1.5, size=(8, cfg.field_size)).astype(np.float32),
    }


def test_export_load_roundtrip(tmp_path):
    cfg = WideDeepConfig(batch_size=8, field_size=4, vocab_size=100, emb_dim=4,
                         deep_layer_dim=(8,), use_mixed_precision=False)
    model = WideDeepModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    p = export_model(tmp_path / "m.mrec", "wide_deep", params)
    kind, tensors = load_model(p)
    assert kind == "wide_deep"
    np.testing.assert_allclose(
        tensors["deep/table"], np.asarray(params["deep"]["table"])
    )
    assert "deep/mlp/0/w" in tensors


def _run_client(tmp_path, kind, model, params, cfg):
    if not CLIENT.exists():
        pytest.skip("infer_client not built")
    b = _batch(cfg)
    mp = export_model(tmp_path / "m.mrec", kind, params)
    (tmp_path / "ids.bin").write_bytes(b["ids"].tobytes())
    (tmp_path / "wts.bin").write_bytes(b["wts"].tobytes())
    out = tmp_path / "out.txt"
    subprocess.run(
        [str(CLIENT), mp, str(tmp_path / "ids.bin"), str(tmp_path / "wts.bin"),
         "8", str(cfg.field_size), str(out)],
        check=True, capture_output=True,
    )
    got = np.array([float(x) for x in out.read_text().split()])
    want = np.asarray(model.predict(params, b["ids"], b["wts"])).reshape(-1)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_cpp_client_wide_deep(tmp_path):
    cfg = WideDeepConfig(batch_size=8, field_size=4, vocab_size=100, emb_dim=4,
                         deep_layer_dim=(8, 8), use_mixed_precision=False)
    model = WideDeepModel(cfg)
    _run_client(tmp_path, "wide_deep", model, model.init(jax.random.PRNGKey(1)), cfg)


def test_cpp_client_deepfm(tmp_path):
    cfg = DeepFMConfig(batch_size=8, field_size=5, vocab_size=100, emb_dim=6,
                       deep_layer_dim=(8,), use_mixed_precision=False,
                       keep_prob=1.0, dropout_flag=False)
    model = DeepFMModel(cfg)
    _run_client(tmp_path, "deepfm", model, model.init(jax.random.PRNGKey(2)), cfg)


def test_cpp_client_dcn(tmp_path):
    cfg = DCNConfig(batch_size=8, field_size=5, vocab_size=100, emb_dim=6,
                    deep_layer_dim=(8, 8), cross_layer_num=3)
    model = DCNModel(cfg)
    _run_client(tmp_path, "dcn", model, model.init(jax.random.PRNGKey(3)), cfg)
