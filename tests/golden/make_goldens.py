"""Regenerate the committed golden fixtures.

Provenance:

* ``criteo_golden.tfrecord`` — written by REAL TensorFlow
  (``tf.io.TFRecordWriter`` + ``tf.train.Example``, tf 2.21.0) so the
  unconditional decode test validates mindrec_tpu's from-scratch codec
  against ecosystem-produced bytes even in environments without tf.
* ``{wide_deep,deepfm,dcn}.onnx`` — emitted by ``io/onnx.py`` with
  DETERMINISTIC numpy parameters (no jax PRNG, so the bytes are stable
  across jax versions).  Their structure was independently validated
  with ``protoc --decode_raw`` (libprotoc 3.21.12) at generation time,
  and the committed test re-validates with protoc + executes them with
  the in-repo numpy evaluator on every run; environments with
  onnxruntime additionally execute them with the real runtime.

Run from the repo root: ``python tests/golden/make_goldens.py``.
"""

import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

HERE = pathlib.Path(__file__).resolve().parent

TF_EXAMPLES = [
    {"ids": np.array([5, 6, 1 << 40, -3], np.int64),
     "wts": np.array([0.5, -1.25, 3.75], np.float32),
     "tag": [b"mindrec"]},
    {"ids": np.array([0], np.int64),
     "wts": np.array([], np.float32),
     "tag": [b"", b"xyz"]},
]


def make_tfrecord():
    import tensorflow as tf

    def tf_example(ex):
        feats = {}
        for k, v in ex.items():
            if k == "tag":
                feats[k] = tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=v))
            elif v.dtype == np.int64:
                feats[k] = tf.train.Feature(
                    int64_list=tf.train.Int64List(value=v.tolist()))
            else:
                feats[k] = tf.train.Feature(
                    float_list=tf.train.FloatList(value=v.tolist()))
        return tf.train.Example(features=tf.train.Features(feature=feats))

    out = HERE / "criteo_golden.tfrecord"
    with tf.io.TFRecordWriter(str(out)) as w:
        for ex in TF_EXAMPLES:
            w.write(tf_example(ex).SerializeToString())
    print("wrote", out, out.stat().st_size, "bytes")


def make_onnx():
    from test_onnx_export import _make, det_params

    from mindrec_tpu.io.onnx import export_onnx

    for kind in ("wide_deep", "deepfm", "dcn"):
        model = _make(kind)
        params = det_params(model)
        p = export_onnx(HERE / f"{kind}.onnx", kind, model, params)
        print("wrote", p, pathlib.Path(p).stat().st_size, "bytes")


if __name__ == "__main__":
    make_tfrecord()
    make_onnx()
