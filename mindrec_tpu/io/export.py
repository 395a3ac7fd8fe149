"""Serving export: portable model format + helpers.

Parity target: the reference exports MindIR/AIR/ONNX
(``models/deepfm/export.py:35-48``) consumed by C++ inference clients
(``models/deepfm/cpp_infer/src/main.cc``).  The TPU-native equivalent is
a self-describing flat binary format ("MREC1") that the bundled C++
client (``mindrec_tpu/serving/infer_client.cc``) mmaps and executes for
the CTR model zoo's forward pass, plus an ``.npz`` sidecar for Python
consumers.

Format (little-endian):
  magic "MREC1" | u32 model_kind | u32 n_tensors |
  per tensor: u32 name_len, name bytes, u32 dtype(0=f32,1=i32),
              u32 ndim, u64 dims[ndim], raw data
Model kinds: 0=wide_deep, 1=deepfm, 2=dcn.
"""

from __future__ import annotations

import struct
from pathlib import Path

import jax
import numpy as np

MAGIC = b"MREC1"
MODEL_KINDS = {"wide_deep": 0, "deepfm": 1, "dcn": 2, "multitable": 3}


def _flat_named(params) -> list[tuple[str, np.ndarray]]:
    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in leaves:
        key = "/".join(
            str(p.key) if hasattr(p, "key") else str(getattr(p, "idx", p))
            for p in path
        )
        out.append((key, np.asarray(leaf)))
    return out


def export_model(path: str | Path, model_kind: str, params) -> str:
    """Write the MREC1 binary + .npz sidecar. Returns the binary path."""
    path = Path(path)
    tensors = _flat_named(params)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<II", MODEL_KINDS[model_kind], len(tensors)))
        for name, arr in tensors:
            arr = np.ascontiguousarray(arr)
            if arr.dtype == np.float32:
                dt = 0
            elif arr.dtype == np.int32:
                dt = 1
            else:
                arr = arr.astype(np.float32)
                dt = 0
            nb = name.encode()
            f.write(struct.pack("<I", len(nb)))
            f.write(nb)
            f.write(struct.pack("<II", dt, arr.ndim))
            for d in arr.shape:
                f.write(struct.pack("<Q", d))
            f.write(arr.tobytes())
    np.savez(str(path) + ".npz", **dict(tensors))
    return str(path)


def load_model(path: str | Path) -> tuple[str, dict[str, np.ndarray]]:
    """Read an MREC1 binary back into {name: array}."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:5] != MAGIC:
        raise ValueError("not an MREC1 file")
    off = 5
    kind, n = struct.unpack_from("<II", data, off)
    off += 8
    tensors = {}
    for _ in range(n):
        (nlen,) = struct.unpack_from("<I", data, off)
        off += 4
        name = data[off : off + nlen].decode()
        off += nlen
        dt, ndim = struct.unpack_from("<II", data, off)
        off += 8
        dims = struct.unpack_from(f"<{ndim}Q", data, off)
        off += 8 * ndim
        dtype = np.float32 if dt == 0 else np.int32
        count = int(np.prod(dims)) if ndim else 1
        arr = np.frombuffer(data, dtype=dtype, count=count, offset=off).reshape(dims)
        off += count * 4
        tensors[name] = arr
    kind_name = {v: k for k, v in MODEL_KINDS.items()}[kind]
    return kind_name, tensors
