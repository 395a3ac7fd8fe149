"""Reference ONNX evaluator (decode + numpy execution).

Decodes a standard ONNX ``ModelProto`` (raw protobuf wire format — no
``onnx`` dependency) and executes the op subset the zoo's exported
serving graphs use.  Purpose: validate ``io/onnx.py`` exports in-repo
(``tests/test_onnx_export.py``) and serve as a zero-dependency fallback
runtime; any real deployment uses onnxruntime/TensorRT on the same
files."""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# protobuf wire-format decoding
# --------------------------------------------------------------------------


def _read_varint(data: bytes, off: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = data[off]
        off += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, off
        shift += 7


def parse_message(data: bytes) -> dict[int, list]:
    """-> {field_number: [raw values]} (varints as int, len-delimited
    as bytes, fixed32 as bytes)."""
    fields: dict[int, list] = {}
    off = 0
    n = len(data)
    while off < n:
        key, off = _read_varint(data, off)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, off = _read_varint(data, off)
        elif wire == 2:
            ln, off = _read_varint(data, off)
            v = data[off : off + ln]
            off += ln
        elif wire == 5:
            v = data[off : off + 4]
            off += 4
        elif wire == 1:
            v = data[off : off + 8]
            off += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        fields.setdefault(field, []).append(v)
    return fields


_ONNX_NP = {1: np.float32, 6: np.int32, 7: np.int64, 9: np.bool_,
            11: np.float64}


def _decode_tensor(data: bytes) -> tuple[str, np.ndarray]:
    f = parse_message(data)
    dims = [int(d) for d in f.get(1, [])]
    dtype = _ONNX_NP[int(f[2][0])]
    name = f.get(8, [b""])[0].decode()
    if 9 in f:  # raw_data
        arr = np.frombuffer(f[9][0], dtype=dtype)
    elif 4 in f:  # float_data (packed or repeated)
        arr = np.asarray(
            [struct.unpack("<f", v)[0] if isinstance(v, bytes) else v
             for v in f[4]], np.float32)
    elif 7 in f:  # int64_data
        arr = np.asarray([int(v) for v in f[7]], np.int64)
    else:
        arr = np.zeros(0, dtype)
    return name, arr.reshape(dims)


def _decode_attr(data: bytes) -> tuple[str, object]:
    f = parse_message(data)
    name = f[1][0].decode()
    atype = int(f.get(20, [0])[0])
    if atype == 1:  # FLOAT
        return name, struct.unpack("<f", f[2][0])[0]
    if atype == 2:  # INT
        return name, int(f[3][0])
    if atype == 7:  # INTS
        return name, [int(v) for v in f.get(8, [])]
    if atype == 4:  # TENSOR
        return name, _decode_tensor(f[5][0])[1]
    if atype == 3:  # STRING
        return name, f[4][0].decode()
    raise ValueError(f"unsupported attribute type {atype}")


def _decode_node(data: bytes) -> dict:
    f = parse_message(data)
    return {
        "inputs": [v.decode() for v in f.get(1, [])],
        "outputs": [v.decode() for v in f.get(2, [])],
        "op": f[4][0].decode(),
        "attrs": dict(_decode_attr(a) for a in f.get(5, [])),
    }


def load_onnx(data: bytes) -> dict:
    """ModelProto bytes -> {graph_name, nodes, initializers, inputs,
    outputs} (inputs/outputs as names)."""
    model = parse_message(data)
    graph = parse_message(model[7][0])

    def vi_name(v):
        return parse_message(v)[1][0].decode()

    return {
        "name": graph.get(2, [b""])[0].decode(),
        "nodes": [_decode_node(n) for n in graph.get(1, [])],
        "initializers": dict(
            _decode_tensor(t) for t in graph.get(5, [])
        ),
        "inputs": [vi_name(v) for v in graph.get(11, [])],
        "outputs": [vi_name(v) for v in graph.get(12, [])],
        "opset": int(parse_message(model[8][0])[2][0]) if 8 in model else 0,
    }


# --------------------------------------------------------------------------
# numpy execution
# --------------------------------------------------------------------------


def _run_node(op: str, ins: list[np.ndarray], attrs: dict) -> np.ndarray:
    if op == "Add":
        return ins[0] + ins[1]
    if op == "Sub":
        return ins[0] - ins[1]
    if op == "Mul":
        return ins[0] * ins[1]
    if op == "MatMul":
        return ins[0] @ ins[1]
    if op == "Gather":
        return np.take(ins[0], ins[1], axis=attrs.get("axis", 0))
    if op == "Unsqueeze":
        out = ins[0]
        for ax in sorted(attrs["axes"]):
            out = np.expand_dims(out, ax)
        return out
    if op == "ReduceSum":
        return np.sum(ins[0], axis=tuple(attrs["axes"]),
                      keepdims=bool(attrs.get("keepdims", 1)))
    if op == "ReduceMean":
        return np.mean(ins[0], axis=tuple(attrs["axes"]),
                       keepdims=bool(attrs.get("keepdims", 1)))
    if op == "Reshape":
        return ins[0].reshape([int(d) for d in ins[1]])
    if op == "Relu":
        return np.maximum(ins[0], 0.0)
    if op == "Sigmoid":
        return 1.0 / (1.0 + np.exp(-ins[0]))
    if op == "Tanh":
        return np.tanh(ins[0])
    if op == "Concat":
        return np.concatenate(ins, axis=attrs.get("axis", 0))
    raise NotImplementedError(f"onnx_ref: op {op}")


def run_onnx(data: bytes, feeds: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Execute an ONNX model on named inputs; returns named outputs."""
    m = load_onnx(data)
    env: dict[str, np.ndarray] = dict(m["initializers"])
    for name in m["inputs"]:
        env[name] = np.asarray(feeds[name])
    for n in m["nodes"]:
        ins = [env[x] for x in n["inputs"]]
        env[n["outputs"][0]] = _run_node(n["op"], ins, n["attrs"])
    return {name: env[name] for name in m["outputs"]}
