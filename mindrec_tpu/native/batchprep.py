"""ctypes shim over libmindrec_batchprep.so (native host batch prep).

ctypes releases the GIL for the call's duration, so a plain Python
thread pool overlaps this with the jitted device step — the TPU-native
replacement for the reference's MindData sink pipeline host stage
(``mindspore_rec/train/rec_model.py:124-131``)."""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_I32P = ctypes.POINTER(ctypes.c_int32)


def _load():
    cand = Path(__file__).resolve().parent / "libmindrec_batchprep.so"
    if not cand.exists():
        return None
    lib = ctypes.CDLL(str(cand))
    fn = lib.mrec_batch_prep_i32
    fn.restype = ctypes.c_int64
    fn.argtypes = [
        _I32P, ctypes.c_int64,  # ids, n
        _I32P, _I32P, _I32P,    # sorted_ids, perm, inv
        _I32P, _I32P, _I32P,    # uq, uidx, uidx_sorted
        ctypes.c_int64, ctypes.c_int32,  # uq_len, uq_fill
    ]
    return fn


_FN = _load()

SENTINEL = np.int32(2**31 - 2)


def available() -> bool:
    return _FN is not None


def batch_prep(ids: np.ndarray, uq_len: int | None = None,
               minimal: bool = False):
    """-> (sorted_ids, perm, inv, uq, uidx, uidx_sorted, n_unique).

    ``uq`` is sentinel-padded to ``uq_len`` (default ``ids.size``);
    ``n_unique`` may exceed ``uq_len`` — the caller decides whether
    that's an error or a re-bucket trigger.

    ``minimal=True`` skips ``sorted_ids`` and ``inv`` (returned as
    None): the jitted sparse step never reads them when the full unique
    metadata is present, and skipping their scatter writes cuts the
    output pass ~1/3 (the pipeline's hot config)."""
    if _FN is None:
        raise RuntimeError("libmindrec_batchprep.so not built")
    ids = np.ascontiguousarray(ids, dtype=np.int32).reshape(-1)
    n = ids.size
    if uq_len is None:
        uq_len = n
    if minimal:
        sorted_ids = inv = None
        sp = ip = None
    else:
        sorted_ids = np.empty(n, np.int32)
        inv = np.empty(n, np.int32)
        sp = sorted_ids.ctypes.data_as(_I32P)
        ip = inv.ctypes.data_as(_I32P)
    perm = np.empty(n, np.int32)
    uq = np.empty(uq_len, np.int32)
    uidx = np.empty(n, np.int32)
    uidx_sorted = np.empty(n, np.int32)
    nu = _FN(
        ids.ctypes.data_as(_I32P), n,
        sp,
        perm.ctypes.data_as(_I32P),
        ip,
        uq.ctypes.data_as(_I32P),
        uidx.ctypes.data_as(_I32P),
        uidx_sorted.ctypes.data_as(_I32P),
        uq_len, SENTINEL,
    )
    return sorted_ids, perm, inv, uq, uidx, uidx_sorted, int(nu)
