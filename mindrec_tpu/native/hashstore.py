"""Host-side hash embedding store (reference ``MapParameter`` equivalent).

Maps arbitrary int64 feature keys to dense slots of a fixed-capacity HBM
arena, with the reference's feature-admission / eviction semantics
(``mindspore_rec/ops/embedding.py:136-149``):

* a key is *admitted* (gets a real slot) once it has been seen in at
  least ``permit_threshold`` distinct steps;
* keys untouched for ``evict_threshold`` steps are erased and their
  slots recycled.

Backed by the C++ open-addressing store in ``hashstore.cc`` (loaded via
ctypes); a NumPy/Python implementation with identical behavior is the
fallback and the correctness oracle in tests.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_LIB_NAME = "libmindrec_hashstore.so"


def _find_native_lib():
    here = Path(__file__).resolve().parent
    for cand in (here / _LIB_NAME, here / "build" / _LIB_NAME):
        if cand.exists():
            return str(cand)
    return None


class PyHashStore:
    """Pure-Python reference implementation (and fallback)."""

    def __init__(self, capacity: int, permit_threshold: int = 1, evict_threshold: int = 0x7FFFFFFF):
        self.capacity = int(capacity)
        self.permit_threshold = int(permit_threshold)
        self.evict_threshold = int(evict_threshold)
        self.step = 0
        self._map: dict[int, int] = {}  # key -> slot
        self._seen: dict[int, int] = {}  # key -> distinct-step seen count
        self._seen_step: dict[int, int] = {}  # key -> last step counted
        self._last: dict[int, int] = {}  # key -> last touched step
        self._free = list(range(self.capacity - 1, -1, -1))

    def __len__(self):
        return len(self._map)

    def lookup_or_insert(self, keys: np.ndarray, force: bool = False) -> np.ndarray:
        """One training step's id->slot translation. Advances the step clock."""
        self.step += 1
        keys = np.asarray(keys, dtype=np.int64).reshape(-1)
        out = np.empty(keys.shape[0], dtype=np.int64)
        for i, k in enumerate(keys.tolist()):
            slot = self._map.get(k)
            if slot is None:
                if self._seen_step.get(k) != self.step:
                    self._seen[k] = self._seen.get(k, 0) + 1
                    self._seen_step[k] = self.step
                if force or self._seen[k] >= self.permit_threshold:
                    if self._free:
                        slot = self._free.pop()
                        self._map[k] = slot
                        self._last[k] = self.step
                        out[i] = slot
                    else:
                        out[i] = -1  # arena full
                else:
                    out[i] = -1  # not admitted yet
            else:
                self._last[k] = self.step
                out[i] = slot
        return out

    def evict(self) -> np.ndarray:
        """Erase keys idle for >= evict_threshold steps; return freed slots."""
        dead = [
            k
            for k, last in self._last.items()
            if self.step - last >= self.evict_threshold
        ]
        freed = []
        for k in dead:
            slot = self._map.pop(k)
            del self._last[k]
            self._seen.pop(k, None)
            self._seen_step.pop(k, None)
            self._free.append(slot)
            freed.append(slot)
        return np.asarray(freed, dtype=np.int64)

    def erase(self, keys: np.ndarray) -> None:
        for k in np.asarray(keys, dtype=np.int64).reshape(-1).tolist():
            slot = self._map.pop(k, None)
            if slot is not None:
                self._last.pop(k, None)
                self._free.append(slot)

    def items(self) -> tuple[np.ndarray, np.ndarray]:
        if not self._map:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        keys = np.fromiter(self._map.keys(), dtype=np.int64, count=len(self._map))
        slots = np.fromiter(self._map.values(), dtype=np.int64, count=len(self._map))
        return keys, slots


class NativeHashStore:
    """ctypes binding over the C++ store (hashstore.cc)."""

    def __init__(self, capacity: int, permit_threshold: int = 1, evict_threshold: int = 0x7FFFFFFF, lib_path: str | None = None):
        lib_path = lib_path or _find_native_lib()
        if lib_path is None:
            raise FileNotFoundError(_LIB_NAME)
        lib = ctypes.CDLL(lib_path)
        lib.hs_create.restype = ctypes.c_void_p
        lib.hs_create.argtypes = [ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.hs_destroy.argtypes = [ctypes.c_void_p]
        lib.hs_size.restype = ctypes.c_int64
        lib.hs_size.argtypes = [ctypes.c_void_p]
        lib.hs_lookup_or_insert.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
        ]
        lib.hs_evict.restype = ctypes.c_int64
        lib.hs_evict.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
        lib.hs_erase.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        lib.hs_items.restype = ctypes.c_int64
        lib.hs_items.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        self._lib = lib
        self.capacity = int(capacity)
        self.permit_threshold = int(permit_threshold)
        self.evict_threshold = int(evict_threshold)
        self._h = lib.hs_create(capacity, permit_threshold, evict_threshold)

    def __del__(self):
        try:
            self._lib.hs_destroy(self._h)
        except Exception:
            pass

    def __len__(self):
        return int(self._lib.hs_size(self._h))

    @staticmethod
    def _ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    def lookup_or_insert(self, keys: np.ndarray, force: bool = False) -> np.ndarray:
        keys = np.ascontiguousarray(np.asarray(keys, dtype=np.int64).reshape(-1))
        out = np.empty(keys.shape[0], dtype=np.int64)
        self._lib.hs_lookup_or_insert(
            self._h, self._ptr(keys), keys.shape[0], self._ptr(out), int(force)
        )
        return out

    def evict(self) -> np.ndarray:
        out = np.empty(self.capacity, dtype=np.int64)
        n = self._lib.hs_evict(self._h, self._ptr(out))
        return out[:n].copy()

    def erase(self, keys: np.ndarray) -> None:
        keys = np.ascontiguousarray(np.asarray(keys, dtype=np.int64).reshape(-1))
        self._lib.hs_erase(self._h, self._ptr(keys), keys.shape[0])

    def items(self) -> tuple[np.ndarray, np.ndarray]:
        n = len(self)
        keys = np.empty(max(n, 1), dtype=np.int64)
        slots = np.empty(max(n, 1), dtype=np.int64)
        n = self._lib.hs_items(self._h, self._ptr(keys), self._ptr(slots))
        return keys[:n].copy(), slots[:n].copy()


def HashStore(capacity: int, permit_threshold: int = 1, evict_threshold: int = 0x7FFFFFFF, prefer_native: bool = True):
    """Factory: native C++ store if built, else the Python fallback."""
    if prefer_native and os.environ.get("MINDREC_TPU_FORCE_PY_HASHSTORE") != "1":
        try:
            return NativeHashStore(capacity, permit_threshold, evict_threshold)
        except (FileNotFoundError, OSError):
            pass
    return PyHashStore(capacity, permit_threshold, evict_threshold)
