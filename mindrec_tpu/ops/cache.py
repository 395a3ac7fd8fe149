"""Hierarchical embedding cache: device HBM arena <-> host RAM <-> SSD.

TPU-native re-design of the reference's embedding-cache training mode
(SURVEY §2.3; control surface ``vocab_cache_size`` in
``mindspore_rec/ops/embedding.py:163-182``, RAM cap + SSD spill via
``MS_EMBEDDING_REMOTE_CACHE_MEMORY_SIZE`` in the terabyte launch script
``run_parameter_server_standalone_train_terabyte_scale_model.sh:35-42``):

* the jitted train step only ever sees a dense ``[cache_rows, dim]``
  HBM arena (static shapes; slot ids instead of feature ids);
* a C++ LRU manager (native/cache.cc) translates each batch's huge
  feature ids -> arena slots and emits the swap lists;
* :class:`HostTier` holds the full table on the host — first
  ``ram_rows`` rows' worth of touched data in RAM, everything beyond in
  an SSD-backed memmap file (the RAM-cap knob);
* the swap itself is two static-shape device ops (gather evicted rows
  out, scatter loaded rows in), padded to a fixed ``max_swap`` per batch
  so the step never recompiles.

The optimizer state rows for cached tables ride along in the same swap
(they are row-aligned arenas), so FTRL/Adam state migrates with the row
— matching the reference server-side-optimizer semantics.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import jax.numpy as jnp
import numpy as np

def _load_cache_lib():
    lib_path = None
    here = Path(__file__).resolve().parent.parent / "native"
    for cand in (here / "libmindrec_cache.so",):
        if cand.exists():
            lib_path = str(cand)
    if lib_path is None:
        return None
    lib = ctypes.CDLL(lib_path)
    lib.lru_create.restype = ctypes.c_void_p
    lib.lru_create.argtypes = [ctypes.c_int64]
    lib.lru_destroy.argtypes = [ctypes.c_void_p]
    lib.lru_size.restype = ctypes.c_int64
    lib.lru_size.argtypes = [ctypes.c_void_p]
    lib.lru_lookup.restype = ctypes.c_int64
    lib.lru_lookup.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_int64)] * 1 + [
        ctypes.c_int64
    ] + [ctypes.POINTER(ctypes.c_int64)] * 6
    return lib


class PyLruCache:
    """Python LRU fallback mirroring native/cache.cc semantics."""

    def __init__(self, capacity: int):
        from collections import OrderedDict

        self.capacity = capacity
        self._od = OrderedDict()  # key -> slot, MRU last
        self._free = list(range(capacity - 1, -1, -1))

    def __len__(self):
        return len(self._od)

    def lookup(self, ids: np.ndarray):
        ids = np.asarray(ids, np.int64).reshape(-1)
        slots = np.empty_like(ids)
        load_ids, load_slots, evict_ids, evict_slots = [], [], [], []
        # pre-pin every resident batch id (even ones after a miss) so a
        # miss can't evict a later id of the same batch — that reload
        # would silently lose training updates (cf. cache.cc Pass 0)
        pinned = {k for k in ids.tolist() if k in self._od}
        for i, k in enumerate(ids.tolist()):
            if k in self._od:
                self._od.move_to_end(k)
                slots[i] = self._od[k]
                pinned.add(k)
                continue
            if self._free:
                s = self._free.pop()
            else:
                victim = None
                for cand in self._od:  # LRU first
                    if cand not in pinned:
                        victim = cand
                        break
                if victim is None:
                    slots[i] = -1
                    continue
                s = self._od.pop(victim)
                evict_ids.append(victim)
                evict_slots.append(s)
            self._od[k] = s
            self._od.move_to_end(k)
            pinned.add(k)
            load_ids.append(k)
            load_slots.append(s)
            slots[i] = s
        return (
            slots,
            np.asarray(load_ids, np.int64),
            np.asarray(load_slots, np.int64),
            np.asarray(evict_ids, np.int64),
            np.asarray(evict_slots, np.int64),
        )


class NativeLruCache:
    def __init__(self, capacity: int):
        lib = _load_cache_lib()
        if lib is None:
            raise FileNotFoundError("libmindrec_cache.so")
        self._lib = lib
        self.capacity = capacity
        self._h = lib.lru_create(capacity)

    def __del__(self):
        try:
            self._lib.lru_destroy(self._h)
        except Exception:
            pass

    def __len__(self):
        return int(self._lib.lru_size(self._h))

    @staticmethod
    def _p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    def lookup(self, ids: np.ndarray):
        ids = np.ascontiguousarray(np.asarray(ids, np.int64).reshape(-1))
        n = ids.shape[0]
        slots = np.empty(n, np.int64)
        load_ids = np.empty(n, np.int64)
        load_slots = np.empty(n, np.int64)
        evict_ids = np.empty(n, np.int64)
        evict_slots = np.empty(n, np.int64)
        n_evict = np.zeros(1, np.int64)
        n_load = self._lib.lru_lookup(
            self._h, self._p(ids), n, self._p(slots), self._p(load_ids),
            self._p(load_slots), self._p(evict_ids), self._p(evict_slots),
            self._p(n_evict),
        )
        ne = int(n_evict[0])
        return (
            slots,
            load_ids[:n_load].copy(),
            load_slots[:n_load].copy(),
            evict_ids[:ne].copy(),
            evict_slots[:ne].copy(),
        )


def LruCache(capacity: int, prefer_native: bool = True):
    if prefer_native:
        try:
            return NativeLruCache(capacity)
        except (FileNotFoundError, OSError):
            import warnings

            warnings.warn(
                "libmindrec_cache.so not found — falling back to the "
                "per-id Python LRU (~1000x slower; fine for tests, "
                "unusable for cache-mode training). Build it with "
                "`make -C mindrec_tpu/native`.",
                RuntimeWarning,
                stacklevel=2,
            )
    return PyLruCache(capacity)


class HostTier:
    """Host-side full (virtual) table: RAM for ids below ``ram_rows``,
    an SSD-backed spill file for the rest (the RAM-cap knob).

    Both tiers materialize rows lazily (unseen rows get the init
    distribution on first read), so a 10^10-row virtual vocab costs only
    the touched rows: the RAM tier is a dense [ram_rows, dim] array and
    the SSD tier is an append-allocated file with an id->file-row dict —
    the same trick that lets the reference's server spill a 864 GB table
    behind a 10 GB RAM cap (terabyte launch script `:35-42`)."""

    SSD_GROW = 4096  # file grows in chunks of this many rows

    def __init__(self, vocab_size: int, dim: int, ram_bytes: int | None = None,
                 spill_dir: str | None = None, init_fn=None, seed: int = 0):
        self.vocab_size = vocab_size
        self.dim = dim
        row_bytes = dim * 4
        if ram_bytes is None:
            ram_rows = vocab_size
        else:
            ram_rows = max(min(vocab_size, ram_bytes // row_bytes), 0)
        self.ram_rows = int(ram_rows)
        self._init_fn = init_fn or (
            lambda n: np.random.default_rng(seed).normal(0, 0.01, (n, dim)).astype(np.float32)
        )
        self._ram = None  # lazy dense [ram_rows, dim]
        self._ram_init = None  # bool bitmap over ram_rows
        self._ssd = None  # np.memmap, grows on demand
        self._ssd_rows = 0  # allocated rows in the file
        self._ssd_index: dict[int, int] = {}  # feature id -> file row
        self._ssd_path = None
        if self.ram_rows < vocab_size:
            if spill_dir is None:
                raise ValueError("spill_dir required when table exceeds ram cap")
            Path(spill_dir).mkdir(parents=True, exist_ok=True)
            self._ssd_path = str(
                Path(spill_dir) / f"emb_spill_{id(self)}_{dim}.bin"
            )

    def _ensure_ram(self):
        if self._ram is None:
            self._ram = np.zeros((self.ram_rows, self.dim), np.float32)
            self._ram_init = np.zeros(self.ram_rows, bool)

    def _ssd_slot(self, fid: int, allocate: bool) -> int:
        s = self._ssd_index.get(fid, -1)
        if s >= 0 or not allocate:
            return s
        s = len(self._ssd_index)
        self._ssd_index[fid] = s
        self._ssd_reserve(s + 1)
        return s

    def _ssd_reserve(self, rows: int) -> None:
        """Grow the spill file to hold >= ``rows`` rows (one remap)."""
        if rows <= self._ssd_rows:
            return
        new_rows = -(-rows // self.SSD_GROW) * self.SSD_GROW
        if self._ssd is not None:
            self._ssd.flush()  # data persists in the file
        self._ssd = np.memmap(
            self._ssd_path, dtype=np.float32,
            mode="r+" if self._ssd_rows else "w+",
            shape=(new_rows, self.dim),
        )
        self._ssd_rows = new_rows

    def _ssd_slots_batch(self, fids: np.ndarray, allocate: bool) -> np.ndarray:
        """Vectorized id->file-row resolution; with ``allocate`` new ids
        get contiguous fresh slots (ONE file grow, ONE init draw) —
        the per-row python loop was ~8 us/row, this is ~0.1."""
        idx = self._ssd_index
        slots = np.fromiter(
            (idx.get(f, -1) for f in fids.tolist()), np.int64, fids.size
        )
        if not allocate:
            return slots
        miss = slots < 0
        if miss.any():
            new_fids = np.unique(fids[miss])
            base = len(idx)
            self._ssd_reserve(base + new_fids.size)
            for j, f in enumerate(new_fids.tolist()):
                idx[f] = base + j
            self._ssd[base : base + new_fids.size] = self._init_fn(
                new_fids.size
            )
            slots[miss] = np.fromiter(
                (idx[f] for f in fids[miss].tolist()), np.int64,
                int(miss.sum()),
            )
        return slots

    def read(self, ids: np.ndarray) -> np.ndarray:
        """Fetch rows by feature id (lazy-init unseen rows).

        RAM-resident ids are served with one vectorized fancy-index;
        only the (rare) uninitialized and SSD rows take the slow path.
        """
        self._ensure_ram()
        ids = np.asarray(ids, np.int64).reshape(-1)
        out = np.empty((ids.shape[0], self.dim), np.float32)
        in_ram = ids < self.ram_rows
        ram_ids = ids[in_ram]
        if ram_ids.size:
            fresh = ram_ids[~self._ram_init[ram_ids]]
            if fresh.size:
                fresh = np.unique(fresh)
                self._ram[fresh] = self._init_fn(fresh.size)
                self._ram_init[fresh] = True
            out[in_ram] = self._ram[ram_ids]
        pos = np.nonzero(~in_ram)[0]
        if pos.size:
            slots = self._ssd_slots_batch(ids[pos], allocate=True)
            out[pos] = self._ssd[slots]
        return out

    def write(self, ids: np.ndarray, rows: np.ndarray) -> None:
        self._ensure_ram()
        ids = np.asarray(ids, np.int64).reshape(-1)
        rows = np.asarray(rows, np.float32).reshape(ids.shape[0], self.dim)
        in_ram = ids < self.ram_rows
        if in_ram.any():
            self._ram[ids[in_ram]] = rows[in_ram]
            self._ram_init[ids[in_ram]] = True
        pos = np.nonzero(~in_ram)[0]
        if pos.size:
            slots = self._ssd_slots_batch(ids[pos], allocate=True)
            self._ssd[slots] = rows[pos]

    def flush(self):
        if self._ssd is not None:
            self._ssd.flush()


def cache_swap(arena: jnp.ndarray, evict_slots: jnp.ndarray,
               load_slots: jnp.ndarray, load_rows: jnp.ndarray):
    """Static-shape device swap: returns (new_arena, evicted_rows).

    ``evict_slots``/``load_slots`` are padded to a fixed length with the
    arena's last slot reserved as a scratch/dummy row (slot C)."""
    evicted = arena[evict_slots]
    new_arena = arena.at[load_slots].set(load_rows)
    return new_arena, evicted


class CachedEmbeddingTable:
    """Glue object: ties LRU manager + host tiers (+ per-state arenas).

    ``state_names`` adds row-aligned companion arenas (e.g. m, v) that
    swap together with the parameter rows.  The arena has one extra
    scratch row (index ``cache_rows``) absorbing pad slots.
    """

    def __init__(self, vocab_size: int, dim: int, cache_rows: int,
                 max_swap: int, ram_bytes: int | None = None,
                 spill_dir: str | None = None, state_names=(), seed: int = 0,
                 remote_addrs=None, table_name: str = "emb"):
        self.vocab_size = vocab_size
        self.dim = dim
        self.cache_rows = cache_rows
        self.max_swap = max_swap
        self.lru = LruCache(cache_rows)
        if remote_addrs:
            # third hierarchy level: tiers live in table-server processes
            # (PS-server equivalent; RAM cap + SSD spill are server-side)
            from mindrec_tpu.ops.remote import RemoteTier

            self.param_tier = RemoteTier(
                remote_addrs, table_name, dim, init_std=0.01, seed=seed
            )
            self.state_tiers = {
                name: RemoteTier(
                    remote_addrs, f"{table_name}.{name}", dim,
                    init_std=0.0, seed=seed,
                )
                for name in state_names
            }
        else:
            self.param_tier = HostTier(
                vocab_size, dim, ram_bytes, spill_dir, seed=seed
            )
            self.state_tiers = {
                name: HostTier(
                    vocab_size, dim, ram_bytes, spill_dir,
                    init_fn=lambda n, d=dim: np.zeros((n, d), np.float32),
                )
                for name in state_names
            }
        self.dummy_slot = cache_rows
        # id -> slot mirror of the LRU's resident set, maintained by
        # :meth:`prepare`; flush_all iterates it (works for both the
        # native LRU, which has no iteration API, and the Python one)
        self._resident: dict[int, int] = {}

    def init_arena(self, key=None) -> jnp.ndarray:
        rows = self.param_tier.read(np.arange(0))  # ensure tiers
        del rows
        return jnp.zeros((self.cache_rows + 1, self.dim), jnp.float32)

    def init_state_arena(self, name: str) -> jnp.ndarray:
        return jnp.zeros((self.cache_rows + 1, self.dim), jnp.float32)

    def prepare(self, ids: np.ndarray):
        """Host step: ids -> (slots, padded swap lists + host rows)."""
        slots, load_ids, load_slots, evict_ids, evict_slots = self.lru.lookup(ids)
        for i in evict_ids.tolist():
            self._resident.pop(i, None)
        for i, s in zip(load_ids.tolist(), load_slots.tolist()):
            self._resident[i] = s
        if (slots < 0).any():
            raise RuntimeError(
                "cache thrash: batch needs more distinct rows than cache_rows"
            )
        k = self.max_swap
        if load_ids.shape[0] > k or evict_ids.shape[0] > k:
            raise RuntimeError(
                f"swap overflow: load={load_ids.shape[0]} evict={evict_ids.shape[0]} > max_swap={k}"
            )

        def pad_slots(s):
            out = np.full(k, self.dummy_slot, np.int64)
            out[: s.shape[0]] = s
            return out

        load_rows = {
            "param": np.zeros((k, self.dim), np.float32),
        }
        load_rows["param"][: load_ids.shape[0]] = self.param_tier.read(load_ids)
        for name, tier in self.state_tiers.items():
            r = np.zeros((k, self.dim), np.float32)
            r[: load_ids.shape[0]] = tier.read(load_ids)
            load_rows[name] = r
        return {
            "slots": slots.reshape(np.asarray(ids).shape).astype(np.int32),
            "load_slots": pad_slots(load_slots).astype(np.int32),
            "evict_slots": pad_slots(evict_slots).astype(np.int32),
            "load_rows": load_rows,
            "evict_ids": evict_ids,
            "n_evict": evict_ids.shape[0],
        }

    def writeback(self, evict_ids: np.ndarray, evicted_rows: dict):
        """Persist evicted (dirty) rows to the host tiers."""
        n = evict_ids.shape[0]
        if n == 0:
            return
        self.param_tier.write(evict_ids, np.asarray(evicted_rows["param"])[:n])
        for name, tier in self.state_tiers.items():
            tier.write(evict_ids, np.asarray(evicted_rows[name])[:n])

    def flush_all(self, arena, state_arenas: dict):
        """Write every resident row back to the host tiers (checkpoint)."""
        items = list(self._resident.items())
        if not items:
            return
        ids = np.array([k for k, _ in items], np.int64)
        slots = np.array([s for _, s in items], np.int64)
        arena_np = np.asarray(arena)
        self.param_tier.write(ids, arena_np[slots])
        for name, tier in self.state_tiers.items():
            tier.write(ids, np.asarray(state_arenas[name])[slots])
        self.param_tier.flush()
