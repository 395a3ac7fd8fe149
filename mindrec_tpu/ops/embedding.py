"""Embedding tables and lookups, TPU-native.

Covers the reference's embedding regime matrix
(``models/wide_deep/src/wide_and_deep.py:215-291`` +
``mindspore_rec/ops/embedding.py:47-206``):

  {fixed tensor table | hash table} x {device | host | cached}
  x {whole | row-sliced | column-sliced}

Design differences from the reference (deliberate, TPU-first):

* Tables are plain jax arrays of shape ``[vocab_size + 1, emb_dim]``
  — one extra *dummy row* at index ``vocab_size`` absorbs padded
  lookups / padded unique ids so every shape stays static under jit.
* Sharding is declared with ``jax.sharding.NamedSharding`` over a mesh
  axis ("row slice" = shard dim 0, "column slice" = shard dim 1);
  XLA GSPMD inserts the all-to-all / all-gather collectives that the
  reference gets from MindSpore's AUTO_PARALLEL engine.
* The dynamic-hash path (reference ``MapParameter``) maps arbitrary
  int64 ids -> dense slots on the host (C++ store), and the device only
  ever sees a dense ``[capacity, dim]`` arena — the same trick the
  reference uses for its PS-cache worker path
  (``mindspore_rec/ops/embedding.py:112-130``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def _init_rows(key, shape, method: str, init_args) -> jnp.ndarray:
    if method == "normal":
        # Reference 'normal' init uses init_args as (mean-ish range); MindRec
        # uses Normal(sigma) seeded defaults — we use N(0, 0.01) to match the
        # effective scale of init_args (-0.01, 0.01).
        return 0.01 * jax.random.normal(key, shape, dtype=jnp.float32)
    if method == "uniform":
        lo, hi = init_args
        return jax.random.uniform(key, shape, jnp.float32, lo, hi)
    if method == "zero":
        return jnp.zeros(shape, jnp.float32)
    if method == "one":
        return jnp.ones(shape, jnp.float32)
    raise ValueError(f"unknown init method: {method}")


@dataclasses.dataclass(frozen=True)
class EmbeddingTableSpec:
    """Static description of one embedding table and its placement regime."""

    vocab_size: int
    emb_dim: int
    name: str = "embedding"
    slice_mode: str = "none"  # none | table_row_slice | table_column_slice
    target: str = "device"  # device | host
    vocab_cache_size: int = 0  # >0: only a cache of this many rows is in HBM
    sparse: bool = False  # row-sparse grad/optimizer path
    init: str = "normal"
    init_args: tuple = (-0.01, 0.01)
    max_norm: Optional[float] = None

    # 1024 keeps tables divisible by any mesh axis AND by the streamed
    # Pallas kernels' tile sizes (powers of two up to 2048)
    row_alignment: int = 1024

    @property
    def padded_vocab(self) -> int:
        """Physical row count: +1 dummy row for padded/sentinel ids, then
        rounded up to ``row_alignment`` so the table divides evenly over
        any mesh axis (sharding) and tiles cleanly."""
        n = self.vocab_size + 1
        a = self.row_alignment
        return (n + a - 1) // a * a

    @property
    def dummy_id(self) -> int:
        return self.vocab_size

    def partition_spec(self) -> P:
        if self.slice_mode == "table_row_slice":
            return P("model", None)
        if self.slice_mode == "table_column_slice":
            return P(None, "model")
        if self.slice_mode == "none":
            return P(None, None)
        raise ValueError(f"unknown slice_mode: {self.slice_mode}")

    def sharding(self, mesh) -> NamedSharding:
        return NamedSharding(mesh, self.partition_spec())


class EmbeddingLookup:
    """Fixed-size embedding table (reference ``nn.EmbeddingLookup`` regimes).

    Functional: ``init`` makes the table array; ``__call__`` gathers.
    The table is an explicit argument so it lives in the caller's param
    pytree and composes with jit/grad/sharding.
    """

    def __init__(self, spec: EmbeddingTableSpec, mesh=None):
        self.spec = spec
        self.mesh = mesh

    def init(self, key) -> jnp.ndarray:
        spec = self.spec
        table = _init_rows(
            key, (spec.padded_vocab, spec.emb_dim), spec.init, spec.init_args
        )
        # dummy + alignment-padding rows are zeros so accidental reads
        # contribute nothing
        table = table.at[spec.dummy_id :].set(0.0)
        if self.mesh is not None and spec.slice_mode != "none":
            table = jax.device_put(table, spec.sharding(self.mesh))
        return table

    def __call__(self, table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
        """Gather rows; ids of any shape -> ``ids.shape + [emb_dim]``."""
        out = jnp.take(table, ids, axis=0)
        if self.spec.max_norm is not None:
            norms = jnp.linalg.norm(out, axis=-1, keepdims=True)
            scale = jnp.minimum(1.0, self.spec.max_norm / jnp.maximum(norms, 1e-12))
            out = out * scale
        return out


class HashEmbeddingLookup:
    """Dynamic-vocabulary embedding lookup (reference ``HashEmbeddingLookup``,
    ``mindspore_rec/ops/embedding.py:47-206``).

    Arbitrary int32/int64 keys (−1 and −2 reserved, as in the reference
    docstring ``embedding.py:50-57``) are mapped to dense slots of a
    fixed-capacity HBM arena by a host-side hash store which also tracks
    feature *admission* (``permit_filter_value``: a key must be seen in at
    least that many steps before it gets a real slot) and *eviction*
    (``evict_filter_value``: keys untouched for that many steps are
    erased).  The device-side compute is a plain dense gather over the
    arena — identical static-shape code to :class:`EmbeddingLookup`.

    The id->slot translation happens in the input pipeline (host), so the
    jitted step never sees a dynamic shape.
    """

    RESERVED_KEYS = (-1, -2)

    def __init__(
        self,
        embedding_size: int,
        capacity: int = 1 << 20,
        default_value: str | float = "normal",
        permit_filter_value: int = 1,
        evict_filter_value: int = 0x7FFFFFFF,
        max_norm: Optional[float] = None,
        seed: int = 0,
        store=None,
    ):
        if permit_filter_value < 1:
            raise ValueError("permit_filter_value must be >= 1")
        if evict_filter_value < 1:
            raise ValueError("evict_filter_value must be >= 1")
        self.embedding_size = embedding_size
        self.capacity = capacity
        self.default_value = default_value
        self.permit_filter_value = permit_filter_value
        self.evict_filter_value = evict_filter_value
        self.max_norm = max_norm
        self._rng = np.random.default_rng(seed)
        if store is None:
            from mindrec_tpu.native.hashstore import HashStore

            store = HashStore(
                capacity=capacity,
                permit_threshold=permit_filter_value,
                evict_threshold=evict_filter_value,
            )
        self.store = store
        # Slot arena: [capacity + 1, dim]; last row = dummy (not-admitted /
        # padded keys land there and read zeros).
        self.dummy_slot = capacity

    def init(self, key) -> jnp.ndarray:
        if isinstance(self.default_value, str):
            arena = _init_rows(
                key, (self.capacity + 1, self.embedding_size), self.default_value, ()
            )
        else:
            arena = jnp.full(
                (self.capacity + 1, self.embedding_size),
                float(self.default_value),
                jnp.float32,
            )
        return arena.at[self.dummy_slot].set(0.0)

    def map_ids(self, ids: np.ndarray) -> np.ndarray:
        """Host-side: translate raw feature ids -> arena slots.

        Applies admission (ids below the permit threshold map to the dummy
        slot) and advances the store's step clock / eviction bookkeeping.
        """
        slots = self.store.lookup_or_insert(np.asarray(ids).reshape(-1))
        slots = np.where(slots < 0, self.dummy_slot, slots)
        return slots.reshape(np.asarray(ids).shape).astype(np.int32)

    def evict_step(self) -> np.ndarray:
        """Advance the eviction clock; returns slots freed this step."""
        return self.store.evict()

    def __call__(self, arena: jnp.ndarray, slots: jnp.ndarray) -> jnp.ndarray:
        out = jnp.take(arena, slots, axis=0)
        if self.max_norm is not None:
            norms = jnp.linalg.norm(out, axis=-1, keepdims=True)
            scale = jnp.minimum(1.0, self.max_norm / jnp.maximum(norms, 1e-12))
            out = out * scale
        return out

    # -- incremental checkpoint (reference: hash-table import/export,
    #    RELEASE.md:18) ------------------------------------------------
    def export_table(self, arena) -> tuple[np.ndarray, np.ndarray]:
        """Return (keys, vectors) for all admitted keys."""
        keys, slots = self.store.items()
        arena_np = np.asarray(arena)
        return keys, arena_np[slots]

    def import_table(self, arena, keys: np.ndarray, vectors: np.ndarray):
        slots = self.store.lookup_or_insert(np.asarray(keys).reshape(-1), force=True)
        ok = slots >= 0
        arena = jnp.asarray(np.asarray(arena)).at[slots[ok]].set(
            jnp.asarray(vectors[ok])
        )
        return arena
