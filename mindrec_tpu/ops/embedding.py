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
    """Static description of one embedding table and its placement regime.

    Storage convention (TPU-first): *sparse* tables are stored
    **feature-major** ``[R*emb_dim, padded_vocab // R]`` where ``R`` is
    the :attr:`fold` factor.  Rationale: XLA TPU pads the minor dim of a
    row-major ``[V, D<128]`` array to 128 lanes (8x memory for D=16,
    128x for D=1 — an OOM at the reference's 5.86M-row benchmark vocab);
    feature-major puts the huge vocab axis minor-most so padding is
    negligible, and it is the layout XLA itself prefers for narrow
    arrays, so no relayout copies appear around the Pallas streamed
    kernels.  ``fold`` packs R=8/emb_dim logical rows per storage column
    for skinny tables (the wide ``[V, 1]`` table) so the 8-sublane
    physical minimum isn't wasted: logical row ``i`` lives at
    ``storage[(i % R) * D : (i % R + 1) * D, i // R]``.
    """

    vocab_size: int
    emb_dim: int
    name: str = "embedding"
    slice_mode: str = "none"  # none | table_row_slice | table_column_slice
    # "host": the table never lives in HBM — rows travel per step and the
    # optimizer applies host-side (train/host_target.py; reference
    # CPU-target EmbeddingLookup + optimizer.target="CPU",
    # wide_and_deep.py:217,431-433).  The HBM-cache regime is configured
    # on the ADAPTER (CachedTrainingAdapter cache_rows), not the spec.
    target: str = "device"  # device | host
    sparse: bool = False  # row-sparse grad/optimizer path
    init: str = "normal"
    init_args: tuple = (-0.01, 0.01)
    max_norm: Optional[float] = None
    # table storage precision.  "bfloat16" halves the dominant HBM
    # streams of sparse training (the gather and optimizer kernels pump
    # the whole table through VMEM); update arithmetic stays f32 — only
    # the stored parameter rounds (the optimizer moments' precision is
    # the optimizer's state_dtype knob).  Quality gate:
    # tests/test_accuracy.py::test_bf16_table_matches_f32_auc
    dtype: str = "float32"  # float32 | bfloat16

    # Storage layout for sparse tables:
    # * "row_packed" — [rows, 128] with ``pack`` logical rows per
    #   512-byte storage row.  The forward gather is then ONE native XLA
    #   row gather touching only ~U sectors (the fastest gather shape on
    #   this hardware — benchmarks/sweep_gather_r5.py measured the
    #   packed gather+extract at 2.2 ms vs 4.7 ms for streaming the full
    #   [Dp, Vc] table at the W&D bench shape), and the optimizer
    #   streams row tiles with full 128-lane MXU utilization
    #   (ops/pallas/stream_update_rows.py).
    # * "feature_major" — [Dp, Vc] with the vocab axis minor-most; the
    #   layout the row/column-sliced sharded streaming path composes
    #   with (ops/sharded_stream.py) and the narrow layout XLA prefers
    #   for un-packed tables.
    # * "auto" — row_packed for unsharded device tables, feature_major
    #   for sharded ones.
    layout: str = "auto"  # auto | row_packed | feature_major

    # 8192 keeps tables divisible by any mesh axis and by the streamed
    # Pallas kernels' tile sizes even after the fold divides the vocab
    # axis by up to 8
    row_alignment: int = 8192

    @property
    def padded_vocab(self) -> int:
        """Logical row count: +1 dummy row for padded/sentinel ids, +7
        spare so the LAST storage column never contains a trainable id
        (the generic sparse path uses it as its unique-padding fill
        target), then rounded up to ``row_alignment`` so the table
        divides evenly over any mesh axis (sharding) and tiles cleanly."""
        n = self.vocab_size + 8
        a = self.row_alignment
        return (n + a - 1) // a * a

    @property
    def dummy_id(self) -> int:
        return self.vocab_size

    @property
    def row_packed(self) -> bool:
        """512-byte packed-row storage (see ``layout``)."""
        if not self.sparse or self.emb_dim > 128:
            return False
        if self.layout == "row_packed":
            return True
        if self.layout == "feature_major":
            return False
        # auto: the packed gather needs the whole row local; sharded and
        # host-resident tables keep the feature-major streaming layout
        return self.slice_mode == "none" and self.target == "device"

    @property
    def feature_major(self) -> bool:
        return self.sparse and not self.row_packed

    @property
    def pack(self) -> int:
        """Logical rows per 128-lane storage row (row_packed layout);
        power of two so alignment padding always divides."""
        if not self.row_packed:
            return 1
        p = 1
        while p * 2 * self.emb_dim <= 128 and p * 2 <= 128:
            p *= 2
        return p

    @property
    def packed_rows(self) -> int:
        """Storage row count of the row_packed layout, padded so the
        streaming update tiles (<= 2048 rows) divide it evenly."""
        n = -(-self.padded_vocab // self.pack)
        return (n + 2047) // 2048 * 2048

    @property
    def fold(self) -> int:
        """R logical rows per storage column (8 for scalar tables)."""
        if not self.feature_major:
            return 1
        return 8 if self.emb_dim == 1 else 1

    @property
    def padded_dim(self) -> int:
        """Storage sublane count: emb_dim rounded up to the 8-sublane
        physical minimum (padding sublanes are zero and sliced away on
        gather; zero grads keep them zero under ftrl/adam/sgd)."""
        if not self.feature_major:
            return self.emb_dim
        return max(8, (self.emb_dim + 7) // 8 * 8) if self.fold == 1 else 8

    @property
    def storage_shape(self) -> tuple[int, int]:
        if self.row_packed:
            return (self.packed_rows, 128)
        if self.feature_major:
            return (self.padded_dim, self.padded_vocab // self.fold)
        return (self.padded_vocab, self.emb_dim)

    def partition_spec(self) -> P:
        if self.row_packed:
            if self.slice_mode != "none":
                raise ValueError(
                    "row_packed layout does not shard; use feature_major "
                    f"for slice_mode={self.slice_mode!r}"
                )
            return P(None, None)
        # feature-major storage flips the axes: vocab is dim 1
        row, col = ("model", None)
        if self.feature_major:
            row, col = col, row
        if self.slice_mode == "table_row_slice":
            return P(row, col)
        if self.slice_mode == "table_column_slice":
            return P(col, row)
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
        # draw in LOGICAL [padded_vocab, emb_dim] shape so dense and
        # sparse (feature-major) inits of the same spec are bit-identical
        logical = _init_rows(
            key, (spec.padded_vocab, spec.emb_dim), spec.init, spec.init_args
        )
        # dummy + alignment-padding rows are zeros so accidental reads
        # contribute nothing
        logical = logical.at[spec.dummy_id :].set(0.0)
        table = to_storage(spec, logical).astype(getattr(jnp, spec.dtype))
        if self.mesh is not None and spec.slice_mode != "none":
            table = jax.device_put(table, spec.sharding(self.mesh))
        return table

    def __call__(self, table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
        """Gather rows; ids of any shape -> ``ids.shape + [emb_dim]``."""
        spec = self.spec
        if spec.row_packed:
            flat = ids.reshape(-1)
            out = packed_gather(spec, table, flat).reshape(
                ids.shape + (spec.emb_dim,)
            )
        elif spec.feature_major:
            r, d = spec.fold, spec.emb_dim
            flat = ids.reshape(-1)
            cols = flat // r if r > 1 else flat
            g = jnp.take(table, cols, axis=1)[: r * d]  # drop sublane padding
            g = g.T.reshape(ids.shape + (r, d))
            if r > 1:
                sub = (flat % r).reshape(ids.shape)
                out = jnp.take_along_axis(g, sub[..., None, None], axis=-2)
                out = out[..., 0, :]
            else:
                out = g[..., 0, :]
        else:
            out = jnp.take(table, ids, axis=0)
        if self.spec.max_norm is not None:
            norms = jnp.linalg.norm(out, axis=-1, keepdims=True)
            scale = jnp.minimum(1.0, self.spec.max_norm / jnp.maximum(norms, 1e-12))
            out = out * scale
        return out


# ---------------------------------------------------------------------------
# storage-convention helpers: logical-row access over either layout
# ---------------------------------------------------------------------------


def packed_gather(spec: EmbeddingTableSpec, table, ids) -> "jnp.ndarray":
    """Traceable gather of logical rows from row_packed storage:
    ONE native 512-byte-row gather (the fastest gather shape on TPU —
    benchmarks/permute_layouts.py / sweep_gather_r5.py) + a fold-style
    lane extract done in the gathered (small-footprint) space.

    ``ids`` flat i32 (sentinels/overflow clip to the last padding row,
    whose value is irrelevant because callers mask or never read those
    outputs).  Returns ``[n, emb_dim]`` in the table's dtype."""
    p, d = spec.pack, spec.emb_dim
    rows = jnp.take(table, ids // p, axis=0, mode="clip")  # [n, 128]
    if p == 1:
        return rows[:, :d]
    sub = (ids % p).astype(jnp.int32)
    r3 = rows[:, : p * d].reshape(-1, p, d)
    m = (
        jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], p), 1)
        == sub[:, None]
    )
    return jnp.sum(r3 * m[..., None].astype(r3.dtype), axis=1)


def packed_expand(spec: EmbeddingTableSpec, vals, sub) -> "jnp.ndarray":
    """Inverse of the lane extract: place ``vals [n, emb_dim]`` into the
    fold-sub lane window ``[sub*d, (sub+1)*d)`` of 128-lane rows (other
    lanes zero).  Used to turn per-logical-row gradients into the
    row_packed update kernels' lane layout."""
    p, d = spec.pack, spec.emb_dim
    n = vals.shape[0]
    if p == 1:
        out = vals
    else:
        m = (
            jax.lax.broadcasted_iota(jnp.int32, (n, p), 1)
            == sub.astype(jnp.int32)[:, None]
        )
        out = (m[..., None].astype(vals.dtype) * vals[:, None, :]).reshape(
            n, p * d
        )
    if p * d < 128:
        out = jnp.concatenate(
            [out, jnp.zeros((n, 128 - p * d), out.dtype)], axis=1
        )
    return out


def to_storage(spec: EmbeddingTableSpec, logical: jnp.ndarray) -> jnp.ndarray:
    """[padded_vocab, emb_dim] logical table -> storage layout."""
    if spec.row_packed:
        p, d = spec.pack, spec.emb_dim
        vr = spec.packed_rows
        pad_rows = vr * p - spec.padded_vocab
        if pad_rows:
            logical = jnp.concatenate(
                [logical, jnp.zeros((pad_rows, d), logical.dtype)]
            )
        t = logical.reshape(vr, p * d)  # row r lanes [s*d, (s+1)*d) = row r*p+s
        if p * d < 128:
            t = jnp.concatenate(
                [t, jnp.zeros((vr, 128 - p * d), t.dtype)], axis=1
            )
        return t
    if not spec.feature_major:
        return logical
    r, d, dp = spec.fold, spec.emb_dim, spec.padded_dim
    vc = spec.padded_vocab // r
    if r > 1:
        return logical.reshape(vc, r * d).T  # fold: col c sub i = row c*r+i
    t = logical.T  # [D, Vp]
    if dp > d:
        t = jnp.concatenate([t, jnp.zeros((dp - d, t.shape[1]), t.dtype)])
    return t


def from_storage(spec: EmbeddingTableSpec, storage) -> np.ndarray:
    """Storage layout -> logical [padded_vocab, emb_dim] (host-side)."""
    arr = np.asarray(storage)
    if spec.row_packed:
        p, d = spec.pack, spec.emb_dim
        flat = arr[:, : p * d].reshape(-1, d)
        return flat[: spec.padded_vocab]
    if not spec.feature_major:
        return arr
    r, d = spec.fold, spec.emb_dim
    if r > 1:
        return arr.T.reshape(spec.padded_vocab, d)
    return arr[:d].T


def read_rows(spec: EmbeddingTableSpec, storage, ids) -> np.ndarray:
    """Logical rows ``[len(ids), emb_dim]`` from a table in either
    storage convention (host-side, numpy)."""
    arr = np.asarray(storage)
    ids = np.asarray(ids).reshape(-1)
    if spec.row_packed:
        p, d = spec.pack, spec.emb_dim
        lanes = (ids % p)[:, None] * d + np.arange(d)[None, :]
        return arr[(ids // p)[:, None], lanes]
    if not spec.feature_major:
        return arr[ids]
    r, d = spec.fold, spec.emb_dim
    dp, vc = arr.shape
    if r == 1:
        return arr[:d, ids].T
    return arr.reshape(r, d, vc)[ids % r, :, ids // r]


def write_rows(spec: EmbeddingTableSpec, storage, ids, rows):
    """Set logical rows; returns the updated jax array."""
    import jax.numpy as _jnp

    ids = np.asarray(ids).reshape(-1)
    rows = np.asarray(rows).reshape(len(ids), spec.emb_dim)
    if spec.row_packed:
        p, d = spec.pack, spec.emb_dim
        arr = np.array(storage)  # host copy; row writes are rare
        lanes = (ids % p)[:, None] * d + np.arange(d)[None, :]
        arr[(ids // p)[:, None], lanes] = rows
        return _jnp.asarray(arr)
    if not spec.feature_major:
        return _jnp.asarray(storage).at[_jnp.asarray(ids)].set(_jnp.asarray(rows))
    r, d = spec.fold, spec.emb_dim
    arr = np.array(storage)  # host copy; row writes are rare (evict/import)
    dp, vc = arr.shape
    if r == 1:
        arr[:d, ids] = rows.T
    else:
        arr.reshape(r, d, vc)[ids % r, :, ids // r] = rows
    return _jnp.asarray(arr)


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
