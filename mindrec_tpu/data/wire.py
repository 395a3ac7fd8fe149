"""Compact host->device wire format for transfer-bound links.

The sparse-training batch is mostly *narrow integers dressed as wide
ones*: criteo ids fit 23 bits but travel as int32, sort metadata values
are bounded by ``B*F`` (~20 bits at bs 16000x39), labels are one bit,
and feature weights tolerate bfloat16 (the model casts rows to bf16 for
the MXU anyway).  On a host whose link to the device is slow relative
to the step time — the dev rig's ~60 MB/s tunnel, or a many-chips-per-
host PCIe fan-out — the transfer is the pipeline bottleneck
(``benchmarks/PROFILE_r03.md`` §1), and shrinking bytes-on-the-wire is
the only lever left once prep already overlaps.

:class:`BatchWire` packs a batch on the host (cheap numpy passes inside
the prep pool) and decodes it on the *device* inside one small jitted
elementwise function.  Decoded batches are bit-identical in dtype and
shape to the un-packed layout, so the trainer's compiled step trace is
shared with the uncompressed path (ids/label/metadata round-trip
exactly; ``wts`` optionally rounds to bf16 — disable with
``lossy=()`` for exact parity).

Reference analog: the MindData dataset-sink device queue moves
host-prepared tensors to the accelerator
(``mindspore_rec/train/rec_model.py:124-131``); its 256MB-per-transfer
Ascend limit is the same class of constraint this module optimizes.

Codecs (per key, planned once from static bounds):

* ``int(bound)`` — values in ``[0, bound)`` plus optionally the shared
  int32 sentinel ``2**31 - 2`` (sentinel travels as code ``bound``).
  1/2/4-byte native dtypes, or 3-byte little-endian split across a
  trailing axis when ``bound`` fits 24 bits but not 16 (criteo vocab
  5.86M: 3 bytes, a 25% cut on every id-sized tensor).
* ``bf16`` — lossy float16-mantissa floats (feature weights).
* ``bit`` — {0,1} floats as uint8 (labels).
* unknown keys pass through untouched.

**Arena transport** (default): every encoded key is packed into ONE
contiguous uint8 buffer and the device decode slices + bitcasts it
back.  Measured through the dev tunnel (``benchmarks/transfer_probe.py``),
each ``device_put`` carries a ~10-20 ms *fixed* cost regardless of
size — three per-key puts per batch cost more than the payload itself.
One put per batch amortizes that to once, and a single flat u8 buffer
is also the friendliest shape for the transport (no per-row layout
chunking).  ``arena=False`` keeps per-key encoded arrays (tests,
sharded staging).
"""

from __future__ import annotations

import numpy as np

SENTINEL = np.int32(2**31 - 2)  # shared padding sentinel (train/step.py)
ARENA_KEY = "__wire__"


def _int_nbytes(n_codes: int) -> int:
    """Bytes per value to hold codes ``[0, n_codes]`` (inclusive: the
    sentinel code equals ``bound``)."""
    if n_codes < (1 << 8):
        return 1
    if n_codes < (1 << 16):
        return 2
    if n_codes < (1 << 24):
        return 3
    return 4


class BatchWire:
    """Plan + host encoder + device decoder for one batch layout.

    ``bounds``: {key: exclusive int upper bound}.  Keys listed in
    ``sentinel_keys`` may additionally contain :data:`SENTINEL` values
    (e.g. the padded ``uq_ids`` buffer).  ``lossy``: float keys sent as
    bf16.  ``bit``: {0,1} float keys sent as uint8.  ``raw``: keys
    carried bit-exactly (f32/i32) but still packed into the arena.
    ``arena``: pack all planned keys into one u8 buffer (one
    ``device_put`` per batch); unplanned keys always pass through as
    separate arrays.
    """

    def __init__(self, bounds: dict[str, int] | None = None,
                 sentinel_keys: tuple[str, ...] = (),
                 lossy: tuple[str, ...] = ("wts",),
                 bit: tuple[str, ...] = ("label",),
                 raw: tuple[str, ...] = (),
                 arena: bool = True):
        self.bounds = dict(bounds or {})
        self.sentinel_keys = tuple(sentinel_keys)
        self.lossy = tuple(lossy)
        self.bit = tuple(bit)
        self.raw = tuple(raw)
        self.arena = arena
        self._layout = None  # [(key, kind, param, shape, off, nbytes)]
        self._sig = None
        for k in self.sentinel_keys:
            if k not in self.bounds:
                raise ValueError(f"sentinel key {k!r} needs a bound")

    def _kind(self, key: str):
        """-> (kind, param) or None for passthrough."""
        if key in getattr(self, "fids", {}):
            return ("fids", self.fids[key])
        if key in getattr(self, "fwts", {}):
            return ("fwts", self.fwts[key])
        if key in self.bounds:
            return ("int", self.bounds[key])
        if key in self.lossy:
            return ("bf16", None)
        if key in self.bit:
            return ("bit", None)
        if key in self.raw:
            return ("raw", None)
        return None

    # -- plan construction ------------------------------------------------

    @classmethod
    def for_sparse(cls, vocab_size: int, batch_size: int, field_size: int,
                   host_prep: bool = False, bucket: int | None = None,
                   lossy_wts: bool = True, arena: bool = True) -> "BatchWire":
        """Plan for the single-group criteo sparse batch contract.

        ``host_prep=False``: raw batches (ids/wts/label) — the
        device-prep mode.  ``host_prep=True``: additionally packs the
        minimal-prep metadata (``perm``/``uidx``/``uidx_sorted`` bounded
        by ``B*F``; ``uq_ids`` bounded by the vocab, sentinel-padded and
        optionally trimmed to ``bucket``).
        """
        n = batch_size * field_size
        bounds = {"ids": int(vocab_size)}
        sent = ()
        if host_prep:
            bounds.update(perm=n, uidx=n, uidx_sorted=n,
                          uq_ids=int(vocab_size))
            sent = ("uq_ids",)
        del bucket  # bounds don't depend on the trim length
        return cls(bounds, sentinel_keys=sent,
                   lossy=("wts",) if lossy_wts else (),
                   raw=() if lossy_wts else ("wts",), arena=arena)

    @classmethod
    def for_fields(cls, field_sizes, batch_size: int,
                   wt_value_fields=(), lossy_wts: bool = True,
                   validate: bool = True) -> "BatchWire":
        """Schema-aware plan: per-FIELD id widths + value-only weights.

        ``field_sizes``: per-field id-range sizes (the preprocessing
        stats / :func:`~mindrec_tpu.data.criteo.criteo_field_sizes`);
        ids are stored field-relative, so a 64-bucket dense column costs
        ONE byte and most criteo categoricals two — ~62 B/sample vs 117
        for flat 3-byte ids.  ``wt_value_fields``: columns whose weight
        actually varies (criteo: the 13 dense columns; categorical
        weights are the constant 1.0 the decode re-materializes —
        reference ``datasets.py`` packs cat weights as 1.0).  Arena
        transport only."""
        sizes = np.asarray(field_sizes, np.int64)
        offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
        widths = np.array([_int_nbytes(int(s)) for s in sizes], np.int64)
        w = cls({}, lossy=(), bit=("label",), arena=True)
        w.fids = {"ids": (offsets, sizes, widths, bool(validate))}
        w.fwts = {"wts": (tuple(int(c) for c in wt_value_fields),
                          int(sizes.size), bool(lossy_wts))}
        w.field_sizes = sizes
        return w

    # -- host side --------------------------------------------------------

    def encode(self, batch: dict) -> dict:
        """numpy batch -> packed numpy batch (new dict, shared buffers
        for passthrough keys).  Arena mode returns the planned keys as
        ONE flat uint8 buffer under :data:`ARENA_KEY`."""
        if not self.arena:
            out = {}
            for k, v in batch.items():
                kp = self._kind(k)
                if kp is None:
                    out[k] = v
                elif kp[0] == "int":
                    out[k] = self._encode_int(k, np.asarray(v))
                elif kp[0] == "bf16":
                    import ml_dtypes

                    out[k] = np.asarray(v).astype(ml_dtypes.bfloat16)
                elif kp[0] == "bit":
                    out[k] = np.asarray(v).astype(np.uint8)
                else:  # raw
                    out[k] = v
            return out
        out, segs, layout, off = {}, [], [], 0
        for k in sorted(batch):
            v = np.asarray(batch[k])
            kp = self._kind(k)
            if kp is None:
                out[k] = batch[k]
                continue
            b = self._encode_bytes(k, v, kp)
            layout.append((k, kp[0], kp[1], v.shape, str(v.dtype), off, b.size))
            segs.append(b)
            off += b.size
        sig = tuple((l[0], l[3], l[4]) for l in layout)
        if self._layout is None:
            self._layout, self._sig = layout, sig
        elif sig != self._sig:
            raise ValueError(
                "arena layout changed between batches (key/shape/dtype "
                "drift); the wire plans a static layout"
            )
        out[ARENA_KEY] = (
            np.concatenate(segs) if segs else np.zeros(0, np.uint8)
        )
        return out

    def _encode_bytes(self, key: str, v: np.ndarray, kp) -> np.ndarray:
        """One planned key -> flat little-endian uint8 segment."""
        kind, param = kp
        if kind == "fids":
            offsets, sizes, widths, validate = param
            rel = v.astype(np.int64) - offsets[None, :]
            if validate and (
                (rel < 0).any() or (rel >= sizes[None, :]).any()
            ):
                bad = np.argwhere((rel < 0) | (rel >= sizes[None, :]))[0]
                raise ValueError(
                    f"id out of its field range at (row, field)="
                    f"{tuple(bad)}: field sizes say "
                    f"[{offsets[bad[1]]}, {offsets[bad[1]] + sizes[bad[1]]})"
                )
            segs = []
            for w in (1, 2, 3, 4):
                cols = np.flatnonzero(widths == w)
                if cols.size == 0:
                    continue
                sub = np.ascontiguousarray(rel[:, cols])
                if w == 1:
                    segs.append(sub.astype(np.uint8).reshape(-1))
                elif w == 2:
                    segs.append(
                        sub.astype(np.uint16).view(np.uint8).reshape(-1)
                    )
                elif w == 3:
                    b = np.ascontiguousarray(sub.astype("<i4")).view(np.uint8)
                    segs.append(
                        b.reshape(sub.shape + (4,))[..., :3].copy().reshape(-1)
                    )
                else:
                    segs.append(
                        sub.astype(np.int32).view(np.uint8).reshape(-1)
                    )
            return np.concatenate(segs)
        if kind == "fwts":
            value_cols, _F, lossy_wts = param
            sub = np.ascontiguousarray(v[:, list(value_cols)])
            if lossy_wts:
                import ml_dtypes

                return sub.astype(ml_dtypes.bfloat16).view(np.uint8).reshape(-1)
            return sub.astype(np.float32).view(np.uint8).reshape(-1)
        if kind == "int":
            e = self._encode_int(key, v)
            if e.dtype == np.uint8 and e.ndim == v.ndim + 1:
                return e.reshape(-1)  # 3-byte lane, already bytes
            return np.ascontiguousarray(e).view(np.uint8).reshape(-1)
        if kind == "bf16":
            import ml_dtypes

            e = np.ascontiguousarray(v.astype(ml_dtypes.bfloat16))
            return e.view(np.uint8).reshape(-1)
        if kind == "bit":
            return v.astype(np.uint8).reshape(-1)
        # raw: bit-exact bytes
        if v.dtype not in (np.float32, np.int32):
            raise ValueError(f"raw wire key {key!r} must be f32/i32, "
                             f"got {v.dtype}")
        return np.ascontiguousarray(v).view(np.uint8).reshape(-1)

    def _encode_int(self, key: str, v: np.ndarray) -> np.ndarray:
        bound = self.bounds[key]
        if key in self.sentinel_keys:
            v = np.where(v == SENTINEL, np.int32(bound), v.astype(np.int32))
        nb = _int_nbytes(bound)
        if nb == 1:
            return v.astype(np.uint8)
        if nb == 2:
            return v.astype(np.uint16)
        if nb == 3:
            # little-endian 3-byte split on a new trailing axis
            b = np.ascontiguousarray(v.astype("<i4")).view(np.uint8)
            return b.reshape(v.shape + (4,))[..., :3].copy()
        return v.astype(np.int32)

    def wire_bytes(self, batch: dict) -> int:
        """Payload size of ``encode(batch)`` without encoding it."""
        total = 0
        for k, v in batch.items():
            a = np.asarray(v)
            kp = self._kind(k)
            if kp is None or kp[0] == "raw":
                total += a.nbytes
            elif kp[0] == "int":
                total += a.size * _int_nbytes(kp[1])
            elif kp[0] == "bf16":
                total += a.size * 2
            elif kp[0] == "fids":
                total += a.shape[0] * int(kp[1][2].sum())
            elif kp[0] == "fwts":
                total += a.shape[0] * len(kp[1][0]) * (2 if kp[1][2] else 4)
            else:
                total += a.size
        return total

    # -- device side ------------------------------------------------------

    def decoder(self, jit: bool = True, donate: bool = False):
        """-> ``decode(packed_batch) -> batch`` restoring int32/f32
        layouts; traceable (jnp only), jitted by default.  In arena
        mode the layout is planned by the first :meth:`encode` call, so
        the returned function must first run after at least one encode
        (the pipeline guarantees this: decode consumes encode's
        output).  ``donate`` is off by default: the packed u8 buffers
        never alias the decoded outputs, so donation only emits
        "unusable donation" warnings."""
        import jax
        import jax.numpy as jnp

        bounds, sent = self.bounds, set(self.sentinel_keys)
        lossy, bit = set(self.lossy), set(self.bit)

        def _restore_sentinel(k, v):
            if k in sent:
                v = jnp.where(v == jnp.int32(bounds[k]),
                              jnp.int32(SENTINEL), v)
            return v

        def _combine_le(b, n):
            """[N, n] u8 -> [N] uint32 little-endian."""
            v = b[..., 0].astype(jnp.uint32)
            for i in range(1, n):
                v = v | (b[..., i].astype(jnp.uint32) << (8 * i))
            return v

        def _dec_fids(seg, param, shape):
            offsets, sizes, widths, _validate = param
            B = shape[0]
            parts, perm, o = [], [], 0
            for w in (1, 2, 3, 4):
                cols = np.flatnonzero(widths == w)
                if cols.size == 0:
                    continue
                nb = B * cols.size * w
                sub = jax.lax.slice(seg, (o,), (o + nb,))
                o += nb
                if w == 1:
                    v = sub.astype(jnp.int32)
                else:
                    v = jax.lax.bitcast_convert_type(
                        _combine_le(sub.reshape(-1, w), w), jnp.int32
                    )
                v = v.reshape(B, cols.size) + jnp.asarray(
                    offsets[cols], jnp.int32
                )[None, :]
                parts.append(v)
                perm.extend(cols.tolist())
            inv = np.argsort(np.asarray(perm))
            return jnp.concatenate(parts, axis=1)[:, inv]

        def _dec_fwts(seg, param, shape):
            value_cols, F, lossy_wts = param
            B = shape[0]
            if value_cols:
                if lossy_wts:
                    u16 = _combine_le(seg.reshape(-1, 2), 2).astype(jnp.uint16)
                    vals = jax.lax.bitcast_convert_type(u16, jnp.bfloat16)
                    vals = vals.astype(jnp.float32)
                else:
                    vals = jax.lax.bitcast_convert_type(
                        _combine_le(seg.reshape(-1, 4), 4), jnp.float32
                    )
                vals = vals.reshape(B, len(value_cols))
            else:
                vals = jnp.zeros((B, 0), jnp.float32)
            const_cols = [c for c in range(F) if c not in set(value_cols)]
            ones = jnp.ones((B, len(const_cols)), jnp.float32)
            inv = np.argsort(np.asarray(list(value_cols) + const_cols))
            return jnp.concatenate([vals, ones], axis=1)[:, inv]

        def decode_arena(batch: dict) -> dict:
            out = {k: v for k, v in batch.items() if k != ARENA_KEY}
            buf = batch[ARENA_KEY]
            for k, kind, param, shape, dtype, off, nb in self._layout:
                seg = jax.lax.slice(buf, (off,), (off + nb,))
                if kind == "fids":
                    out[k] = _dec_fids(seg, param, shape)
                elif kind == "fwts":
                    out[k] = _dec_fwts(seg, param, shape)
                elif kind == "int":
                    w = _int_nbytes(param)
                    if w == 1:
                        v = seg.astype(jnp.int32)
                    else:
                        v = jax.lax.bitcast_convert_type(
                            _combine_le(seg.reshape(-1, w), w), jnp.int32
                        )
                    out[k] = _restore_sentinel(k, v).reshape(shape)
                elif kind == "bf16":
                    u16 = _combine_le(seg.reshape(-1, 2), 2).astype(jnp.uint16)
                    v = jax.lax.bitcast_convert_type(u16, jnp.bfloat16)
                    out[k] = v.astype(jnp.float32).reshape(shape)
                elif kind == "bit":
                    out[k] = seg.astype(jnp.float32).reshape(shape)
                else:  # raw f32/i32 (little-endian 4-byte lanes)
                    v = _combine_le(seg.reshape(-1, 4), 4)
                    v = jax.lax.bitcast_convert_type(
                        v, jnp.float32 if dtype == "float32" else jnp.int32
                    )
                    out[k] = v.reshape(shape)
            return out

        def decode(batch: dict) -> dict:
            if ARENA_KEY in batch:
                return decode_arena(batch)
            out = {}
            for k, v in batch.items():
                if k in bounds:
                    if _int_nbytes(bounds[k]) == 3:
                        b = v.astype(jnp.int32)
                        v = b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16)
                    else:
                        v = v.astype(jnp.int32)
                    out[k] = _restore_sentinel(k, v)
                elif k in lossy or k in bit:
                    out[k] = v.astype(jnp.float32)
                else:
                    out[k] = v
            return out

        if jit:
            decode = jax.jit(decode, donate_argnums=(0,) if donate else ())
        return decode


# ---------------------------------------------------------------------------
# prep placement policy
# ---------------------------------------------------------------------------


def measure_bandwidth(nbytes: int = 8 << 20, device=None, warm: int = 1,
                      reps: int = 2) -> float:
    """Measured host->device copy bandwidth in bytes/s (a ``device_put``
    probe fenced by a scalar fetch — ``block_until_ready`` is a no-op
    through async transports)."""
    import time

    import jax

    buf = np.random.default_rng(0).integers(
        0, 255, size=nbytes, dtype=np.uint8
    )
    dev = device or jax.devices()[0]
    for _ in range(warm):
        int(jax.device_put(buf[: 1 << 20], dev)[-1])
    t0 = time.perf_counter()
    for _ in range(reps):
        int(jax.device_put(buf, dev)[-1])
    dt = time.perf_counter() - t0
    return reps * nbytes / max(dt, 1e-9)


def measure_link(device=None, small: int = 256 << 10, big: int = 8 << 20,
                 reps: int = 2) -> tuple[float, float]:
    """Measure the host->device link as (fixed_ms_per_put, bytes_per_s).

    Two fenced ``device_put`` probes at different sizes solve the
    affine cost model ``t = fixed + size / bw`` that high-round-trip
    links follow (the dev tunnel charges ~80 ms per put regardless of
    size below ~4 MB — benchmarks/PROFILE_r04.md §4; PCIe hosts measure
    fixed < 1 ms).  Drives the auto input recipe
    (:meth:`mindrec_tpu.train.rec_model.RecModel` ``input_recipe``)."""
    import time

    import jax

    dev = device or jax.devices()[0]
    buf = np.random.default_rng(0).integers(0, 255, size=big, dtype=np.uint8)
    int(jax.device_put(buf[: 1 << 16], dev)[-1])  # warm the path

    def probe(n):
        t0 = time.perf_counter()
        for _ in range(reps):
            int(jax.device_put(buf[:n], dev)[-1])
        return (time.perf_counter() - t0) / reps

    t1 = probe(small)
    t2 = probe(big)
    bw = (big - small) / max(t2 - t1, 1e-6)
    fixed_ms = max(0.0, (t1 - small / bw) * 1e3)
    return fixed_ms, bw


def choose_prep(host_step_ms: float, device_step_ms: float, prep_ms: float,
                host_payload: int, device_payload: int, bandwidth: float,
                workers: int = 1) -> str:
    """Pick the prep placement that maximizes sustained batches/s.

    ``host``: prep on the host — smaller step (``host_step_ms``), but
    the sort metadata rides the wire (``host_payload`` bytes/batch).
    ``device``: ship only raw/encoded batches (``device_payload``) and
    derive sort/unique metadata inside the step (``device_step_ms``,
    the inline-prep variant, ~1.3x the host-prep step on W&D).

    Sustained rate of each mode = 1 / max(step, prep/workers, copy);
    on PCIe hosts both copies vanish and host prep wins (smaller step);
    through a slow tunnel the metadata bytes dominate and device prep
    wins.  Returns ``"host"`` or ``"device"``.
    """
    host_t = max(host_step_ms, prep_ms / max(workers, 1),
                 host_payload / bandwidth * 1e3)
    dev_t = max(device_step_ms, device_payload / bandwidth * 1e3)
    return "host" if host_t <= dev_t else "device"
