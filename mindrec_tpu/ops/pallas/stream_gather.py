"""Streamed embedding gather — scatter/layout-copy-free table reads.

Companion to ``stream_update.py``: XLA's native gather costs ~15 ns/row
on TPU (measured 9.6 ms for a 624k-id batch against a [5.86M, 16]
table), serialized per row.  This kernel instead streams the
feature-major ``[Dp, Vc]`` table tile by tile at HBM bandwidth; each
tile computes the output columns whose storage column falls inside it
with a one-hot MXU matmul:

    P[t, c]      = (cols_sorted[chunk_c] == i*T + t)
    mine[Dp, C]  = table_tile[Dp, T] . P[T, C]

and read-modify-writes the aligned output window (grid steps execute
sequentially on the core, so boundary chunks shared by adjacent tiles
merge safely).

Contract: ``cols`` sorted ascending (one sort of the raw ids serves all
tables — ``col = id // fold`` is monotone); the output (Dp, N) is in
the same sorted order.  For folded tables (fold R > 1) each output
column carries ALL R logical rows stored in that column; the caller
masks with the position's fold-sub one-hot (which also makes the
backward gradient land in the right sublane slice automatically).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mindrec_tpu.ops.pallas import stream_update as _su

DEFAULT_TILE = 2048
DEFAULT_CHUNK = 256


def _gather_kernel(starts_ref, cols_ref, table_ref, out_ref, colbuf, outbuf,
                   sems, *, tile, chunk, dp, dtype):
    """Per grid step (= one table tile): double-buffered loop over the
    tile's gradient chunks.

    The first version of this kernel issued each chunk's DMAs and waited
    on them inline, exposing the full HBM round-trip per chunk (~1.5 us
    x 2437 chunks at bs 16000 = most of the kernel's runtime).  Now
    chunk k+1's column/output DMAs start before chunk k's compute, so
    the loop only ever waits on copies issued one iteration earlier.
    ``colbuf``/``outbuf`` are [2, ...] double buffers.
    """
    i = pl.program_id(0)
    start = starts_ref[i]
    end = starts_ref[i + 1]
    lo = i * tile

    s0 = (start // chunk) * chunk
    nchunk = (end - s0 + chunk - 1) // chunk

    def start_copies(k, slot):
        s = pl.multiple_of(s0 + k * chunk, chunk)
        # output is (Dp, N): lane-dim (minor) DMA slices must be
        # 128-aligned, so the sliced axis is the N axis, minor-most
        pltpu.make_async_copy(
            cols_ref.at[:, pl.ds(s, chunk)], colbuf.at[slot], sems.at[slot, 0]
        ).start()
        # read-modify-write: boundary chunks are shared by adjacent tiles
        pltpu.make_async_copy(
            out_ref.at[:, pl.ds(s, chunk)], outbuf.at[slot], sems.at[slot, 1]
        ).start()

    def wb_copy(k):
        s = pl.multiple_of(s0 + k * chunk, chunk)
        slot = jax.lax.rem(k, 2)
        return pltpu.make_async_copy(
            outbuf.at[slot], out_ref.at[:, pl.ds(s, chunk)], sems.at[slot, 2]
        )

    @pl.when(nchunk > 0)
    def _():
        start_copies(0, 0)

    def body(k, _):
        slot = jax.lax.rem(k, 2)
        s = pl.multiple_of(s0 + k * chunk, chunk)

        @pl.when(k + 1 < nchunk)
        def _():
            # chunk k-1's write-back still owns buffer slot 1-slot;
            # drain it before the prefetch DMA overwrites that buffer
            @pl.when(k >= 1)
            def _():
                wb_copy(k - 1).wait()

            start_copies(k + 1, 1 - slot)

        pltpu.make_async_copy(
            cols_ref.at[:, pl.ds(s, chunk)], colbuf.at[slot], sems.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            out_ref.at[:, pl.ds(s, chunk)], outbuf.at[slot], sems.at[slot, 1]
        ).wait()

        cols_c = colbuf[slot, 0, :]  # [chunk]
        rows = jax.lax.broadcasted_iota(jnp.int32, (tile, chunk), 0) + lo
        eq = rows == cols_c[None, :]  # [T, C]
        # 32-bit intermediate: Mosaic can't minor-dim-expand i1 vectors
        owned_f = jnp.max(eq.astype(jnp.float32), axis=0)  # [chunk]
        P = eq.astype(dtype)
        # mine[Dp, C] = contract_T( table[Dp, T], P[T, C] )
        mine = jax.lax.dot_general(
            table_ref[:, :].astype(dtype),
            P,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        merged = jnp.where(owned_f[None, :] > 0.0, mine, outbuf[slot, :, :])
        outbuf[slot, :, :] = merged
        wb_copy(k).start()
        return 0

    jax.lax.fori_loop(0, nchunk, body, 0)

    # Drain the last (up to two) write-backs before this grid step ends:
    # the next tile's first out-window read can alias this tile's last
    # write-back window (shared boundary chunk).
    @pl.when(nchunk >= 2)
    def _():
        wb_copy(nchunk - 2).wait()

    @pl.when(nchunk >= 1)
    def _():
        wb_copy(nchunk - 1).wait()


def chunk_schedule(cols_sorted, Vc: int, tile: int, chunk: int):
    """Chunk-major static schedule: for every input chunk (in order), one
    grid step per table tile its columns span.  Out blocks are indexed by
    chunk, so Pallas keeps a chunk's block in VMEM across its 1..k tile
    steps; table tiles are nondecreasing across the whole schedule, so
    each tile is fetched at most once.

    Returns (tile_of, chunkblk, flags, n_steps); flags bit0 = first step
    of this chunk, bit1 = compute."""
    n = cols_sorted.shape[0]
    nchunks = n // chunk
    ntiles = Vc // tile
    S = nchunks + ntiles  # Σ (tiles spanned per chunk) ≤ nchunks + ntiles
    n_real = _su.searchsorted_bc(cols_sorted, jnp.asarray(Vc, cols_sorted.dtype))
    c_iota = jnp.arange(nchunks, dtype=jnp.int32)
    first_col = cols_sorted[:: chunk]
    last_idx = jnp.minimum((c_iota + 1) * chunk, n_real) - 1
    last_col = cols_sorted[jnp.clip(last_idx, 0, n - 1)]
    t_lo = jnp.clip(first_col // tile, 0, ntiles - 1)
    t_hi = jnp.clip(last_col // tile, 0, ntiles - 1)
    has = (c_iota * chunk) < n_real
    cnt = jnp.where(has, t_hi - t_lo + 1, 0)
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt)])
    total = offs[-1]
    j = jnp.arange(S, dtype=jnp.int32)
    valid = j < total
    j_eff = jnp.where(valid, j, jnp.maximum(total - 1, 0))
    c = jnp.clip(_su.searchsorted_bc(offs, j_eff, side="right") - 1, 0, nchunks - 1)
    k = j_eff - offs[c]
    t = t_lo[c] + k
    first = (k == 0) & valid
    flags = first.astype(jnp.int32) + 2 * valid.astype(jnp.int32)
    return t.astype(jnp.int32), c.astype(jnp.int32), flags, S


def _gather_rows_kernel(tile_of, chunkblk, flags, cols_ref, table_ref,
                        base_ref, out_ref, *, tile, dp, lane_offset, width,
                        dtype):
    j = pl.program_id(0)
    f = flags[j]
    first = (f & 1) != 0
    compute = (f & 2) != 0
    lo = tile_of[j] * tile

    @pl.when(first)
    def _():
        # carry the buffer's previous content (other tables' lanes /
        # regions this table doesn't own)
        out_ref[:, :] = base_ref[:, :]

    @pl.when(compute)
    def _():
        cols_c = cols_ref[0, :]  # [chunk]
        rel = cols_c - lo
        t_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, rel.shape[0]), 0)
        eq = t_iota == rel[None, :]  # [T, C]
        # 32-bit intermediate: Mosaic can't minor-dim-expand i1 vectors
        owned_f = jnp.max(eq.astype(jnp.float32), axis=0)  # [chunk]
        P = eq.astype(dtype)
        mine = jax.lax.dot_general(
            P,
            table_ref[:, :].astype(dtype),
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C, Dp]
        cur = out_ref[:, lane_offset : lane_offset + dp]
        out_ref[:, lane_offset : lane_offset + dp] = jnp.where(
            owned_f[:, None] > 0.0, mine, cur
        )


def streamed_gather_rows(
    table: jnp.ndarray,
    cols_sorted: jnp.ndarray,
    base: jnp.ndarray,
    *,
    lane_offset: int = 0,
    tile: int = DEFAULT_TILE,
    chunk: int = DEFAULT_CHUNK,
    matmul_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Row-major streamed gather: writes ``table[:, cols_sorted[j]]`` into
    ``base[j, lane_offset : lane_offset + Dp]`` and returns the updated
    buffer (``base`` is donated via input/output aliasing).

    Multiple tables sharing one sorted unique-id stream each call this
    with their own ``lane_offset``, filling one ``[U, width]`` f32 buffer
    that the batch-order expansion then gathers ROW-wise — the layout the
    TPU gathers fastest (512-byte rows), with no transpose step.

    Args:
      table: [Dp, Vc] f32 feature-major storage (Vc % tile == 0).
      cols_sorted: [U] i32 ascending storage columns (sentinel-padded;
        U % chunk == 0).
      base: [U, width] f32 output buffer (width a lane multiple of 128).
    Rows whose column is a sentinel (>= Vc) keep ``base``'s content.
    """
    dp, Vc = table.shape
    U, width = base.shape
    assert Vc % tile == 0, (Vc, tile)
    assert U % chunk == 0, (U, chunk)
    assert lane_offset + dp <= width, (lane_offset, dp, width)
    cols_p = cols_sorted.astype(jnp.int32).reshape(1, -1)
    tile_of, chunkblk, flags, S = chunk_schedule(
        cols_sorted.astype(jnp.int32), Vc, tile, chunk
    )
    kernel = functools.partial(
        _gather_rows_kernel, tile=tile, dp=dp, lane_offset=lane_offset,
        width=width, dtype=matmul_dtype,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, chunk), lambda j, t, c, f: (0, c[j])),  # cols
            pl.BlockSpec((dp, tile), lambda j, t, c, f: (0, t[j])),  # table
            pl.BlockSpec((chunk, width), lambda j, t, c, f: (c[j], 0)),  # base
        ],
        out_specs=pl.BlockSpec((chunk, width), lambda j, t, c, f: (c[j], 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((U, width), jnp.float32),
        input_output_aliases={5: 0},  # base -> out (3 scalar-prefetch + 2)
        interpret=interpret or _su.INTERPRET,
    )(tile_of, chunkblk, flags, cols_p, table, base)


def streamed_gather(
    table: jnp.ndarray,
    cols_sorted: jnp.ndarray,
    *,
    tile: int = DEFAULT_TILE,
    chunk: int = DEFAULT_CHUNK,
    matmul_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[:, j] = table[:, cols_sorted[j]] as a streaming pass.

    Args:
      table: [Dp, Vc] f32 feature-major storage (Vc % tile == 0).
      cols_sorted: [N] i32 ascending storage columns.
    Returns (Dp, N) f32 (bf16 matmul rounds values to bf16 when
    ``matmul_dtype`` is bf16; pass float32 for exactness).
    """
    dp, Vc = table.shape
    N = cols_sorted.shape[0]
    assert Vc % tile == 0, (Vc, tile)
    ntiles = Vc // tile
    pad = chunk
    cols_p = jnp.concatenate(
        [cols_sorted.astype(jnp.int32), jnp.full((pad,), jnp.int32(2**31 - 2))]
    ).reshape(1, -1)
    boundaries = jnp.arange(ntiles + 1, dtype=jnp.int32) * tile
    starts = _su.searchsorted_bc(cols_sorted, boundaries)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # cols (1, N+pad)
            pl.BlockSpec((dp, tile), lambda i, s: (0, i)),  # table tile
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # out (Dp, N+pad) HBM
        scratch_shapes=[
            pltpu.VMEM((2, 1, chunk), jnp.int32),  # double-buffered cols
            pltpu.VMEM((2, dp, chunk), jnp.float32),  # double-buffered out
            pltpu.SemaphoreType.DMA((2, 3)),  # (slot, {col-in, out-in, wb})
        ],
    )
    kernel = functools.partial(
        _gather_kernel, tile=tile, chunk=chunk, dp=dp, dtype=matmul_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((dp, N + pad), jnp.float32),
        interpret=interpret or _su.INTERPRET,
    )(starts, cols_p, table)
    return out[:, :N]
