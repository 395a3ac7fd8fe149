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
    starts = jnp.searchsorted(cols_sorted, boundaries).astype(jnp.int32)

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
