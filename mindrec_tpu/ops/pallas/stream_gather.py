"""Streamed embedding gather — scatter/layout-copy-free table reads.

Companion to ``stream_update.py``: XLA's native gather on a big
``[V, D]`` table not only costs ~18 ns/row, it also makes XLA prefer a
*transposed* table layout, which conflicts with the row-major layout the
Pallas update kernels require — the layout solver then inserts V-sized
transpose copies around every step (measured: 3.5 GB of temps at
vocab=1M, OOM at 5.86M).  Gathering in Pallas removes the conflict: the
tables' only consumers are row-major custom calls.

Contract: ``ids`` sorted ascending (the sparse step sorts (id, pos)
pairs once per batch); output rows are produced in the same sorted
order.  The kernel streams the table tile by tile; each tile computes
its chunk rows with a one-hot MXU matmul and read-modify-writes the
aligned output window (grid steps execute sequentially on the core, so
boundary chunks shared by adjacent tiles merge safely).
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


def _gather_kernel(starts_ref, ids_ref, table_ref, out_ref, idbuf, rowbuf,
                   sems, *, tile, chunk, dim, dtype, n_real):
    i = pl.program_id(0)
    start = starts_ref[i]
    end = starts_ref[i + 1]
    lo = i * tile

    s0 = (start // chunk) * chunk
    nchunk = (end - s0 + chunk - 1) // chunk

    def body(k, _):
        s = pl.multiple_of(s0 + k * chunk, chunk)
        # output is TRANSPOSED (D, N): lane-dim (minor) DMA slices must be
        # 128-aligned, so the sliced axis is the N axis, minor-most
        id_dma = pltpu.make_async_copy(
            ids_ref.at[:, pl.ds(s, chunk)], idbuf, sems.at[0]
        )
        # read-modify-write: fetch the current output window first
        out_dma_in = pltpu.make_async_copy(
            out_ref.at[:, pl.ds(s, chunk)], rowbuf, sems.at[1]
        )
        id_dma.start()
        out_dma_in.start()
        id_dma.wait()
        out_dma_in.wait()

        ids_c = idbuf[0, :]  # [chunk]
        rows = jax.lax.broadcasted_iota(jnp.int32, (tile, chunk), 0) + lo
        eq = rows == ids_c[None, :]
        # 32-bit intermediate: Mosaic can't minor-dim-expand i1 vectors
        owned_f = jnp.max(eq.astype(jnp.float32), axis=0)  # [chunk]
        if dim == 1:
            P32 = eq.astype(jnp.float32)
            mine = jnp.sum(
                P32 * table_ref[:, 0:1].astype(jnp.float32), axis=0
            )[None, :]  # (1, C)
        else:
            # mine[D, C] = contract_T( tile[T, D], P[T, C] )
            P = eq.astype(dtype)
            mine = jax.lax.dot_general(
                table_ref[:, :].astype(dtype),
                P,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        merged = jnp.where(owned_f[None, :] > 0.0, mine, rowbuf[:, :])
        rowbuf[:, :] = merged
        out_dma_out = pltpu.make_async_copy(
            rowbuf, out_ref.at[:, pl.ds(s, chunk)], sems.at[1]
        )
        out_dma_out.start()
        out_dma_out.wait()
        return 0

    jax.lax.fori_loop(0, nchunk, body, 0)


def streamed_gather(
    table: jnp.ndarray,
    ids_sorted: jnp.ndarray,
    *,
    tile: int = DEFAULT_TILE,
    chunk: int = DEFAULT_CHUNK,
    matmul_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """rows[j] = table[ids_sorted[j]] for sorted ids, as a streaming pass.

    Returns [N, D] f32 (bf16 matmul path rounds values to bf16 when
    ``matmul_dtype`` is bf16 and D > 1; pass float32 for exactness).
    """
    V, D = table.shape
    N = ids_sorted.shape[0]
    assert V % tile == 0, (V, tile)
    ntiles = V // tile
    pad = chunk
    ids_p = jnp.concatenate(
        [ids_sorted.astype(jnp.int32), jnp.full((pad,), jnp.int32(2**31 - 2))]
    ).reshape(1, -1)
    boundaries = jnp.arange(ntiles + 1, dtype=jnp.int32) * tile
    starts = jnp.searchsorted(ids_sorted, boundaries).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # ids (1, N+pad)
            pl.BlockSpec((tile, D), lambda i, s: (i, 0)),  # table tile
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # rows (D, N+pad) HBM
        scratch_shapes=[
            pltpu.VMEM((1, chunk), jnp.int32),
            pltpu.VMEM((D, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _gather_kernel,
        tile=tile, chunk=chunk, dim=D, dtype=matmul_dtype, n_real=N,
    )
    out_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D, N + pad), jnp.float32),
        interpret=interpret or _su.INTERPRET,
    )(starts, ids_p, table)
    return out_t[:, :N].T
