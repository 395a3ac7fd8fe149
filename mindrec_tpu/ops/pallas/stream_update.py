"""Streamed row-sparse optimizer updates — the scatter-free hot path.

Motivation (measured on v5e): XLA's TPU scatter applies 624k row
updates to a [5.86M, 16] table in ~69 ms (per-row serialization), and
the reference's sparse-optimizer step needs SIX of those (table + 2
state arrays x 2 optimizers).  These kernels replace every scatter with
a *full-table streaming pass*: the table (and its row-aligned optimizer
state) is pumped HBM->VMEM->HBM in tiles at memory bandwidth
(375 MB tables stream in ~0.5 ms), and each tile combines its slice of
the batch gradient with a one-hot matmul on the MXU:

    P[t, c]   = (ids_sorted[chunk_c] == tile_lo + t)      # VPU compare
    G_tile   += P @ grad_chunk                             # MXU
    cnt_tile += P @ 1
    # then a fully-vectorized masked FTRL/Adam update on [T, D]

Requirements: ``ids`` sorted ascending (jnp.unique output order) with
sentinel padding at the tail; ``grads`` row-aligned with ``ids``;
``starts[i] = searchsorted(ids, i*T)`` computed by the caller (cheap).
Duplicate ids are allowed — P sums their gradients into one row, which
matches the reference's unique-then-apply sparse optimizer semantics
(``mindspore_rec/ops/embedding.py:189-195``,
``wide_and_deep.py:415-430``).

LazyAdam semantics hold exactly: untouched rows (cnt == 0) keep their
moments; bias correction uses the global step (passed in as lr_t).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 2048  # table rows per streamed tile
DEFAULT_CHUNK = 256  # gradient rows combined per inner step

# Global interpret-mode override (tests set True to run the kernels on the
# CPU backend; pl.pallas_call(interpret=...) ORs with this).
INTERPRET = False


def _round_up(x, m):
    return (x + m - 1) // m * m


def _combine_chunks(ids_ref, grads_ref, idbuf, gradbuf, sems, start, end, lo,
                    tile, chunk, dim, dtype):
    """Accumulate (G, cnt) for one tile by looping gradient chunks.

    The window start is rounded DOWN to a chunk boundary: Mosaic requires
    dynamic DMA offsets to be provably tile-aligned, and over-fetching is
    free correctness-wise — the one-hot compare discards ids outside
    [lo, lo+tile).
    """

    s0 = (start // chunk) * chunk
    nchunk = (end - s0 + chunk - 1) // chunk

    def body(k, carry):
        G, cnt = carry
        s = pl.multiple_of(s0 + k * chunk, chunk)
        # grads are passed TRANSPOSED (D, N): Mosaic requires lane-dim
        # (minor) DMA slices to be 128-aligned, so the sliced axis must
        # be the N axis and it must sit minor-most.
        id_dma = pltpu.make_async_copy(
            ids_ref.at[:, pl.ds(s, chunk)], idbuf, sems.at[0]
        )
        gr_dma = pltpu.make_async_copy(
            grads_ref.at[:, pl.ds(s, chunk)], gradbuf, sems.at[1]
        )
        id_dma.start()
        gr_dma.start()
        id_dma.wait()
        gr_dma.wait()
        ids_c = idbuf[0, :]  # [chunk] i32
        rows = jax.lax.broadcasted_iota(jnp.int32, (tile, chunk), 0) + lo
        eq = rows == ids_c[None, :]
        if dim == 1:
            # Mosaic's matmul path chokes on 1-lane outputs; a VPU
            # multiply-reduce is also simply faster at D=1
            P32 = eq.astype(jnp.float32)
            g = gradbuf[0, :].astype(jnp.float32)
            G = G + jnp.sum(P32 * g[None, :], axis=1, keepdims=True)
            cnt = cnt + jnp.sum(P32, axis=1, keepdims=True)
        else:
            P = eq.astype(dtype)
            # G[T, D] = contract_C( P[T, C], gradT[D, C] )
            G = G + jax.lax.dot_general(
                P,
                gradbuf[:, :].astype(dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            cnt = cnt + jnp.sum(eq.astype(jnp.float32), axis=1, keepdims=True)
        return G, cnt

    G0 = jnp.zeros((tile, dim), jnp.float32)
    c0 = jnp.zeros((tile, 1), jnp.float32)
    return jax.lax.fori_loop(0, nchunk, body, (G0, c0))


# ---------------------------------------------------------------------------
# LazyAdam
# ---------------------------------------------------------------------------


def _adam_kernel(starts_ref, ids_ref, grads_ref, table_ref, m_ref, v_ref,
                 scal_ref, table_out, m_out, v_out, idbuf, gradbuf, sems, *,
                 tile, chunk, dim, dtype, b1, b2, eps, inv_scale):
    i = pl.program_id(0)
    start = starts_ref[i]
    end = starts_ref[i + 1]
    lo = i * tile

    G, cnt = _combine_chunks(
        ids_ref, grads_ref, idbuf, gradbuf, sems, start, end, lo, tile, chunk,
        dim, dtype,
    )
    G = G * inv_scale
    mask = cnt > 0.0
    lr_t = scal_ref[0]

    m_old = m_ref[:, :]
    v_old = v_ref[:, :]
    m_new = b1 * m_old + (1.0 - b1) * G
    v_new = b2 * v_old + (1.0 - b2) * G * G
    upd = lr_t * m_new / (jnp.sqrt(v_new) + eps)
    m_out[:, :] = jnp.where(mask, m_new, m_old)
    v_out[:, :] = jnp.where(mask, v_new, v_old)
    table_out[:, :] = jnp.where(mask, table_ref[:, :] - upd, table_ref[:, :])


def streamed_adam_rows(
    table: jnp.ndarray,
    m: jnp.ndarray,
    v: jnp.ndarray,
    ids_sorted: jnp.ndarray,
    grads: jnp.ndarray,
    lr_t,
    *,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    loss_scale: float = 1.0,
    tile: int = DEFAULT_TILE,
    chunk: int = DEFAULT_CHUNK,
    matmul_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """One LazyAdam step over the touched rows, scatter-free.

    Args:
      table/m/v: [V, D] f32 (V a multiple of ``tile`` ideally; padded
        otherwise by the caller via the table spec's row alignment).
      ids_sorted: [N] i32 ascending; sentinel-padded tail allowed.
      grads: [N, D] f32 aligned with ids (duplicates get summed).
      lr_t: scalar bias-corrected learning rate for this step.
    Returns: (table', m', v').
    """
    V, D = table.shape
    N = ids_sorted.shape[0]
    assert V % tile == 0, (V, tile)
    ntiles = V // tile
    # pad ids with an id that can never match (V rounded up) and grads with 0
    pad = chunk
    ids_p = jnp.concatenate(
        [ids_sorted.astype(jnp.int32), jnp.full((pad,), jnp.int32(2**31 - 2))]
    ).reshape(1, -1)
    # transposed (D, N+pad) layout — see _combine_chunks
    grads_p = jnp.concatenate(
        [grads.T, jnp.zeros((D, pad), grads.dtype)], axis=1
    )
    boundaries = jnp.arange(ntiles + 1, dtype=jnp.int32) * tile
    starts = jnp.searchsorted(ids_sorted, boundaries).astype(jnp.int32)
    lr_arr = jnp.asarray([lr_t], jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # ids (1, N+pad)
            pl.BlockSpec(memory_space=pl.ANY),  # grads (N+pad, D)
            pl.BlockSpec((tile, D), lambda i, s: (i, 0)),  # table
            pl.BlockSpec((tile, D), lambda i, s: (i, 0)),  # m
            pl.BlockSpec((tile, D), lambda i, s: (i, 0)),  # v
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lr_t (1,)
        ],
        out_specs=[
            pl.BlockSpec((tile, D), lambda i, s: (i, 0)),
            pl.BlockSpec((tile, D), lambda i, s: (i, 0)),
            pl.BlockSpec((tile, D), lambda i, s: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, chunk), jnp.int32),
            pltpu.VMEM((D, chunk), grads.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _adam_kernel,
        tile=tile, chunk=chunk, dim=D, dtype=matmul_dtype,
        b1=b1, b2=b2, eps=eps, inv_scale=1.0 / loss_scale,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((V, D), table.dtype),
            jax.ShapeDtypeStruct((V, D), m.dtype),
            jax.ShapeDtypeStruct((V, D), v.dtype),
        ],
        # in-place: table/m/v buffers are reused for the outputs (indices
        # count pallas_call operands including the scalar-prefetch arg)
        input_output_aliases={3: 0, 4: 1, 5: 2},
        interpret=interpret or INTERPRET,
    )(starts, ids_p, grads_p, table, m, v, lr_arr)


# ---------------------------------------------------------------------------
# FTRL
# ---------------------------------------------------------------------------


def _ftrl_kernel(starts_ref, ids_ref, grads_ref, table_ref, acc_ref, lin_ref,
                 table_out, acc_out, lin_out, idbuf, gradbuf, sems, *,
                 tile, chunk, dim, dtype, lr, l1, l2, inv_scale):
    i = pl.program_id(0)
    start = starts_ref[i]
    end = starts_ref[i + 1]
    lo = i * tile

    G, cnt = _combine_chunks(
        ids_ref, grads_ref, idbuf, gradbuf, sems, start, end, lo, tile, chunk,
        dim, dtype,
    )
    G = G * inv_scale
    mask = cnt > 0.0

    w = table_ref[:, :]
    acc = acc_ref[:, :]
    lin = lin_ref[:, :]
    acc_new = acc + G * G
    sigma = (jnp.sqrt(acc_new) - jnp.sqrt(acc)) / lr
    lin_new = lin + G - sigma * w
    quad = jnp.sqrt(acc_new) / lr + 2.0 * l2
    w_new = jnp.where(
        jnp.abs(lin_new) > l1, (jnp.sign(lin_new) * l1 - lin_new) / quad, 0.0
    )
    table_out[:, :] = jnp.where(mask, w_new, w)
    acc_out[:, :] = jnp.where(mask, acc_new, acc)
    lin_out[:, :] = jnp.where(mask, lin_new, lin)


def streamed_ftrl_rows(
    table: jnp.ndarray,
    accum: jnp.ndarray,
    linear: jnp.ndarray,
    ids_sorted: jnp.ndarray,
    grads: jnp.ndarray,
    *,
    learning_rate: float = 5e-2,
    l1: float = 1e-8,
    l2: float = 1e-8,
    loss_scale: float = 1.0,
    tile: int = DEFAULT_TILE,
    chunk: int = DEFAULT_CHUNK,
    matmul_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """One FTRL-proximal step over the touched rows, scatter-free.
    Same contract as :func:`streamed_adam_rows` (lr_power fixed -0.5)."""
    V, D = table.shape
    assert V % tile == 0, (V, tile)
    ntiles = V // tile
    pad = chunk
    ids_p = jnp.concatenate(
        [ids_sorted.astype(jnp.int32), jnp.full((pad,), jnp.int32(2**31 - 2))]
    ).reshape(1, -1)
    # transposed (D, N+pad) layout — see _combine_chunks
    grads_p = jnp.concatenate(
        [grads.T, jnp.zeros((D, pad), grads.dtype)], axis=1
    )
    boundaries = jnp.arange(ntiles + 1, dtype=jnp.int32) * tile
    starts = jnp.searchsorted(ids_sorted, boundaries).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tile, D), lambda i, s: (i, 0)),
            pl.BlockSpec((tile, D), lambda i, s: (i, 0)),
            pl.BlockSpec((tile, D), lambda i, s: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, D), lambda i, s: (i, 0)),
            pl.BlockSpec((tile, D), lambda i, s: (i, 0)),
            pl.BlockSpec((tile, D), lambda i, s: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, chunk), jnp.int32),
            pltpu.VMEM((D, chunk), grads.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _ftrl_kernel,
        tile=tile, chunk=chunk, dim=D, dtype=matmul_dtype,
        lr=learning_rate, l1=l1, l2=l2, inv_scale=1.0 / loss_scale,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((V, D), table.dtype),
            jax.ShapeDtypeStruct((V, D), accum.dtype),
            jax.ShapeDtypeStruct((V, D), linear.dtype),
        ],
        input_output_aliases={3: 0, 4: 1, 5: 2},
        interpret=interpret or INTERPRET,
    )(starts, ids_p, grads_p, table, accum, linear)
