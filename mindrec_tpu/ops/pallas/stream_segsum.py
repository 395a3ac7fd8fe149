"""Streamed monotone segment-sum: per-position grads -> per-unique-id
grads, at one one-hot matmul per 256-column chunk.

The sparse backward yields per-position gradients in sorted-id order;
duplicate ids' rows must be summed before (or while) applying the
optimizer.  The streamed update kernels can sum duplicates themselves,
but then their one-hot combine iterates all N positions against
full-width table tiles (T=2048 compares per column).  Summing first is
much cheaper because the segment ids (``uidx_sorted``) are *monotone
with unit steps*: a 256-column input chunk spans at most 256
consecutive output segments, so each chunk needs one [W<=512, C]
compare + one MXU matmul against a narrow output window — and the
update kernels then stream only U unique columns.

Contract: ``uidx_sorted`` non-decreasing, consecutive values differ by
at most 1 (true for cumsum-of-new-flags unique indices).  ``g`` columns
beyond the real N must be zero (they still land in some window but add
nothing).  Output: [D, n_out] f32, column u = sum of g columns with
uidx == u; columns past the last segment stay zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mindrec_tpu.ops.pallas import stream_update as su

DEFAULT_WIDTH = 512  # output window (and block) width
DEFAULT_CHUNK = 256  # input columns combined per grid step


def _segsum_kernel(chunk_of, blk_of, flags, uidx_ref, g_ref, out_ref, *,
                   width, dtype, row_major):
    j = pl.program_id(0)
    f = flags[j]
    newblk = (f & 1) != 0
    compute = (f & 2) != 0
    base = blk_of[j] * width

    @pl.when(newblk)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    @pl.when(compute)
    def _():
        u = uidx_ref[0, :]  # [C]
        rel = u - base
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (width, rel.shape[0]), 0)
        P = (w_iota == rel[None, :]).astype(dtype)  # [W, C]
        if row_major:  # g block is [C, D]; contracting C leaves [D, W]
            out_ref[:, :] += jax.lax.dot_general(
                g_ref[:, :].astype(dtype),
                P,
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            out_ref[:, :] += jax.lax.dot_general(
                g_ref[:, :].astype(dtype),
                P,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def segsum_schedule(uidx_sorted, n_pad: int, width: int, chunk: int):
    """Per input chunk j: one step for the window holding its first
    segment, plus one for the next window when the chunk straddles a
    boundary (span <= chunk <= width ensures at most 2)."""
    n = uidx_sorted.shape[0]
    nchunks = n // chunk
    S = 2 * nchunks
    first_u = uidx_sorted[:: chunk]  # [nchunks]
    last_u = uidx_sorted[chunk - 1 :: chunk]
    b0 = first_u // width
    b1 = last_u // width
    two = b1 > b0
    cnt = 1 + two.astype(jnp.int32)
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt)])
    total = offs[-1]
    j = jnp.arange(S, dtype=jnp.int32)
    valid = j < total
    j_eff = jnp.where(valid, j, total - 1)
    c = jnp.clip(su.searchsorted_bc(offs, j_eff, side="right") - 1, 0, nchunks - 1)
    k = j_eff - offs[c]
    blk = jnp.where(k == 0, b0[c], b1[c])
    # first visit of this output block (blocks are non-decreasing)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), blk[:-1]])
    newblk = (blk != prev) & valid
    flags = newblk.astype(jnp.int32) + 2 * valid.astype(jnp.int32)
    return c.astype(jnp.int32), blk.astype(jnp.int32), flags, S


def streamed_segsum_unsorted(
    g: jnp.ndarray,
    seg_ids: jnp.ndarray,
    n_out: int,
    *,
    chunk: int = 1024,
    matmul_dtype=jnp.bfloat16,
    row_major: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Segment-sum over ARBITRARY-order segment ids, for small ranges:
    ``n_out <= 2048`` so the whole [D, n_out] accumulator is one
    resident output block and no monotonicity (hence no sort, no order
    crossings) is needed — the one-hot window matmul per input chunk is
    the same as :func:`streamed_segsum`'s, with window = everything.

    This is the tiny-vocab fast path of the sparse step: groups whose
    id space fits in one block (e.g. the Outbrain indicator table,
    vocab 16) skip the sort machinery entirely; segment ids are the raw
    ids.  Out-of-range ids contribute nothing (one-hot row matches
    nothing).  Cost: N/chunk grid steps of one [n_out, chunk] compare +
    one MXU matmul."""
    assert n_out <= 2048, n_out
    if row_major:
        n, d = g.shape
    else:
        d, n = g.shape
    pad = (-n) % chunk
    if pad:
        zpad = (
            jnp.zeros((pad, d), g.dtype) if row_major
            else jnp.zeros((d, pad), g.dtype)
        )
        g = jnp.concatenate([g, zpad], axis=0 if row_major else 1)
        # -1 matches no one-hot row: padding contributes nothing
        seg_ids = jnp.concatenate(
            [seg_ids, jnp.full((pad,), -1, jnp.int32)]
        )
    nchunks = (n + pad) // chunk
    chunk_of = jnp.arange(nchunks, dtype=jnp.int32)
    blk_of = jnp.zeros((nchunks,), jnp.int32)
    flags = jnp.full((nchunks,), 2, jnp.int32).at[0].set(3)  # new|compute
    kernel = functools.partial(
        _segsum_kernel, width=n_out, dtype=matmul_dtype, row_major=row_major
    )
    g_spec = (
        pl.BlockSpec((chunk, d), lambda j, c, b, f: (c[j], 0))
        if row_major
        else pl.BlockSpec((d, chunk), lambda j, c, b, f: (0, c[j]))
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((1, chunk), lambda j, c, b, f: (0, c[j])),
            g_spec,
        ],
        out_specs=pl.BlockSpec((d, n_out), lambda j, c, b, f: (0, b[j])),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, n_out), jnp.float32),
        interpret=interpret or su.INTERPRET,
    )(chunk_of, blk_of, flags, seg_ids.reshape(1, -1), g)


def streamed_segsum(
    g: jnp.ndarray,
    uidx_sorted: jnp.ndarray,
    *,
    width: int = DEFAULT_WIDTH,
    chunk: int = DEFAULT_CHUNK,
    matmul_dtype=jnp.bfloat16,
    n_out: int | None = None,
    row_major: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[:, u] = sum of g's position-n slices with uidx_sorted[n] == u.

    g: [D, N] (or [N, D] with ``row_major=True`` — the layout the
    batch-order crossing gather produces, saving its transpose);
    uidx_sorted: [N] i32 monotone, unit steps.  Returns [D, n_out] f32
    (default n_out = N rounded up to ``width``; pass a smaller static
    unique bound to shrink the output and downstream update streams —
    segments at or past n_out must be empty).
    """
    assert width >= chunk, (width, chunk)
    if row_major:
        n, d = g.shape
    else:
        d, n = g.shape
    pad = (-n) % chunk
    if n_out is None:
        n_out = (n + width - 1) // width * width
    assert n_out % width == 0, (n_out, width)
    if pad:
        zpad = (
            jnp.zeros((pad, d), g.dtype) if row_major
            else jnp.zeros((d, pad), g.dtype)
        )
        g = jnp.concatenate([g, zpad], axis=0 if row_major else 1)
        uidx_sorted = jnp.concatenate(
            [uidx_sorted, jnp.full((pad,), uidx_sorted[-1], jnp.int32)]
        )
    chunk_of, blk_of, flags, S = segsum_schedule(uidx_sorted, n_out, width, chunk)
    kernel = functools.partial(
        _segsum_kernel, width=width, dtype=matmul_dtype, row_major=row_major
    )
    g_spec = (
        pl.BlockSpec((chunk, d), lambda j, c, b, f: (c[j], 0))
        if row_major
        else pl.BlockSpec((d, chunk), lambda j, c, b, f: (0, c[j]))
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, chunk), lambda j, c, b, f: (0, c[j])),  # uidx
            g_spec,  # grads
        ],
        out_specs=pl.BlockSpec((d, width), lambda j, c, b, f: (0, b[j])),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, n_out), jnp.float32),
        interpret=interpret or su.INTERPRET,
    )(chunk_of, blk_of, flags, uidx_sorted.reshape(1, -1), g)
