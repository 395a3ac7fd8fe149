"""Fused table pump: sparse optimizer update + next-batch gather in ONE
streaming pass over the table.

The sparse train step's table traffic is the dominant HBM cost: the
standalone pipeline reads the table once for the forward gather and
then reads+writes table+m+v for the optimizer update — the gather read
is a full extra pass (375 MB at the 5.86M x 16 benchmark shape).  With
an input pipeline that knows the *next* batch's sorted ids (ours does:
``make_batch_sort`` runs on the host one step ahead), the update pass
can produce the next forward's rows on its way through:

    per visited tile:
      1. combine this batch's gradient chunks (one-hot MXU)   [update]
      2. apply FTRL/Adam elementwise to the VMEM-resident tile [apply]
      3. stream the NEXT batch's id chunks against the UPDATED
         tile and emit its gathered rows                        [gather]

so the next step's forward needs no table read at all.  Semantics are
identical to gather-after-update (the reference applies optimizers at
step end; step k+1's lookup sees step k's updates).

Tiles with gradient ids but no next-batch ids skip phase 3; tiles with
next-batch ids but no gradients identity-copy their state through VMEM
(the pipeline write-back must not flush garbage); untouched tiles get
no grid steps at all and persist via input/output aliasing.

Status: measured at the 5.86M x 16 benchmark shape (uniform ids, v5e
dev chip), the fused pass times within noise of separate update+gather
(19.1 ms vs 11.6+7.3): at bs 16000 the per-grid-step one-hot compute
and dispatch dominate, so saving the 375 MB table re-read doesn't move
the total.  The train step therefore keeps the separate kernels; this
pass becomes profitable when ids are few relative to the vocab (small
batches / skewed traffic serving refresh), where DMA dominates.

Schedule encoding per grid step j (see :func:`fused_schedule`):
``tile_of[j]`` table tile; ``blk_u[j]`` gradient-chunk block (carried
forward during gather steps so the pipeline never thrashes);
``blk_g[j]`` next-id/rows-out block (carried forward during update
steps); ``flags[j]`` bit 1 first-step-of-tile, 2 apply, 4 compute,
8 gather-phase, 16 first-visit-of-rows-out-block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mindrec_tpu.ops.pallas import stream_update as su
from mindrec_tpu.ops.pallas.stream_update import (
    AUG,
    DEFAULT_CHUNK,
    DEFAULT_TILE,
    _combine,
    _expand_touch,
)

F_FIRST = 1
F_APPLY = 2
F_COMPUTE = 4
F_GATHER = 8
F_NEWBLK = 16


def _ffill(vals: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Forward-fill vals over invalid positions; leading invalids take
    the first valid value (all-invalid: zeros)."""
    n = vals.shape[0]
    idx = jnp.where(valid, jnp.arange(n, dtype=jnp.int32), -1)
    ff = jax.lax.cummax(idx)
    any_valid = jnp.any(valid)
    first = jnp.argmax(valid).astype(jnp.int32)
    ff = jnp.where(ff < 0, first, ff)
    out = vals[ff]
    return jnp.where(any_valid, out, jnp.zeros_like(out))


def fused_schedule(cols_u, cols_g, Vc: int, tile: int, chunk: int,
                   replay_pads: bool):
    """Flat per-grid-step schedule over (tile, update-chunks then
    gather-chunks).  Same searchsorted-window construction as
    ``stream_update.flat_schedule`` for each phase."""
    n_u = cols_u.shape[0]
    n_g = cols_g.shape[0]
    ntiles = Vc // tile
    S = n_u // chunk + n_g // chunk + 4 * ntiles + 4

    boundaries = jnp.arange(ntiles + 1, dtype=jnp.int32) * tile

    def windows(cols):
        starts = su.searchsorted_bc(cols, boundaries)
        s0 = (starts[:-1] // chunk) * chunk
        cnt = jnp.where(
            starts[1:] > starts[:-1],
            (starts[1:] - s0 + chunk - 1) // chunk,
            0,
        )
        return s0, cnt

    s0u, cnt_u = windows(cols_u)
    s0g, cnt_g = windows(cols_g)
    cnt = cnt_u + cnt_g
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt)])
    total = offs[-1]

    j = jnp.arange(S, dtype=jnp.int32)
    valid = j < total
    j_eff = jnp.where(valid, j, jnp.maximum(total - 1, 0))
    t = jnp.clip(su.searchsorted_bc(offs, j_eff, side="right") - 1, 0, ntiles - 1)
    k = j_eff - offs[t]
    is_g = k >= cnt_u[t]
    kg = k - cnt_u[t]

    blk_u_raw = s0u[t] // chunk + jnp.minimum(k, jnp.maximum(cnt_u[t] - 1, 0))
    blk_g_raw = s0g[t] // chunk + jnp.clip(kg, 0, jnp.maximum(cnt_g[t] - 1, 0))

    u_step = valid & ~is_g
    g_step = valid & is_g
    blk_u = _ffill(blk_u_raw, u_step)
    blk_g = _ffill(blk_g_raw, g_step)

    first = (k == 0) & valid
    apply_ = (~is_g) & (k == cnt_u[t] - 1) & valid
    # first visit of this rows-out block among gather steps (a tile's
    # first gather block may continue the previous tile's last one, in
    # which case the second visitor merges instead of re-initializing)
    idx = jnp.where(g_step, jnp.arange(S, dtype=jnp.int32), -1)
    ff = jax.lax.cummax(idx)
    last_gblk = jnp.where(ff < 0, -1, blk_g_raw[jnp.maximum(ff, 0)])
    prev_gblk = jnp.concatenate([jnp.full((1,), -1, jnp.int32), last_gblk[:-1]])
    newblk = g_step & (blk_g_raw != prev_gblk)

    if not replay_pads:
        apply_ = apply_ & valid
    flags = (
        first.astype(jnp.int32) * F_FIRST
        + apply_.astype(jnp.int32) * F_APPLY
        + valid.astype(jnp.int32) * F_COMPUTE
        + is_g.astype(jnp.int32) * F_GATHER
        + newblk.astype(jnp.int32) * F_NEWBLK
    )
    return t.astype(jnp.int32), blk_u.astype(jnp.int32), blk_g.astype(jnp.int32), flags, S


def _prep_cols(cols, chunk):
    n = cols.shape[0]
    pad = (-n) % chunk + chunk
    return jnp.concatenate(
        [cols.astype(jnp.int32), jnp.full((pad,), jnp.int32(2**31 - 2))]
    ).reshape(1, -1)


def _gather_into(rows_out, cols_blk, src, lo, newblk, tile, dtype):
    """rows_out block = one-hot gather of src [dp, T] at this chunk's
    columns, merged with previous visits (or zeros on first visit)."""
    cols_c = cols_blk[0, :]
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (tile, cols_c.shape[0]), 0) + lo
    eq = rows_i == cols_c[None, :]
    owned = jnp.max(eq.astype(jnp.float32), axis=0)  # [chunk]
    P = eq.astype(dtype)
    mine = jax.lax.dot_general(
        src.astype(dtype), P,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    prev = jnp.where(newblk, jnp.zeros_like(rows_out[:, :]), rows_out[:, :])
    rows_out[:, :] = jnp.where(owned[None, :] > 0.0, mine, prev)


def _fused_adam_kernel(tile_of, blk_u, blk_g, flags, cols_u_ref, grads_ref,
                       cols_g_ref, table_ref, m_ref, v_ref, scal_ref,
                       table_out, m_out, v_out, rows_out, acc_ref, *,
                       tile, dp, dim, fold, dtype, b1, b2, eps, inv_scale):
    j = pl.program_id(0)
    f = flags[j]
    first = (f & F_FIRST) != 0
    apply_ = (f & F_APPLY) != 0
    compute = (f & F_COMPUTE) != 0
    is_g = (f & F_GATHER) != 0
    newblk = (f & F_NEWBLK) != 0
    lo = tile_of[j] * tile

    # gather-only tile: state must pass through VMEM unchanged so the
    # pipeline's write-back flushes real data
    @pl.when(first & is_g)
    def _():
        table_out[:, :] = table_ref[:, :]
        m_out[:, :] = m_ref[:, :].astype(m_out.dtype)
        v_out[:, :] = v_ref[:, :].astype(v_out.dtype)

    _combine(cols_u_ref[:, :], grads_ref[:, :], acc_ref, lo,
             first & ~is_g, compute & ~is_g, tile, dtype)

    @pl.when(apply_)
    def _():
        ga = acc_ref[:, :]
        G = ga[:dp, :] * inv_scale
        mask = _expand_touch(ga[dp:, :], dim, fold)
        lr_t = scal_ref[0]
        m_old = m_ref[:, :].astype(jnp.float32)
        v_old = v_ref[:, :].astype(jnp.float32)
        m_new = b1 * m_old + (1.0 - b1) * G
        v_new = b2 * v_old + (1.0 - b2) * G * G
        upd = lr_t * m_new / (jnp.sqrt(v_new) + eps)
        m_out[:, :] = jnp.where(mask, m_new, m_old).astype(m_out.dtype)
        v_out[:, :] = jnp.where(mask, v_new, v_old).astype(v_out.dtype)
        table_out[:, :] = jnp.where(mask, table_ref[:, :] - upd, table_ref[:, :])

    @pl.when(compute & is_g)
    def _():
        # post-update values live in table_out (apply or identity-copy)
        _gather_into(rows_out, cols_g_ref[:, :], table_out[:, :], lo,
                     newblk, tile, dtype)


def _fused_ftrl_kernel(tile_of, blk_u, blk_g, flags, cols_u_ref, grads_ref,
                       cols_g_ref, table_ref, acc_st_ref, lin_ref,
                       table_out, acc_out, lin_out, rows_out, acc_ref, *,
                       tile, dp, dim, fold, dtype, lr, l1, l2, inv_scale):
    j = pl.program_id(0)
    f = flags[j]
    first = (f & F_FIRST) != 0
    apply_ = (f & F_APPLY) != 0
    compute = (f & F_COMPUTE) != 0
    is_g = (f & F_GATHER) != 0
    newblk = (f & F_NEWBLK) != 0
    lo = tile_of[j] * tile

    @pl.when(first & is_g)
    def _():
        table_out[:, :] = table_ref[:, :]
        acc_out[:, :] = acc_st_ref[:, :]
        lin_out[:, :] = lin_ref[:, :]

    _combine(cols_u_ref[:, :], grads_ref[:, :], acc_ref, lo,
             first & ~is_g, compute & ~is_g, tile, dtype)

    @pl.when(apply_)
    def _():
        ga = acc_ref[:, :]
        G = ga[:dp, :] * inv_scale
        mask = _expand_touch(ga[dp:, :], dim, fold)
        w = table_ref[:, :]
        acc = acc_st_ref[:, :]
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

    @pl.when(compute & is_g)
    def _():
        _gather_into(rows_out, cols_g_ref[:, :], table_out[:, :], lo,
                     newblk, tile, dtype)


def _fused_call(kernel, state_arrays, cols_u, grads_aug, cols_g, extra_scalar,
                Vc, tile, chunk, interpret):
    dp = state_arrays[0].shape[0]
    n_g = cols_g.shape[0]
    cols_u_p = _prep_cols(cols_u, chunk)
    cols_g_p = _prep_cols(cols_g, chunk)
    pad_u = cols_u_p.shape[1] - cols_u.shape[0]
    grads_p = jnp.concatenate(
        [grads_aug, jnp.zeros((grads_aug.shape[0], pad_u), grads_aug.dtype)], axis=1
    )
    tile_of, blk_u, blk_g, flags, S = fused_schedule(
        cols_u, cols_g, Vc, tile, chunk,
        replay_pads=interpret or su.INTERPRET,
    )

    tile_spec = pl.BlockSpec((dp, tile), lambda j, t, u, g, f: (0, t[j]))
    in_specs = [
        pl.BlockSpec((1, chunk), lambda j, t, u, g, f: (0, u[j])),   # cols_u
        pl.BlockSpec((dp + AUG, chunk), lambda j, t, u, g, f: (0, u[j])),  # grads
        pl.BlockSpec((1, chunk), lambda j, t, u, g, f: (0, g[j])),   # cols_g
    ] + [tile_spec] * len(state_arrays)
    if extra_scalar is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    out_specs = [tile_spec] * len(state_arrays) + [
        pl.BlockSpec((dp, chunk), lambda j, t, u, g, f: (0, g[j]))  # rows out
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(S,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((dp + AUG, tile), jnp.float32)],
    )
    out_shape = [
        jax.ShapeDtypeStruct(a.shape, a.dtype) for a in state_arrays
    ] + [jax.ShapeDtypeStruct((dp, cols_g_p.shape[1]), jnp.float32)]
    # operand index k: 4 scalar-prefetch + cols_u/grads/cols_g = 7, then
    # the state arrays -> alias state array i (operand 7+i) to output i
    aliases = {7 + i: i for i in range(len(state_arrays))}
    args = [tile_of, blk_u, blk_g, flags, cols_u_p, grads_p, cols_g_p, *state_arrays]
    if extra_scalar is not None:
        args.append(extra_scalar)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret or su.INTERPRET,
    )(*args)
    return outs[: len(state_arrays)], outs[-1][:, :n_g]


def fused_adam_gather(
    table, m, v, cols_sorted, grads_aug, lr_t, next_cols_sorted, *,
    dim: int, fold: int = 1, b1: float = 0.9, b2: float = 0.999,
    eps: float = 1e-8, loss_scale: float = 1.0,
    tile: int = DEFAULT_TILE, chunk: int = DEFAULT_CHUNK,
    matmul_dtype=jnp.bfloat16, interpret: bool = False,
):
    """LazyAdam update + gather of ``next_cols_sorted`` from the updated
    table, one streaming pass.  Returns (table', m', v', next_rows)."""
    dp, Vc = table.shape
    assert Vc % tile == 0, (Vc, tile)
    kernel = functools.partial(
        _fused_adam_kernel,
        tile=tile, dp=dp, dim=dim, fold=fold, dtype=matmul_dtype,
        b1=b1, b2=b2, eps=eps, inv_scale=1.0 / loss_scale,
    )
    lr_arr = jnp.asarray([lr_t], jnp.float32)
    (t2, m2, v2), rows = _fused_call(
        kernel, [table, m, v], cols_sorted, grads_aug, next_cols_sorted,
        lr_arr, Vc, tile, chunk, interpret,
    )
    return t2, m2, v2, rows


def fused_ftrl_gather(
    table, accum, linear, cols_sorted, grads_aug, next_cols_sorted, *,
    dim: int, fold: int = 1, learning_rate: float = 5e-2, l1: float = 1e-8,
    l2: float = 1e-8, loss_scale: float = 1.0,
    tile: int = DEFAULT_TILE, chunk: int = DEFAULT_CHUNK,
    matmul_dtype=jnp.bfloat16, interpret: bool = False,
):
    """FTRL update + next-batch gather, one pass.  Returns
    (table', accum', linear', next_rows)."""
    dp, Vc = table.shape
    assert Vc % tile == 0, (Vc, tile)
    kernel = functools.partial(
        _fused_ftrl_kernel,
        tile=tile, dp=dp, dim=dim, fold=fold, dtype=matmul_dtype,
        lr=learning_rate, l1=l1, l2=l2, inv_scale=1.0 / loss_scale,
    )
    (t2, a2, l2_), rows = _fused_call(
        kernel, [table, accum, linear], cols_sorted, grads_aug,
        next_cols_sorted, None, Vc, tile, chunk, interpret,
    )
    return t2, a2, l2_, rows
