"""Streamed row-sparse optimizer updates on ROW-PACKED storage.

Companion to ``stream_update.py`` (feature-major [Dp, Vc] kernels);
these operate on the ``row_packed`` layout
(``ops/embedding.py:EmbeddingTableSpec.row_packed``): ``[rows, 128]``
with ``pack`` logical rows per 512-byte storage row.  Two structural
advantages over the feature-major kernels, both measured on the dev
chip (``benchmarks/sweep_gather_r5.py``):

* the one-hot combine matmul carries a FULL 128-lane output block
  (feature-major tables with Dp=16 drove the MXU at 1/8 utilization);
* the forward gather that shares this storage is ONE native XLA
  512-byte-row gather (no full-table stream), so the layout serves
  both directions.

Per grid step (tile i of ``tileR`` storage rows, gradient chunk c):

    P[tR, C]      = (rows_sorted[chunk_c] == i*tR + t)      # VPU
    g128[C, 128]  = tile(g_sel, pack) * lane_window(sub)     # VPU
    acc  [tR,128] += P . g128                                # MXU
    accT [tR,128] += P . lane_window(sub)                    # MXU
    # tile's last chunk: masked FTRL/Adam elementwise on [tR, 128]

``rows_sorted`` = ``unique_id // pack`` of the SORTED padded unique ids
(monotone, duplicates allowed — two logical rows sharing a storage row
land in disjoint lane windows); ``sub_sorted`` = ``unique_id % pack``.
``g_sel [N, d]`` carries each unique logical row's summed gradient.
Touch (lazy-update) semantics are exact: the same one-hot that places a
gradient also counts the logical row's lane window into ``accT``, so
untouched logical rows — including siblings sharing a touched storage
row — keep their parameter AND optimizer state.

Sentinel-padded unique slots carry ``rows >= n_rows`` and are scheduled
into no tile (``flat_schedule``).  Reference semantics:
``mindspore_rec/ops/embedding.py:189-195`` (unique-then-apply) and the
LazyAdam/FTRL split ``models/wide_deep/src/wide_and_deep.py:415-445``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mindrec_tpu.ops.pallas import stream_update as _su

DEFAULT_CHUNK = 256


def pick_row_tile(n_rows: int, state_bytes: int) -> int:
    """Largest tile (storage rows per streamed block) whose VMEM
    working set fits: ``state_bytes`` per lane-row for the in+out
    double-buffered state blocks, plus the two f32 accumulators."""
    budget = 14_000_000
    for cand in (2048, 1024, 512, 256, 128):
        if n_rows % cand:
            continue
        per_row = 128 * (2 * 2 * state_bytes + 2 * 4 * 2)
        if per_row * cand <= budget:
            return cand
    for cand in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if n_rows % cand == 0:
            return cand
    raise ValueError(f"no row tile divides {n_rows}")


def _lane_window(sub_c, dim: int, pack: int, n: int, dtype):
    """[C, 128] mask: lane l active iff l // dim == sub_c and
    l < pack*dim."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
    m = (lane // dim) == sub_c[:, None]
    if pack * dim < 128:
        m = jnp.logical_and(m, lane < pack * dim)
    return m.astype(dtype)


def _combine_rows(rows_blk, sub_blk, pres_blk, g_blk, acc, accT, lo, first,
                  compute, tile, dim, pack, dtype):
    @pl.when(first)
    def _():
        acc[:, :] = jnp.zeros_like(acc)
        accT[:, :] = jnp.zeros_like(accT)

    @pl.when(compute)
    def _():
        rows_c = rows_blk[0, :]  # [C]
        sub_c = sub_blk[0, :]
        C = rows_c.shape[0]
        rel = rows_c - lo
        t_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, C), 0)
        P = (t_iota == rel[None, :]).astype(dtype)  # [tR, C]
        W = _lane_window(sub_c, dim, pack, C, dtype)  # [C, 128]
        # presence gate (tiny-vocab path enumerates the whole id space as
        # its unique set; ids absent from the batch must not be touched).
        # 32-bit intermediate before the minor-dim insert: Mosaic only
        # supports [:, None] expansion on 32-bit vectors.
        pres_f = (pres_blk[0, :] > 0).astype(jnp.float32)[:, None]
        W = W * pres_f.astype(dtype)
        # broadcast/tile in f32 (32-bit) before casting to the matmul
        # dtype — Mosaic restricts minor-dim shape changes on narrow types
        g = g_blk[:, :dim]  # [C, d] f32
        if pack == 1:
            gt = g.astype(dtype)
        elif dim == 1:
            gt = jnp.broadcast_to(g[:, 0:1], (C, pack)).astype(dtype)
        else:
            gt = jnp.concatenate([g] * pack, axis=1).astype(dtype)
        if pack * dim < 128:
            gt = jnp.concatenate(
                [gt, jnp.zeros((C, 128 - pack * dim), gt.dtype)], axis=1
            )
        g128 = gt * W
        acc[:, :] += jax.lax.dot_general(
            P, g128, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        accT[:, :] += jax.lax.dot_general(
            P, W, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _adam_rows_kernel(tile_of, chunkblk, flags, rows_ref, sub_ref, pres_ref,
                      g_ref, table_ref, m_ref, v_ref, scal_ref, table_out,
                      m_out, v_out, acc, accT, *, tile, dim, pack, dtype, b1,
                      b2, eps, inv_scale):
    j = pl.program_id(0)
    f = flags[j]
    first = (f & 1) != 0
    islast = (f & 2) != 0
    compute = (f & 4) != 0
    lo = tile_of[j] * tile

    _combine_rows(rows_ref[:, :], sub_ref[:, :], pres_ref[:, :], g_ref[:, :],
                  acc, accT, lo, first, compute, tile, dim, pack, dtype)

    @pl.when(islast)
    def _():
        G = acc[:, :] * inv_scale
        mask = accT[:, :] > 0.0
        lr_t = scal_ref[0]
        m_old = m_ref[:, :].astype(jnp.float32)
        v_old = v_ref[:, :].astype(jnp.float32)
        m_new = b1 * m_old + (1.0 - b1) * G
        v_new = b2 * v_old + (1.0 - b2) * G * G
        upd = lr_t * m_new / (jnp.sqrt(v_new) + eps)
        m_out[:, :] = jnp.where(mask, m_new, m_old).astype(m_out.dtype)
        v_out[:, :] = jnp.where(mask, v_new, v_old).astype(v_out.dtype)
        w_old = table_ref[:, :].astype(jnp.float32)
        table_out[:, :] = jnp.where(mask, w_old - upd, w_old).astype(
            table_out.dtype
        )


def _ftrl_rows_kernel(tile_of, chunkblk, flags, rows_ref, sub_ref, pres_ref,
                      g_ref, table_ref, acc_st_ref, lin_ref, table_out,
                      acc_out, lin_out, acc, accT, *, tile, dim, pack, dtype,
                      lr, l1, l2, inv_scale):
    j = pl.program_id(0)
    f = flags[j]
    first = (f & 1) != 0
    islast = (f & 2) != 0
    compute = (f & 4) != 0
    lo = tile_of[j] * tile

    _combine_rows(rows_ref[:, :], sub_ref[:, :], pres_ref[:, :], g_ref[:, :],
                  acc, accT, lo, first, compute, tile, dim, pack, dtype)

    @pl.when(islast)
    def _():
        G = acc[:, :] * inv_scale
        mask = accT[:, :] > 0.0
        w = table_ref[:, :].astype(jnp.float32)
        a_old = acc_st_ref[:, :].astype(jnp.float32)
        lin = lin_ref[:, :].astype(jnp.float32)
        a_new = a_old + G * G
        sigma = (jnp.sqrt(a_new) - jnp.sqrt(a_old)) / lr
        lin_new = lin + G - sigma * w
        quad = jnp.sqrt(a_new) / lr + 2.0 * l2
        w_new = jnp.where(
            jnp.abs(lin_new) > l1, (jnp.sign(lin_new) * l1 - lin_new) / quad,
            0.0,
        )
        table_out[:, :] = jnp.where(mask, w_new, w).astype(table_out.dtype)
        acc_out[:, :] = jnp.where(mask, a_new, a_old).astype(acc_out.dtype)
        lin_out[:, :] = jnp.where(mask, lin_new, lin).astype(lin_out.dtype)


def _prep_rows(rows_sorted, sub_sorted, present, g_sel, n_rows, tile, chunk,
               interpret):
    n = rows_sorted.shape[0]
    pad = (-n) % chunk + chunk
    big = jnp.int32(2**31 - 2)
    rows_p = jnp.concatenate(
        [rows_sorted.astype(jnp.int32), jnp.full((pad,), big)]
    ).reshape(1, -1)
    sub_p = jnp.concatenate(
        [sub_sorted.astype(jnp.int32), jnp.zeros((pad,), jnp.int32)]
    ).reshape(1, -1)
    if present is None:
        present = jnp.ones((n,), jnp.int32)
    pres_p = jnp.concatenate(
        [present.astype(jnp.int32).reshape(-1),
         jnp.zeros((pad,), jnp.int32)]
    ).reshape(1, -1)
    d = g_sel.shape[1]
    if d < 8:  # keep the gradient block's lane dim at the sublane minimum
        g_sel = jnp.concatenate(
            [g_sel, jnp.zeros((n, 8 - d), g_sel.dtype)], axis=1
        )
        d = 8
    g_p = jnp.concatenate([g_sel, jnp.zeros((pad, d), g_sel.dtype)])
    tile_of, chunkblk, flags, S = _su.flat_schedule(
        rows_sorted.astype(jnp.int32), n_rows, tile, chunk,
        replay_pads=interpret or _su.INTERPRET,
    )
    return rows_p, sub_p, pres_p, g_p, tile_of, chunkblk, flags, S


def _rows_grid_spec(tile, chunk, dim, S, n_state: int, with_scalar: bool):
    tile_spec = pl.BlockSpec((tile, 128), lambda j, t, c, f: (t[j], 0))
    chunk_map = lambda j, t, c, f: (0, c[j])
    in_specs = [
        pl.BlockSpec((1, chunk), chunk_map),  # rows
        pl.BlockSpec((1, chunk), chunk_map),  # sub
        pl.BlockSpec((1, chunk), chunk_map),  # present
        pl.BlockSpec((chunk, dim), lambda j, t, c, f: (c[j], 0)),  # g_sel
    ] + [tile_spec] * n_state
    if with_scalar:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=in_specs,
        out_specs=[tile_spec] * n_state,
        scratch_shapes=[
            pltpu.VMEM((tile, 128), jnp.float32),  # grad accumulator
            pltpu.VMEM((tile, 128), jnp.float32),  # touch accumulator
        ],
    )


def streamed_adam_rows(
    table: jnp.ndarray,
    m: jnp.ndarray,
    v: jnp.ndarray,
    rows_sorted: jnp.ndarray,
    sub_sorted: jnp.ndarray,
    g_sel: jnp.ndarray,
    lr_t,
    *,
    dim: int,
    pack: int,
    present: jnp.ndarray | None = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    loss_scale: float = 1.0,
    tile: int | None = None,
    chunk: int = DEFAULT_CHUNK,
    matmul_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """One LazyAdam step over the touched logical rows of row_packed
    storage.  ``table/m/v``: [rows, 128]; ``g_sel``: [N, dim] f32 summed
    gradients aligned with ``rows_sorted``/``sub_sorted``."""
    n_rows = table.shape[0]
    if tile is None:
        tile = pick_row_tile(
            n_rows, table.dtype.itemsize + 2 * m.dtype.itemsize
        )
    assert n_rows % tile == 0, (n_rows, tile)
    rows_p, sub_p, pres_p, g_p, tile_of, chunkblk, flags, S = _prep_rows(
        rows_sorted, sub_sorted, present, g_sel, n_rows, tile, chunk,
        interpret
    )
    lr_arr = jnp.asarray([lr_t], jnp.float32)
    kernel = functools.partial(
        _adam_rows_kernel, tile=tile, dim=dim, pack=pack, dtype=matmul_dtype,
        b1=b1, b2=b2, eps=eps, inv_scale=1.0 / loss_scale,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=_rows_grid_spec(tile, chunk, g_p.shape[1], S, 3,
                                  with_scalar=True),
        out_shape=[
            jax.ShapeDtypeStruct(table.shape, table.dtype),
            jax.ShapeDtypeStruct(m.shape, m.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        # operand order: 3 scalar-prefetch + rows, sub, present, g,
        # table, m, v
        input_output_aliases={7: 0, 8: 1, 9: 2},
        interpret=interpret or _su.INTERPRET,
    )(tile_of, chunkblk, flags, rows_p, sub_p, pres_p, g_p, table, m, v,
      lr_arr)


def streamed_ftrl_rows(
    table: jnp.ndarray,
    accum: jnp.ndarray,
    linear: jnp.ndarray,
    rows_sorted: jnp.ndarray,
    sub_sorted: jnp.ndarray,
    g_sel: jnp.ndarray,
    *,
    dim: int,
    pack: int,
    present: jnp.ndarray | None = None,
    learning_rate: float = 5e-2,
    l1: float = 1e-8,
    l2: float = 1e-8,
    loss_scale: float = 1.0,
    tile: int | None = None,
    chunk: int = DEFAULT_CHUNK,
    matmul_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """One FTRL-proximal step over the touched logical rows of
    row_packed storage (lr_power fixed -0.5, the reference default)."""
    n_rows = table.shape[0]
    if tile is None:
        tile = pick_row_tile(
            n_rows, table.dtype.itemsize + 2 * accum.dtype.itemsize
        )
    assert n_rows % tile == 0, (n_rows, tile)
    rows_p, sub_p, pres_p, g_p, tile_of, chunkblk, flags, S = _prep_rows(
        rows_sorted, sub_sorted, present, g_sel, n_rows, tile, chunk,
        interpret
    )
    kernel = functools.partial(
        _ftrl_rows_kernel, tile=tile, dim=dim, pack=pack, dtype=matmul_dtype,
        lr=learning_rate, l1=l1, l2=l2, inv_scale=1.0 / loss_scale,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=_rows_grid_spec(tile, chunk, g_p.shape[1], S, 3,
                                  with_scalar=False),
        out_shape=[
            jax.ShapeDtypeStruct(table.shape, table.dtype),
            jax.ShapeDtypeStruct(accum.shape, accum.dtype),
            jax.ShapeDtypeStruct(linear.shape, linear.dtype),
        ],
        input_output_aliases={7: 0, 8: 1, 9: 2},
        interpret=interpret or _su.INTERPRET,
    )(tile_of, chunkblk, flags, rows_p, sub_p, pres_p, g_p, table, accum,
      linear)
