"""Streamed column-sparse optimizer updates — the scatter-free hot path.

Motivation (measured on v5e): XLA's TPU scatter applies 624k row
updates to a 5.86M-row table in ~69-79 ms (per-row serialization), and
the reference's sparse-optimizer step needs SIX of those (table + 2
state arrays x 2 optimizers).  These kernels replace every scatter with
a streaming pass over the table's *touched tiles*: each tile is pumped
HBM->VMEM->HBM at memory bandwidth, and combines its slice of the batch
gradient with a one-hot matmul on the MXU.

Storage is **feature-major** ``[Dp, Vc]`` (see
``ops/embedding.py:EmbeddingTableSpec``): the vocab axis is minor-most
(lanes), features live on sublanes.  This is the layout XLA itself
prefers for narrow tables, so no relayout copies appear between the
kernels and the rest of the jitted step — and no lane padding blows up
memory (a row-major [5.86M, 16] table padded to 128 lanes costs 3 GB;
feature-major costs its logical 375 MB).

Execution model — flat (tile, chunk) grid: the grid has one step per
(table tile, gradient chunk) pair, laid out by a schedule computed from
``searchsorted`` windows (``_flat_schedule``).  Pallas's pipeline then
double-buffers every DMA automatically (the previous manual
start/wait-per-chunk version serialized DMA latency into the loop:
13.9 ms for the benchmark adam update vs ~3 ms here), revisited blocks
(consecutive steps on one tile) are copied once, and tiles with NO
touched ids get no steps at all — their rows stay in HBM untouched via
the input/output aliasing.  On skewed (production) id distributions
this makes update cost proportional to the touched working set, not
the vocab.

Per step (tile i, chunk c):

    P[t, c]    = (cols_sorted[chunk_c] == i*T + t)        # VPU compare
    acc[Dp+8,T]+= grads_aug[Dp+8, C] . P^T                 # MXU
    # on the tile's last chunk: masked FTRL/Adam update on [Dp, T]

``grads_aug`` carries 8 extra *touch-indicator* rows: row ``Dp + r`` is
1 where the position's fold-sub-row is ``r`` (row 0 = all-ones when the
table is unfolded).  The same one-hot matmul that combines gradients
therefore also produces an exact per-logical-row touch count — the mask
for lazy (touched-rows-only) update semantics, correct even when
several logical rows share a storage column.

Requirements: ``cols`` sorted ascending (one host/device sort of the
raw ids serves every table: ``col = id // fold`` is monotone); grads
aligned with cols; duplicates allowed — P sums their gradients, which
matches the reference's unique-then-apply sparse optimizer semantics
(``mindspore_rec/ops/embedding.py:189-195``,
``models/wide_deep/src/wide_and_deep.py:415-430``).

LazyAdam semantics hold exactly: untouched logical rows (touch == 0)
keep their moments; bias correction uses the global step (passed in as
lr_t).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 2048  # storage columns per streamed tile
DEFAULT_CHUNK = 256  # gradient columns combined per grid step
AUG = 8  # touch-indicator rows appended to the gradient (sublane unit)

# Global interpret-mode override (tests set True to run the kernels on the
# CPU backend; pl.pallas_call(interpret=...) ORs with this).
INTERPRET = False

# One-hot build strategy in _combine (sweep knob; factorized is the
# cheap-VPU hi/lo build, False = direct [T, C] iota-compare).
FACTORIZED = True

# Sweep knob: drop input_output_aliases (costs HBM, isolates pipeline serialization).
NO_ALIAS = False


def make_aug_grads(grads_t: jnp.ndarray, sub: jnp.ndarray | None) -> jnp.ndarray:
    """[Dp, N] grads -> [Dp+8, N] grads with touch-indicator rows.

    ``sub``: per-position fold sub-row (``id % fold``), or None for an
    unfolded table (indicator row 0 = 1 everywhere).
    """
    dp, n = grads_t.shape
    if sub is None:
        touch = jnp.concatenate(
            [jnp.ones((1, n), grads_t.dtype), jnp.zeros((AUG - 1, n), grads_t.dtype)]
        )
    else:
        r_idx = jax.lax.broadcasted_iota(jnp.int32, (AUG, n), 0)
        touch = (r_idx == sub[None, :]).astype(grads_t.dtype)
    return jnp.concatenate([grads_t, touch])


def _expand_touch(touch, dim: int, fold: int):
    """[8, T] touch rows -> [Dp, T] per-element mask.

    fold == 1: row 0 broadcasts over all Dp sublanes.
    fold  > 1: logical row r owns storage sublanes [r*dim, (r+1)*dim);
    with dim == 1 (the only folded case used) the touch rows align 1:1.
    """
    if fold == 1:
        return touch[0:1, :] > 0.0
    if dim == 1:
        return touch[:fold, :] > 0.0
    raise NotImplementedError("fold > 1 requires emb_dim == 1")


# ---------------------------------------------------------------------------
# flat schedule
# ---------------------------------------------------------------------------


_BC_CAP = 200_000_000  # broadcast-compare lanes before falling back


def searchsorted_bc(a, v, side: str = "left"):
    """Exact ``jnp.searchsorted`` replacement via one broadcast
    compare + reduce.  TPU lowers ``jnp.searchsorted`` to a serialized
    log-N while loop of tiny gathers — pure dispatch latency (~0.8 ms
    of every sparse train step went to the schedule builders' binary
    searches).  At schedule sizes (|a|·|v| ≤ ~100M) one vectorized
    [|v|, |a|] compare pass is far cheaper and bit-identical.  Larger
    products are CHUNKED along v (bounded [chunk, |a|] broadcasts via
    lax.map) so memory stays capped without the serialized while path —
    the multitable emb128 schedule (8e8 lanes) cost 4.3 ms/step through
    the while fallback this replaces."""
    a = jnp.asarray(a)
    v_arr = jnp.asarray(v)
    scalar = v_arr.ndim == 0
    vv = v_arr.reshape(-1)

    def compare(vb):
        if side == "left":
            c = a[None, :] < vb[:, None]
        else:
            c = a[None, :] <= vb[:, None]
        return jnp.sum(c, axis=1, dtype=jnp.int32)

    if int(a.size) * int(vv.size) > _BC_CAP:
        chunk = max(128, _BC_CAP // max(int(a.size), 1))
        pad = (-int(vv.size)) % chunk
        vp = (
            jnp.concatenate([vv, jnp.zeros((pad,), vv.dtype)]) if pad else vv
        )
        out = jax.lax.map(compare, vp.reshape(-1, chunk)).reshape(-1)
        out = out[: vv.size]
        return out[0] if scalar else out
    out = compare(vv)
    return out[0] if scalar else out


def flat_schedule(cols_sorted, Vc: int, tile: int, chunk: int,
                  replay_pads: bool):
    """Static-size per-grid-step schedule over (tile, chunk) pairs.

    Step j processes gradient chunk ``chunkblk[j]`` against table tile
    ``tile_of[j]``.  Only nonempty tiles get steps; the schedule is
    padded to the static worst case with replays of the final real step
    (``replay_pads=True``, interpret mode: pads recompute + rewrite the
    same values — idempotent; compiled mode: pads are fully inert and
    the pipeline's flush-on-index-change persists the real last write).

    Returns (tile_of, chunkblk, flags, n_steps) — flags[j] packs
    first/last/compute bits.
    """
    n = cols_sorted.shape[0]
    ntiles = Vc // tile
    S = n // chunk + 2 * ntiles + 2  # static upper bound on real steps

    boundaries = jnp.arange(ntiles + 1, dtype=jnp.int32) * tile
    starts = searchsorted_bc(cols_sorted, boundaries)
    s0 = (starts[:-1] // chunk) * chunk
    cnt = jnp.where(
        starts[1:] > starts[:-1],
        (starts[1:] - s0 + chunk - 1) // chunk,
        0,  # tile owns no ids: skip entirely (rows persist via aliasing)
    )
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt)])
    total = offs[-1]

    j = jnp.arange(S, dtype=jnp.int32)
    t = jnp.clip(searchsorted_bc(offs, j, side="right") - 1, 0, ntiles - 1)
    valid = j < total
    # padded steps replay the last real step (same tile & chunk index)
    j_eff = jnp.where(valid, j, total - 1)
    t = jnp.clip(searchsorted_bc(offs, j_eff, side="right") - 1, 0, ntiles - 1)
    k = j_eff - offs[t]
    chunkblk = s0[t] // chunk + k
    first = (k == 0) & valid
    islast = k == (cnt[t] - 1)
    compute = valid  # pads never accumulate (acc must not double-count)
    if not replay_pads:
        # compiled mode: pads are fully inert; the pipeline flushes the
        # real last write on index change / grid end.  Interpret mode
        # writes blocks back every step, so there pads must replay the
        # final elementwise write (idempotent: same acc, same inputs).
        islast = islast & valid
    flags = (
        first.astype(jnp.int32)
        + 2 * islast.astype(jnp.int32)
        + 4 * compute.astype(jnp.int32)
    )
    return t.astype(jnp.int32), chunkblk.astype(jnp.int32), flags, S


def _prep(cols_sorted, grads_aug, Vc, tile, chunk, interpret):
    """Shared operand prep: sentinel-pad to a chunk multiple + schedule."""
    n = cols_sorted.shape[0]
    pad = (-n) % chunk + chunk
    cols_p = jnp.concatenate(
        [cols_sorted.astype(jnp.int32), jnp.full((pad,), jnp.int32(2**31 - 2))]
    ).reshape(1, -1)
    grads_p = jnp.concatenate(
        [grads_aug, jnp.zeros((grads_aug.shape[0], pad), grads_aug.dtype)], axis=1
    )
    tile_of, chunkblk, flags, S = flat_schedule(
        cols_sorted, Vc, tile, chunk, replay_pads=interpret or INTERPRET
    )
    return cols_p, grads_p, tile_of, chunkblk, flags, S


def _combine(cols_blk, grads_blk, acc_ref, lo, first, compute, tile, dtype):
    """acc += grads_aug_chunk . P^T for this grid step.

    The one-hot P[T, C] is never materialized: building it costs a
    [T, C] iota+compare+cast on the VPU (~2k vreg-ops at T=2048,C=256,
    the dominant per-step cost of the first version of these kernels).
    Factorize col == lo + hi*128 + lane instead: one [128, C] lane
    compare shared by all sub-blocks, then per 128-lane sub-block h a
    cheap [C] hi-compare masks the gradients and one MXU matmul lands
    the result directly in acc's lane slice — ~8x less VPU work for
    identical MXU work.
    """

    @pl.when(first)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    @pl.when(compute)
    def _():
        cols_c = cols_blk[0, :]  # [chunk] i32
        rel = cols_c - lo
        if tile % 128 != 0 or not FACTORIZED:
            # small test tiles / sweep baseline: direct [T, C] one-hot
            t_iota = jax.lax.broadcasted_iota(
                jnp.int32, (tile, cols_c.shape[0]), 0
            )
            P = (t_iota == rel[None, :]).astype(dtype)
            acc_ref[:, :] += jax.lax.dot_general(
                grads_blk.astype(dtype),
                P,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return
        # out-of-tile columns (boundary chunks, sentinel pads): hi lands
        # outside [0, tile/128) -- negative rel keeps hi negative under
        # the arithmetic shift -- so the hi mask zeroes them.
        hi = jax.lax.shift_right_arithmetic(rel, 7)
        lane = jax.lax.bitwise_and(rel, 127)
        lane_iota = jax.lax.broadcasted_iota(
            jnp.int32, (128, cols_c.shape[0]), 0
        )
        B = (lane_iota == lane[None, :]).astype(dtype)  # [128, C]
        g = grads_blk
        for h in range(tile // 128):
            gh = (g * (hi == h)[None, :].astype(g.dtype)).astype(dtype)
            acc_ref[:, h * 128 : (h + 1) * 128] += jax.lax.dot_general(
                gh,
                B,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


# ---------------------------------------------------------------------------
# LazyAdam
# ---------------------------------------------------------------------------


def _adam_kernel(tile_of, chunkblk, flags, cols_ref, grads_ref, table_ref,
                 m_ref, v_ref, scal_ref, table_out, m_out, v_out, acc_ref, *,
                 tile, dp, dim, fold, dtype, b1, b2, eps, inv_scale):
    j = pl.program_id(0)
    f = flags[j]
    first = (f & 1) != 0
    islast = (f & 2) != 0
    compute = (f & 4) != 0
    lo = tile_of[j] * tile

    _combine(cols_ref[:, :], grads_ref[:, :], acc_ref, lo, first, compute,
             tile, dtype)

    @pl.when(islast)
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
        w_old = table_ref[:, :].astype(jnp.float32)
        table_out[:, :] = jnp.where(mask, w_old - upd, w_old).astype(
            table_out.dtype
        )


def _update_grid_spec(dp, tile, chunk, S, n_state: int, with_scalar: bool):
    """Grid/block layout shared by the adam & ftrl kernels.

    Operands: cols (1, Np), grads_aug (Dp+8, Np), then ``n_state``
    table-shaped arrays, then an optional SMEM scalar.
    """
    tile_spec = pl.BlockSpec((dp, tile), lambda j, t, c, f: (0, t[j]))
    chunk_map = lambda j, t, c, f: (0, c[j])
    in_specs = [
        pl.BlockSpec((1, chunk), chunk_map),  # cols
        pl.BlockSpec((dp + AUG, chunk), chunk_map),  # grads_aug
    ] + [tile_spec] * n_state
    if with_scalar:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # tile_of, chunkblk, flags
        grid=(S,),
        in_specs=in_specs,
        out_specs=[tile_spec] * n_state,
        scratch_shapes=[pltpu.VMEM((dp + AUG, tile), jnp.float32)],
    )


def streamed_adam_cols(
    table: jnp.ndarray,
    m: jnp.ndarray,
    v: jnp.ndarray,
    cols_sorted: jnp.ndarray,
    grads_aug: jnp.ndarray,
    lr_t,
    *,
    dim: int,
    fold: int = 1,
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
      table/m/v: [Dp, Vc] f32 feature-major storage (Vc % tile == 0).
      cols_sorted: [N] i32 ascending storage columns.
      grads_aug: [Dp+8, N] f32 — masked grads + touch rows
        (:func:`make_aug_grads`); duplicates get summed.
      lr_t: scalar bias-corrected learning rate for this step.
    Returns: (table', m', v').
    """
    dp, Vc = table.shape
    assert Vc % tile == 0, (Vc, tile)
    cols_p, grads_p, tile_of, chunkblk, flags, S = _prep(
        cols_sorted, grads_aug, Vc, tile, chunk, interpret
    )
    lr_arr = jnp.asarray([lr_t], jnp.float32)
    kernel = functools.partial(
        _adam_kernel,
        tile=tile, dp=dp, dim=dim, fold=fold, dtype=matmul_dtype,
        b1=b1, b2=b2, eps=eps, inv_scale=1.0 / loss_scale,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=_update_grid_spec(dp, tile, chunk, S, 3, with_scalar=True),
        out_shape=[
            jax.ShapeDtypeStruct((dp, Vc), table.dtype),
            jax.ShapeDtypeStruct((dp, Vc), m.dtype),
            jax.ShapeDtypeStruct((dp, Vc), v.dtype),
        ],
        # in-place: table/m/v buffers are reused for the outputs (indices
        # count pallas_call operands including the 3 scalar-prefetch args)
        input_output_aliases={} if NO_ALIAS else {5: 0, 6: 1, 7: 2},
        interpret=interpret or INTERPRET,
    )(tile_of, chunkblk, flags, cols_p, grads_p, table, m, v, lr_arr)


# ---------------------------------------------------------------------------
# FTRL
# ---------------------------------------------------------------------------


def _ftrl_kernel(tile_of, chunkblk, flags, cols_ref, grads_ref, table_ref,
                 acc_st_ref, lin_ref, table_out, acc_out, lin_out, acc_ref, *,
                 tile, dp, dim, fold, dtype, lr, l1, l2, inv_scale):
    j = pl.program_id(0)
    f = flags[j]
    first = (f & 1) != 0
    islast = (f & 2) != 0
    compute = (f & 4) != 0
    lo = tile_of[j] * tile

    _combine(cols_ref[:, :], grads_ref[:, :], acc_ref, lo, first, compute,
             tile, dtype)

    @pl.when(islast)
    def _():
        ga = acc_ref[:, :]
        G = ga[:dp, :] * inv_scale
        mask = _expand_touch(ga[dp:, :], dim, fold)
        w = table_ref[:, :].astype(jnp.float32)
        acc = acc_st_ref[:, :].astype(jnp.float32)
        lin = lin_ref[:, :].astype(jnp.float32)
        acc_new = acc + G * G
        sigma = (jnp.sqrt(acc_new) - jnp.sqrt(acc)) / lr
        lin_new = lin + G - sigma * w
        quad = jnp.sqrt(acc_new) / lr + 2.0 * l2
        w_new = jnp.where(
            jnp.abs(lin_new) > l1, (jnp.sign(lin_new) * l1 - lin_new) / quad, 0.0
        )
        table_out[:, :] = jnp.where(mask, w_new, w).astype(table_out.dtype)
        acc_out[:, :] = jnp.where(mask, acc_new, acc).astype(acc_out.dtype)
        lin_out[:, :] = jnp.where(mask, lin_new, lin).astype(lin_out.dtype)


def streamed_ftrl_cols(
    table: jnp.ndarray,
    accum: jnp.ndarray,
    linear: jnp.ndarray,
    cols_sorted: jnp.ndarray,
    grads_aug: jnp.ndarray,
    *,
    dim: int,
    fold: int = 1,
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
    Same contract as :func:`streamed_adam_cols` (lr_power fixed -0.5)."""
    dp, Vc = table.shape
    assert Vc % tile == 0, (Vc, tile)
    cols_p, grads_p, tile_of, chunkblk, flags, S = _prep(
        cols_sorted, grads_aug, Vc, tile, chunk, interpret
    )
    kernel = functools.partial(
        _ftrl_kernel,
        tile=tile, dp=dp, dim=dim, fold=fold, dtype=matmul_dtype,
        lr=learning_rate, l1=l1, l2=l2, inv_scale=1.0 / loss_scale,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=_update_grid_spec(dp, tile, chunk, S, 3, with_scalar=False),
        out_shape=[
            jax.ShapeDtypeStruct((dp, Vc), table.dtype),
            jax.ShapeDtypeStruct((dp, Vc), accum.dtype),
            jax.ShapeDtypeStruct((dp, Vc), linear.dtype),
        ],
        input_output_aliases={5: 0, 6: 1, 7: 2},
        interpret=interpret or INTERPRET,
    )(tile_of, chunkblk, flags, cols_p, grads_p, table, accum, linear)
