"""Streamed Pallas kernels composed with the (data, model) mesh.

The reference's flagship distributed regime is sharded-embedding
training where the engine moves rows, never tables, at full speed
(TABLE_ROW_SLICE under AUTO_PARALLEL,
``models/wide_deep/src/wide_and_deep.py:232-249``).  mindrec_tpu's
single-chip fast path is the scatter-free streamed kernel set
(``ops/pallas/``); this module runs those same kernels **per shard**
under ``shard_map`` so the flagship sparse config stays streamed on a
real multi-chip mesh.

Why no id all-to-all is needed (unlike ``ops/a2a.py``): the streamed
step's unique ids are globally **sorted**, and row-slicing shards the
feature-major ``[Dp, Vc]`` storage into **contiguous** vocab blocks
(``NamedSharding P(None, "model")``).  Ownership is therefore monotone
in the sorted unique vector — each model shard's owned ids form one
contiguous run — so shard ``m`` selects its work with a clip:

    cols_local = max(uq_cols - m * Vc_local, -1)

which stays ascending; ids below the shard's block collapse to ``-1``
(before every table tile — the schedules skip them), ids above stay
huge (past every tile).  The kernels then stream only the owned run.

Collectives (all batch-scale, never table-scale — the property
``tests/test_sharded_stream.py`` pins on the HLO):

* forward: each shard gathers its owned unique rows into the shared
  ``[U, width]`` row-major buffer; one ``psum`` over the model axis
  rebuilds the full unique-row block (disjoint writes, zeros
  elsewhere).
* backward: each **data** shard segment-sums its local positions'
  gradients directly in GLOBAL unique order; one ``psum`` over the
  data axis combines the partials.  The global order comes from a
  trick: concatenate the (replicated) global unique vector onto the
  shard's local ids before the local sort — every global unique id is
  then present locally, so cumsum-of-new-flags unique indices equal
  the global unique index AND step by one (the streamed segsum's
  contract); the injected positions read a zero-gradient row.
* update: each model shard applies the streamed FTRL/LazyAdam kernels
  to its local table/optimizer-state block for its owned columns only
  (lazy semantics preserved: unowned columns are untouched).

Contract: the unique bucket must hold every distinct id of the batch
(the host prep's ``BucketOverflow`` guarantee).  An id missing from
``uq`` would not just read zeros here — it would shift the global
unique indexing — so the fail-loud host audit is load-bearing.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.8 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from mindrec_tpu.ops.pallas import stream_update as su
from mindrec_tpu.ops.pallas.stream_gather import streamed_gather_rows
from mindrec_tpu.ops.pallas.stream_segsum import (
    streamed_segsum,
    streamed_segsum_unsorted,
)

MODEL_AXIS = "model"
DATA_AXIS = "data"


def _owned_cols(uq_cols, vc_local: int, axis: str):
    """Global sorted storage columns -> this shard's local columns.

    Stays ascending: below-range ids collapse to -1 (skipped by the
    kernels' searchsorted schedules), above-range ids stay past the
    last local tile."""
    m = lax.axis_index(axis)
    return jnp.maximum(uq_cols - m * vc_local, -1)


def gather_rows_sharded(
    mesh,
    tables: list,
    uq_cols_list: list,
    lane_offsets: list,
    tiles: list,
    ub: int,
    width: int,
    *,
    matmul_dtype=jnp.bfloat16,
    axis: str = MODEL_AXIS,
):
    """Streamed row-major gather of sorted unique columns from row-sliced
    tables; returns the ``[ub, width]`` f32 buffer replicated over the
    mesh (one model-axis psum; writes are disjoint per shard).

    ``tables``: global ``[Dp_t, Vc_t]`` arrays sharded ``P(None, axis)``;
    ``uq_cols_list``: per-table ``[ub]`` i32 ascending global storage
    columns (replicated); ``lane_offsets``/``tiles``: static per-table.
    """
    n_shards = mesh.shape[axis]

    def body(uqs, *tbls):
        buf = jnp.zeros((ub, width), jnp.float32)
        for tbl, uqc, off, tl in zip(tbls, uqs, lane_offsets, tiles):
            cols_local = _owned_cols(uqc, tbl.shape[1], axis)
            buf = streamed_gather_rows(
                tbl, cols_local, buf, lane_offset=off, tile=tl,
                matmul_dtype=matmul_dtype,
            )
        return lax.psum(buf, axis)

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(),) + tuple(P(None, axis) for _ in tables),
        out_specs=P(None, None),
        check_vma=False,
    )(tuple(uq_cols_list), *tables)


def gather_cols_sharded(
    mesh,
    tables: list,
    uq_cols_list: list,
    lane_offsets: list,
    dpl_list: list,
    tiles: list,
    ub: int,
    width: int,
    *,
    matmul_dtype=jnp.bfloat16,
    axis: str = MODEL_AXIS,
):
    """COLUMN-sliced twin of :func:`gather_rows_sharded`: the sublane
    (feature) axis is sharded ``P(axis, None)``, so every shard sees
    every id — no ownership clip, no vocab partitioning.  Shard ``m``
    streams its local ``[Dp/M, Vc]`` block over the FULL sorted unique
    vector into sublane window ``[off + m*dpl, off + (m+1)*dpl)`` of
    the shared buffer; one model-axis psum merges the disjoint lane
    windows (batch-scale, like the row-slice case).

    The per-shard lane placement is dynamic (depends on
    ``lax.axis_index``) while the pallas kernel's ``lane_offset`` is
    static, so each shard gathers into lanes ``[0, dpl)`` of a local
    scratch and places them with one tiny one-hot shift matmul
    (``[ub,128] x [128,width]`` — microseconds at any real ``ub``)."""

    def body(uqs, *tbls):
        m = lax.axis_index(axis)
        buf = jnp.zeros((ub, width), jnp.float32)
        for tbl, uqc, off, dpl, tl in zip(
            tbls, uqs, lane_offsets, dpl_list, tiles
        ):
            scratch = streamed_gather_rows(
                tbl, uqc, jnp.zeros((ub, 128), jnp.float32),
                lane_offset=0, tile=tl, matmul_dtype=matmul_dtype,
            )  # local lanes [0, dpl)
            dst0 = off + m * dpl
            src = lax.broadcasted_iota(jnp.int32, (128, width), 0)
            dst = lax.broadcasted_iota(jnp.int32, (128, width), 1)
            S = jnp.logical_and(
                dst == src + dst0, src < dpl
            ).astype(scratch.dtype)
            buf = buf + scratch @ S
        return lax.psum(buf, axis)

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(),) + tuple(P(axis, None) for _ in tables),
        out_specs=P(None, None),
        check_vma=False,
    )(tuple(uq_cols_list), *tables)


def adam_colsliced_sharded(
    mesh,
    table,
    m,
    v,
    uq_cols,
    grads_aug,
    lr_t,
    *,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    loss_scale: float = 1.0,
    tile: int,
    matmul_dtype=jnp.bfloat16,
    axis: str = MODEL_AXIS,
):
    """Column-sliced LazyAdam: shard ``m`` slices ITS sublane rows
    ``[m*dpl, (m+1)*dpl)`` from the replicated ``[Dp+8, ub]``
    touch-augmented grad block (the shared touch rows ride along) and
    streams its local ``[Dp/M, Vc]`` state over the FULL sorted unique
    columns — no collective at all (grads arrive replicated from the
    data-axis psum).  fold==1 only (column-slicing a folded scalar
    table is rejected upstream)."""
    n_shards = mesh.shape[axis]
    dp_global = grads_aug.shape[0] - su.AUG
    dpl = dp_global // n_shards

    def body(tbl, mm, vv, uqc, ga, lr):
        midx = lax.axis_index(axis)
        g_l = lax.dynamic_slice(ga, (midx * dpl, 0), (dpl, ga.shape[1]))
        touch = ga[dp_global:]
        ga_l = jnp.concatenate([g_l, touch])
        return su.streamed_adam_cols(
            tbl, mm, vv, uqc, ga_l, lr, dim=dpl, fold=1, b1=b1, b2=b2,
            eps=eps, loss_scale=loss_scale, tile=tile,
            matmul_dtype=matmul_dtype,
        )

    ts = P(axis, None)
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(ts, ts, ts, P(), P(None, None), P()),
        out_specs=(ts, ts, ts),
        check_vma=False,
    )(table, m, v, uq_cols, grads_aug, lr_t)


def ftrl_colsliced_sharded(
    mesh,
    table,
    accum,
    linear,
    uq_cols,
    grads_aug,
    *,
    learning_rate: float = 5e-2,
    l1: float = 1e-8,
    l2: float = 1e-8,
    loss_scale: float = 1.0,
    tile: int,
    matmul_dtype=jnp.bfloat16,
    axis: str = MODEL_AXIS,
):
    """Column-sliced FTRL twin of :func:`adam_colsliced_sharded`."""
    n_shards = mesh.shape[axis]
    dp_global = grads_aug.shape[0] - su.AUG
    dpl = dp_global // n_shards

    def body(tbl, acc, lin, uqc, ga):
        midx = lax.axis_index(axis)
        g_l = lax.dynamic_slice(ga, (midx * dpl, 0), (dpl, ga.shape[1]))
        touch = ga[dp_global:]
        ga_l = jnp.concatenate([g_l, touch])
        return su.streamed_ftrl_cols(
            tbl, acc, lin, uqc, ga_l, dim=dpl, fold=1,
            learning_rate=learning_rate, l1=l1, l2=l2,
            loss_scale=loss_scale, tile=tile, matmul_dtype=matmul_dtype,
        )

    ts = P(axis, None)
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(ts, ts, ts, P(), P(None, None)),
        out_specs=(ts, ts, ts),
        check_vma=False,
    )(table, accum, linear, uq_cols, grads_aug)


def partial_segsum_sharded(
    mesh,
    g_delta: jnp.ndarray,
    ids_flat: jnp.ndarray,
    uq: jnp.ndarray,
    ub: int,
    *,
    matmul_dtype=jnp.bfloat16,
    data_axis: str = DATA_AXIS,
):
    """Per-data-shard streamed segment-sum of batch-order position grads
    into GLOBAL unique order, psum'd over the data axis.

    ``g_delta``: ``[N, width]`` batch-order grads, sharded ``P(data)``;
    ``ids_flat``: ``[N]`` raw ids in batch order, sharded ``P(data)``;
    ``uq``: ``[ub]`` sorted sentinel-padded global unique ids,
    replicated.  Returns ``[width, ub]`` f32 replicated.
    """

    def body(g_l, ids_l, uq_r):
        n_l = ids_l.shape[0]
        # inject the global unique vector: every global unique id is now
        # present locally, so local cumsum-of-new-flags unique indices
        # equal the GLOBAL unique index and step by one (the segsum
        # kernel's contract); injected rows read the zero pad block.
        ids_aug = jnp.concatenate([ids_l.astype(jnp.int32), uq_r])
        iota = jnp.arange(n_l + ub, dtype=jnp.int32)
        sorted_ids, perm = lax.sort_key_val(ids_aug, iota)
        newv = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
        )
        uidx_sorted = jnp.cumsum(newv.astype(jnp.int32)) - 1
        g_z = jnp.concatenate(
            [g_l, jnp.zeros((ub, g_l.shape[1]), g_l.dtype)]
        )
        g_sorted = g_z[perm]
        part = streamed_segsum(
            g_sorted, uidx_sorted, row_major=True, n_out=ub,
            matmul_dtype=matmul_dtype,
        )
        return lax.psum(part, data_axis)

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(data_axis), P()),
        out_specs=P(None, None),
        check_vma=False,
    )(g_delta, ids_flat, uq)


def unsorted_segsum_sharded(
    mesh,
    g_delta: jnp.ndarray,
    ids_flat: jnp.ndarray,
    ub: int,
    *,
    matmul_dtype=jnp.bfloat16,
    data_axis: str = DATA_AXIS,
):
    """Tiny-vocab twin of :func:`partial_segsum_sharded`: raw ids ARE
    the segment ids (no sort anywhere), each data shard reduces its
    positions with ``streamed_segsum_unsorted``, one data-axis psum
    combines.  Returns ``[width, ub]`` f32 replicated."""

    def body(g_l, ids_l):
        part = streamed_segsum_unsorted(
            g_l, ids_l, ub, matmul_dtype=matmul_dtype
        )
        return lax.psum(part, data_axis)

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(data_axis)),
        out_specs=P(None, None),
        check_vma=False,
    )(g_delta, ids_flat)


def adam_cols_sharded(
    mesh,
    table,
    m,
    v,
    uq_cols,
    grads_aug,
    lr_t,
    *,
    dim: int,
    fold: int = 1,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    loss_scale: float = 1.0,
    tile: int,
    matmul_dtype=jnp.bfloat16,
    axis: str = MODEL_AXIS,
):
    """Row-sliced LazyAdam: each model shard streams its owned columns
    through ``streamed_adam_cols`` on its local ``[Dp, Vc/M]`` block.
    ``tile`` must divide the LOCAL column count."""

    def body(tbl, mm, vv, uqc, ga, lr):
        cols_local = _owned_cols(uqc, tbl.shape[1], axis)
        return su.streamed_adam_cols(
            tbl, mm, vv, cols_local, ga, lr,
            dim=dim, fold=fold, b1=b1, b2=b2, eps=eps,
            loss_scale=loss_scale, tile=tile, matmul_dtype=matmul_dtype,
        )

    ts = P(None, axis)
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(ts, ts, ts, P(), P(None, None), P()),
        out_specs=(ts, ts, ts),
        check_vma=False,
    )(table, m, v, uq_cols, grads_aug, lr_t)


def ftrl_cols_sharded(
    mesh,
    table,
    accum,
    linear,
    uq_cols,
    grads_aug,
    *,
    dim: int,
    fold: int = 1,
    learning_rate: float = 5e-2,
    l1: float = 1e-8,
    l2: float = 1e-8,
    loss_scale: float = 1.0,
    tile: int,
    matmul_dtype=jnp.bfloat16,
    axis: str = MODEL_AXIS,
):
    """Row-sliced FTRL twin of :func:`adam_cols_sharded`."""

    def body(tbl, acc, lin, uqc, ga):
        cols_local = _owned_cols(uqc, tbl.shape[1], axis)
        return su.streamed_ftrl_cols(
            tbl, acc, lin, cols_local, ga,
            dim=dim, fold=fold, learning_rate=learning_rate, l1=l1, l2=l2,
            loss_scale=loss_scale, tile=tile, matmul_dtype=matmul_dtype,
        )

    ts = P(None, axis)
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(ts, ts, ts, P(), P(None, None)),
        out_specs=(ts, ts, ts),
        check_vma=False,
    )(table, accum, linear, uq_cols, grads_aug)
