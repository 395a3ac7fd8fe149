"""Explicit all-to-all embedding exchange for row-sliced tables.

The reference's hybrid-parallel embedding (TABLE_ROW_SLICE under
AUTO_PARALLEL, ``models/wide_deep/src/wide_and_deep.py:232-249``) relies
on the MindSpore engine to insert the cross-device id/row exchange.  The
GSPMD path in this framework (a ``jnp.take`` on a NamedSharding'ed
table) likewise delegates to XLA — which is free to all-gather the
table.  This module makes the exchange *explicit and bounded*:
unique-before-exchange + ``lax.all_to_all`` + a rows-sized all-gather,
the SURVEY §7.3 hard-part #3 recipe.

Algorithm (model axis of size M, static shapes throughout):

1. the caller provides sentinel-padded **unique** column ids ``uq [U]``
   (the sparse step already computes these — reference parity:
   Unique → MapTensorGet, ``mindspore_rec/ops/embedding.py:189-195``);
2. model shard ``m`` takes the slice ``uq[m·U/M : (m+1)·U/M]`` — each
   unique id is requested by exactly ONE shard;
3. owner shard of column ``c`` = ``c // (Vc/M)`` (contiguous blocks —
   the exact layout NamedSharding row-slicing uses, so both paths read
   the same storage);
4. the slice is bucketed by owner into a ``[M, K]`` send matrix
   (``K`` = per-peer capacity, default ``U/M`` = lossless) and exchanged
   with ONE ``lax.all_to_all`` (ids, i32);
5. every shard gathers its requested rows locally and a second
   ``all_to_all`` returns them to the requesters → ``[U/M, Dp]``;
6. one ``all_gather`` over the model axis rebuilds the full
   ``[Dp, U]`` unique-row block on every shard (rows, NOT the table).

Per-device traffic: ``M·K`` ids + ``M·K·Dp`` exchanged row elements +
``U·Dp·(M-1)/M`` all-gathered row elements — independent of the vocab
size.  Nothing ever materializes the ``[Dp, Vc]`` table on one device,
which is the property ``tests/test_all_to_all.py`` asserts on the HLO.

Autodiff: the forward and backward are SEPARATE primal ``shard_map``
calls tied by ``jax.custom_vjp`` (shard_map's transpose rules for
replicated specs scale cotangents, so we never rely on them).  The
backward re-runs the cheap id bucketing, returns the row-grad block to
the owner shards with one ``all_to_all``, scatter-adds into the local
table shard, and psums over the data axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.8 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

SENTINEL = jnp.int32(2**31 - 2)


def _bucket_by_owner(cols, n_shards: int, shard_cols: int, capacity: int):
    """Static-shape bucketing of column ids by owner shard.

    Returns (send ``[M, K]`` owner-local ids, -1 padded; owner ``[u]``;
    pos ``[u]`` position inside the owner's bucket; valid ``[u]`` bool).
    """
    owner = jnp.clip(cols // shard_cols, 0, n_shards - 1)
    local = cols - owner * shard_cols
    # position of element i inside its owner's bucket = #earlier elements
    # with the same owner (one-hot exclusive prefix sum, [u, M])
    onehot = jax.nn.one_hot(owner, n_shards, dtype=jnp.int32)
    pos = jnp.cumsum(onehot, axis=0) - onehot
    pos = jnp.sum(pos * onehot, axis=1)
    valid = jnp.logical_and(cols < SENTINEL, pos < capacity)
    send = jnp.full((n_shards, capacity), -1, jnp.int32)
    send = send.at[owner, pos].set(
        jnp.where(valid, local.astype(jnp.int32), -1), mode="drop"
    )
    return send, owner, pos, valid


def _request_ids(uq, n_shards, shard_cols, capacity, axis):
    """Shared first phase: slice my 1/M of ``uq``, bucket, exchange ids.
    Returns (req [M*K] owner-local ids we must serve, owner, pos, valid)."""
    u_slice = uq.shape[0] // n_shards
    m = lax.axis_index(axis)
    uq_my = lax.dynamic_slice_in_dim(uq, m * u_slice, u_slice)
    send, owner, pos, valid = _bucket_by_owner(
        uq_my, n_shards, shard_cols, capacity
    )
    req = lax.all_to_all(send, axis, 0, 0, tiled=True).reshape(-1)
    return req, owner, pos, valid


def _fwd_body(table_shard, uq, *, n_shards, capacity, axis):
    dp = table_shard.shape[0]
    req, owner, pos, valid = _request_ids(
        uq, n_shards, table_shard.shape[1], capacity, axis
    )
    ok = req >= 0
    safe = jnp.where(ok, req, 0)
    rows = jnp.take(table_shard, safe, axis=1)  # [Dp, M*K]
    rows = jnp.where(ok[None, :], rows, 0.0)
    # 2nd exchange: serve rows back to the requesters
    serve = rows.T.reshape(n_shards, capacity, dp)
    got = lax.all_to_all(serve, axis, 0, 0, tiled=True)
    got = got.reshape(n_shards * capacity, dp)
    flat_idx = jnp.clip(owner * capacity + pos, 0, n_shards * capacity - 1)
    mine = jnp.where(valid[:, None], got[flat_idx], 0.0)  # [U/M, Dp]
    full = lax.all_gather(mine, axis, axis=0, tiled=True)  # [U, Dp]
    return full.T  # [Dp, U]


def _bwd_body(table_shard, uq, g, *, n_shards, capacity, axis, data_axis):
    dp = table_shard.shape[0]
    u_slice = uq.shape[0] // n_shards
    req, owner, pos, valid = _request_ids(
        uq, n_shards, table_shard.shape[1], capacity, axis
    )
    m = lax.axis_index(axis)
    # reverse all-gather: my slice of the row-grad block
    g_my = lax.dynamic_slice_in_dim(g.T, m * u_slice, u_slice)  # [U/M, Dp]
    g_my = jnp.where(valid[:, None], g_my, 0.0)
    # reverse un-bucket + reverse 2nd exchange: grads return to owners
    buck = jnp.zeros((n_shards, capacity, dp), g_my.dtype)
    buck = buck.at[owner, pos].set(g_my, mode="drop")
    back = lax.all_to_all(buck, axis, 0, 0, tiled=True)
    back = back.reshape(n_shards * capacity, dp)
    ok = req >= 0
    safe = jnp.where(ok, req, 0)
    dtable = (
        jnp.zeros_like(table_shard)
        .at[:, safe]
        .add(jnp.where(ok[:, None], back, 0.0).T.astype(table_shard.dtype))
    )
    if data_axis is not None:
        dtable = lax.psum(dtable, data_axis)
    return dtable


def sharded_unique_gather(
    table,
    uq_cols,
    mesh,
    *,
    axis: str = "model",
    data_axis: str | None = "data",
    capacity: int | None = None,
):
    """All-to-all lookup of unique columns from a row-sliced feature-major
    table.

    Parameters
    ----------
    table : ``[Dp, Vc]`` feature-major storage, sharded ``P(None, axis)``
    uq_cols : ``[U]`` int32 sentinel-padded unique column ids (replicated,
        or — with ``data_axis`` set — one ``U/n_data`` vector per data
        shard laid out along the sharded axis); the per-shard length must
        divide by the model-axis size
    capacity : per-peer id budget ``K`` (default lossless ``U/M``;
        smaller trades exchange volume for dropped over-capacity ids,
        which read zeros)

    Returns ``[Dp, U]`` rows in unique order (zeros for sentinel ids),
    replicated over the model axis.
    """
    n_shards = mesh.shape[axis]
    u = uq_cols.shape[0] // (mesh.shape[data_axis] if data_axis else 1)
    if u % n_shards:
        raise ValueError(f"per-shard U={u} must divide by model shards {n_shards}")
    if capacity is None:
        capacity = u // n_shards
    ids_spec = P(data_axis) if data_axis else P()
    out_spec = P(None, data_axis) if data_axis else P(None, None)

    fwd_fn = shard_map(
        functools.partial(
            _fwd_body, n_shards=n_shards, capacity=capacity, axis=axis
        ),
        mesh=mesh,
        in_specs=(P(None, axis), ids_spec),
        out_specs=out_spec,
        check_vma=False,
    )
    bwd_fn = shard_map(
        functools.partial(
            _bwd_body, n_shards=n_shards, capacity=capacity, axis=axis,
            data_axis=data_axis,
        ),
        mesh=mesh,
        in_specs=(P(None, axis), ids_spec, out_spec),
        out_specs=P(None, axis),
        check_vma=False,
    )

    @jax.custom_vjp
    def gather(table, uq):
        return fwd_fn(table, uq)

    def gather_fwd(table, uq):
        return fwd_fn(table, uq), (table, uq)

    def gather_bwd(res, g):
        table, uq = res
        return bwd_fn(table, uq, g), None

    gather.defvjp(gather_fwd, gather_bwd)
    return gather(table, uq_cols)
