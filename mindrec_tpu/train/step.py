"""Generic CTR train/eval step builder.

Re-designs the reference's ``TrainStepWrap`` idiom
(``models/wide_deep/src/wide_and_deep.py:376-492``) as a pure jitted
function over a flat, path-keyed parameter view:

* **dual-optimizer split by param path**: params whose path contains
  "wide" go to the wide optimizer (FTRL), the rest to the deep optimizer
  (Adam/LazyAdam) — parity with the reference's name-based split
  (``wide_and_deep.py:406-412``).
* **single backward pass**: the reference runs two ``GradOperation``s
  (one per loss head).  ``loss_w`` and ``loss_d`` differ only by an L2
  term involving only deep params, so one ``jax.grad`` of ``loss_d``
  reproduces both sides' gradients exactly (the l2 term has zero
  wide-gradient).
* **row-sparse path**: sparse embedding tables never see dense
  gradients.  Per step: padded-unique ids -> gather unique rows ->
  forward from rows -> grads w.r.t. unique rows (XLA emits a
  static-shape scatter-add) -> row-wise optimizer scatter update.
  Unused dense-table gradients are dead code XLA eliminates.
* **loss scaling**: losses are multiplied by ``sens`` before grad and
  optimizers divide grads by ``sens``
  (reference sens=1024, ``wide_and_deep.py:383,450-452``).
* **data parallelism**: params replicated / batch sharded via
  ``NamedSharding``; XLA GSPMD inserts the gradient all-reduce the
  reference gets from ``DistributedGradReducer``
  (``wide_and_deep.py:455-470``).
"""

from __future__ import annotations

import warnings
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from mindrec_tpu.ops.sparse import unique_pad
from mindrec_tpu.train.optim import Optimizer


# ---------------------------------------------------------------------------
# flat path-keyed view of a param pytree
# ---------------------------------------------------------------------------


def _path_key(path) -> str:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "idx"):
            names.append(str(p.idx))
        else:
            names.append(str(p))
    return "/".join(names)


def flatten_params(params):
    """-> (ordered list of (key, leaf), treedef)."""
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    return [(_path_key(p), leaf) for p, leaf in leaves], treedef


def param_keys(params) -> list[str]:
    return [k for k, _ in flatten_params(params)[0]]


def is_wide_key(key: str) -> bool:
    return "wide" in key


# ---------------------------------------------------------------------------
# train state
# ---------------------------------------------------------------------------


class TrainState(NamedTuple):
    params: Any  # model param pytree (nested)
    opt_w: dict  # path-key -> leaf optimizer state (wide side)
    opt_d: dict  # path-key -> leaf optimizer state (deep side)
    step: jnp.ndarray
    rng: jnp.ndarray


def init_train_state(model, key, opt_w: Optimizer, opt_d: Optimizer) -> TrainState:
    pkey, rkey = jax.random.split(jax.random.PRNGKey(key) if isinstance(key, int) else key)
    params = model.init(pkey)
    flat, _ = flatten_params(params)
    opt_w_state = {k: opt_w.init_leaf(p) for k, p in flat if is_wide_key(k)}
    opt_d_state = {k: opt_d.init_leaf(p) for k, p in flat if not is_wide_key(k)}
    return TrainState(
        params=params,
        opt_w=opt_w_state,
        opt_d=opt_d_state,
        step=jnp.zeros((), jnp.int32),
        rng=rkey,
    )


# ---------------------------------------------------------------------------
# step builders
# ---------------------------------------------------------------------------


def _pick_tile(Vc: int, update: bool = False, dp: int = 16) -> int | None:
    """Streamed-kernel tile width.  With unique-first gradients the
    one-hot MXU cost scales with tile*U (small), so the update kernels
    prefer big tiles — fewer grid steps over the same DMA bytes
    (measured: adam 10.4 -> 8.5 ms at T=8192 vs 2048 on the benchmark
    shape); the gather is flat in T, 4096 marginally best.  Tiles are
    capped so the update's VMEM working set (3 state blocks in + out,
    double-buffered, + the f32 accumulator) stays under the ~16 MB
    scoped-vmem limit for wide-row tables (DeepFM dp=80)."""
    cands = (8192, 4096, 2048, 1024, 512, 256, 128) if update else (
        4096, 2048, 1024, 512, 256, 128)
    # observed scoped-vmem footprint per (row, tile-column): update ~54
    # bytes (3 state blocks in + out, double-buffered, + f32 acc);
    # gather ~8 (one table block, double-buffered)
    budget = 14_000_000
    per_col = (54 if update else 8) * dp
    for cand in cands:
        if Vc % cand == 0 and per_col * cand <= budget:
            return cand
    for cand in cands:  # fall back to divisibility only
        if Vc % cand == 0:
            return cand
    return None


def _fold_mask(dp: int, dim: int, sub: jnp.ndarray, dtype) -> jnp.ndarray:
    """[Dp, N] one-hot: element (p, n) is 1 iff sublane p belongs to the
    fold-sub-row ``sub[n]`` (logical row r owns sublanes [r*dim, (r+1)*dim))."""
    p_row = jax.lax.broadcasted_iota(jnp.int32, (dp, sub.shape[0]), 0) // dim
    return (p_row == sub[None, :]).astype(dtype)


def _fold_mask_rows(dp: int, dim: int, sub: jnp.ndarray, dtype) -> jnp.ndarray:
    """Row-major twin of :func:`_fold_mask`: [N, Dp] one-hot."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (sub.shape[0], dp), 1) // dim
    return (lane == sub[:, None]).astype(dtype)


def _expand_touch_jnp(touch, dp: int, dim: int, fold: int):
    """Generic-backend version of the kernels' touch expansion:
    [U, 8] touch columns -> [U, Dp] bool mask (note: row-major here)."""
    if fold == 1:
        return jnp.broadcast_to(touch[:, 0:1] > 0.0, (touch.shape[0], dp))
    if dim == 1:
        return touch[:, :fold] > 0.0
    raise NotImplementedError("fold > 1 requires emb_dim == 1")


@jax.custom_vjp
def _permute_rows(x, fwd_idx, bwd_idx):
    """x[fwd_idx] with a gather (not scatter) backward: the two index
    vectors are inverse permutations, so ct[bwd_idx] == scatter(ct, fwd_idx).
    XLA TPU's scatter serializes per row (~80 ms for a 624k-row batch),
    so both directions stay on the gather path.  The r3 experiment set
    (benchmarks/permute_kernel.py, conclusions in
    benchmarks/PROFILE_r03.md §3) established that XLA's gather unit is
    within ~1.5x of the crossing's sector-granular speed of light and
    that no Pallas formulation (per-row DMA, one-hot matmul, in-VMEM
    scatter, field splitting) can beat it on this hardware."""
    return x[fwd_idx]


def _permute_rows_fwd(x, fwd_idx, bwd_idx):
    return x[fwd_idx], (fwd_idx, bwd_idx)


def _permute_rows_bwd(res, ct):
    fwd_idx, bwd_idx = res
    return ct[bwd_idx], None, None


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def _packed_table_update(opt: Optimizer, g_cols, rows_sorted, sub_sorted,
                         leaf_state, table, spec, present=None,
                         matmul_dtype=None):
    """Row-sparse optimizer update on ``row_packed`` storage via the
    full-lane streaming kernels (ops/pallas/stream_update_rows.py).

    ``g_cols``: [dim, U] summed unique gradients (segsum layout);
    ``rows_sorted``/``sub_sorted``: ``uq // pack`` / ``uq % pack`` of the
    sorted padded unique ids; ``present``: optional [U] gate (tiny-vocab
    groups enumerate the whole id space — absent ids must stay
    untouched)."""
    from mindrec_tpu.ops.pallas import stream_update_rows as sur

    h = opt.hyper
    g_sel = g_cols.T  # [U, dim]
    if sub_sorted is None:  # pack == 1: every logical row owns its row
        sub_sorted = jnp.zeros_like(rows_sorted)
    kw = dict(dim=spec.emb_dim, pack=spec.pack, present=present,
              matmul_dtype=matmul_dtype or jnp.bfloat16)
    if opt.kind == "adam":
        step = leaf_state["step"] + 1
        s = step.astype(jnp.float32)
        lr_t = (
            h["learning_rate"]
            * jnp.sqrt(1.0 - jnp.power(h["b2"], s))
            / (1.0 - jnp.power(h["b1"], s))
        )
        t2, m2, v2 = sur.streamed_adam_rows(
            table, leaf_state["m"], leaf_state["v"], rows_sorted, sub_sorted,
            g_sel, lr_t, b1=h["b1"], b2=h["b2"], eps=h["eps"],
            loss_scale=h["loss_scale"], **kw,
        )
        return t2, {"m": m2, "v": v2, "step": step}
    if opt.kind == "ftrl":
        t2, a2, l2 = sur.streamed_ftrl_rows(
            table, leaf_state["accum"], leaf_state["linear"], rows_sorted,
            sub_sorted, g_sel, learning_rate=h["learning_rate"], l1=h["l1"],
            l2=h["l2"], loss_scale=h["loss_scale"], **kw,
        )
        return t2, {"accum": a2, "linear": l2}
    if opt.kind == "sgd":
        from mindrec_tpu.ops.embedding import packed_expand

        delta = packed_expand(
            spec,
            (-h["learning_rate"] / h["loss_scale"]) * g_sel.astype(jnp.float32),
            sub_sorted,
        )
        if present is not None:
            delta = delta * present.astype(delta.dtype).reshape(-1, 1)
        return (
            table.at[rows_sorted].add(delta.astype(table.dtype), mode="drop"),
            leaf_state,
        )
    raise ValueError(f"packed streamed update supports ftrl/adam/sgd "
                     f"(kind={opt.kind})")


def _packed_update_generic(opt: Optimizer, g_rows, row_ids, touch_rows,
                           leaf_state, table):
    """Generic-backend (CPU tests) masked row update on row_packed
    storage: reuse ``opt.update_cols`` through a transposed view so the
    optimizer arithmetic has exactly one implementation.

    ``g_rows [U, 128]`` lane-expanded summed grads, ``row_ids [U]``
    unique storage rows (fill duplicates carry ``touch_rows`` False),
    ``touch_rows [U, 128]`` bool per-lane touch."""
    def tmap(state):
        if not isinstance(state, dict):  # e.g. sgd's stateless ()
            return state
        return {
            k: (v.T if getattr(v, "ndim", 0) == 2 else v)
            for k, v in state.items()
        }

    t2T, s2T = opt.update_cols(
        g_rows.T, row_ids, touch_rows.T, tmap(leaf_state), table.T
    )
    return t2T.T, tmap(s2T)


def _streamed_table_update(opt: Optimizer, grads_aug, cols_sorted, leaf_state,
                           table, spec, matmul_dtype=None, mesh=None,
                           n_shards: int = 1):
    """Dispatch a column-sparse optimizer update to the scatter-free Pallas
    streaming kernels (ops/pallas/stream_update.py).

    ``grads_aug``: [Dp+8, N] touch-augmented gradients in sorted order
    (see ``stream_update.make_aug_grads``); ``cols_sorted``: [N] i32.

    ``n_shards > 1``: the table is row-sliced over ``mesh``'s model axis
    — the same kernels run per shard on the local ``[Dp, Vc/M]`` block
    (ops/sharded_stream.py), each shard updating only its owned columns.
    """
    from mindrec_tpu.ops.pallas import stream_update as su

    Vc = table.shape[1]
    if n_shards > 1 and spec.slice_mode == "table_column_slice":
        # column slice: each shard streams the FULL vocab over its
        # [Dp/M, Vc] sublane block
        tile = _pick_tile(Vc, update=True, dp=table.shape[0] // n_shards)
    else:
        tile = _pick_tile(Vc // n_shards, update=True, dp=table.shape[0])
    h = opt.hyper
    if tile is None or opt.kind not in ("adam", "ftrl", "sgd"):
        raise ValueError(
            f"streamed update unavailable (kind={opt.kind}, cols={Vc}); "
            "tables must be column-aligned to 128 and use ftrl/adam/sgd"
        )
    if n_shards > 1:
        from mindrec_tpu.ops import sharded_stream as ss

        if spec.slice_mode == "table_column_slice":
            if opt.kind == "adam":
                step = leaf_state["step"] + 1
                s = step.astype(jnp.float32)
                lr_t = (
                    h["learning_rate"]
                    * jnp.sqrt(1.0 - jnp.power(h["b2"], s))
                    / (1.0 - jnp.power(h["b1"], s))
                )
                t2, m2, v2 = ss.adam_colsliced_sharded(
                    mesh, table, leaf_state["m"], leaf_state["v"],
                    cols_sorted, grads_aug, lr_t, b1=h["b1"], b2=h["b2"],
                    eps=h["eps"], loss_scale=h["loss_scale"], tile=tile,
                    matmul_dtype=matmul_dtype,
                )
                return t2, {"m": m2, "v": v2, "step": step}
            if opt.kind == "ftrl":
                t2, a2, l2 = ss.ftrl_colsliced_sharded(
                    mesh, table, leaf_state["accum"], leaf_state["linear"],
                    cols_sorted, grads_aug,
                    learning_rate=h["learning_rate"], l1=h["l1"],
                    l2=h["l2"], loss_scale=h["loss_scale"], tile=tile,
                    matmul_dtype=matmul_dtype,
                )
                return t2, {"accum": a2, "linear": l2}
            raise ValueError(
                f"column-sliced streamed update supports ftrl/adam "
                f"(kind={opt.kind})"
            )
        if opt.kind == "adam":
            step = leaf_state["step"] + 1
            s = step.astype(jnp.float32)
            lr_t = (
                h["learning_rate"]
                * jnp.sqrt(1.0 - jnp.power(h["b2"], s))
                / (1.0 - jnp.power(h["b1"], s))
            )
            t2, m2, v2 = ss.adam_cols_sharded(
                mesh, table, leaf_state["m"], leaf_state["v"], cols_sorted,
                grads_aug, lr_t, dim=spec.emb_dim, fold=spec.fold,
                b1=h["b1"], b2=h["b2"], eps=h["eps"],
                loss_scale=h["loss_scale"], tile=tile,
                matmul_dtype=matmul_dtype,
            )
            return t2, {"m": m2, "v": v2, "step": step}
        if opt.kind == "ftrl":
            t2, a2, l2 = ss.ftrl_cols_sharded(
                mesh, table, leaf_state["accum"], leaf_state["linear"],
                cols_sorted, grads_aug, dim=spec.emb_dim, fold=spec.fold,
                learning_rate=h["learning_rate"], l1=h["l1"], l2=h["l2"],
                loss_scale=h["loss_scale"], tile=tile,
                matmul_dtype=matmul_dtype,
            )
            return t2, {"accum": a2, "linear": l2}
        raise ValueError(
            f"sharded streamed update supports ftrl/adam (kind={opt.kind})"
        )
    if opt.kind == "sgd":
        # tests-only path: scatter-add handles duplicate cols exactly and
        # the fold mask is already applied inside grads_aug
        delta = (
            -h["learning_rate"] / h["loss_scale"]
            * grads_aug[: table.shape[0]].astype(jnp.float32)
        )
        # mode="drop": sentinel-padded unique cols are out of bounds by
        # construction and must not clip onto the last real column
        return (
            table.at[:, cols_sorted].add(delta.astype(table.dtype), mode="drop"),
            leaf_state,
        )
    if opt.kind == "adam":
        step = leaf_state["step"] + 1
        s = step.astype(jnp.float32)
        lr_t = (
            h["learning_rate"]
            * jnp.sqrt(1.0 - jnp.power(h["b2"], s))
            / (1.0 - jnp.power(h["b1"], s))
        )
        t2, m2, v2 = su.streamed_adam_cols(
            table, leaf_state["m"], leaf_state["v"], cols_sorted, grads_aug,
            lr_t, dim=spec.emb_dim, fold=spec.fold,
            b1=h["b1"], b2=h["b2"], eps=h["eps"], loss_scale=h["loss_scale"],
            tile=tile, matmul_dtype=matmul_dtype,
        )
        return t2, {"m": m2, "v": v2, "step": step}
    # ftrl (lr_power fixed -0.5, the reference default)
    t2, a2, l2 = su.streamed_ftrl_cols(
        table, leaf_state["accum"], leaf_state["linear"], cols_sorted,
        grads_aug, dim=spec.emb_dim, fold=spec.fold,
        learning_rate=h["learning_rate"], l1=h["l1"], l2=h["l2"],
        loss_scale=h["loss_scale"], tile=tile, matmul_dtype=matmul_dtype,
    )
    return t2, {"accum": a2, "linear": l2}


def make_train_step(
    model,
    opt_w: Optimizer,
    opt_d: Optimizer,
    sparse: bool | None = None,
    loss_scale: float | None = None,
    donate: bool = True,
    jit: bool = True,
    use_pallas: bool | None = None,
    check_overflow: bool = False,
    matmul_dtype=None,
    row_layout: bool = True,
    unique_bucket=None,
    tiny_vocab: int = 2048,
):
    """Build ``step(state, batch) -> (state, (loss_w, loss_d))``.

    ``batch``: dict with ``ids [B,F] int32``, ``wts [B,F] f32``,
    ``label [B,1] f32`` (criteo layout).

    ``row_layout`` (pallas path): gather unique rows into ONE row-major
    ``[U, 128k]`` f32 buffer (``streamed_gather_rows``) so the two
    batch<->sorted order crossings run as 512-byte-row gathers — the
    fastest gather shape on TPU (measured: [624k,128] f32 3.75 ms vs
    [624k,88] bf16 5.6 ms) — and no transpose step exists on either
    side (the backward feeds ``streamed_segsum(row_major=True)``).

    ``unique_bucket``: static upper bound on DISTINCT ids per batch
    (row_layout only).  Defaults to the lossless B*F; smaller buckets
    shrink the unique buffer, the streamed gathers and the update
    streams — the caller guarantees the batch never exceeds it (same
    contract as the cache adapter's ``max_swap``).

    ``tiny_vocab``: id groups whose whole id space fits this bound take
    the sort-free path — segment ids are the raw ids and the backward
    runs one unsorted streamed segment-sum
    (``streamed_segsum_unsorted``), skipping the host/device sort and
    BOTH order crossings (the Outbrain indicator group, vocab 16, saves
    ~10 ms/step of row-rate-bound gathers at bs 131,072).
    """
    cfg = model.config
    if sparse is None:
        sparse = bool(
            getattr(cfg, "sparse", False) or getattr(cfg, "dynamic_embedding", False)
        )
    sens = float(
        loss_scale if loss_scale is not None else getattr(cfg, "loss_scale", 1.0)
    )
    table_specs = getattr(model, "table_specs", {}) if sparse else {}
    table_keys = {"/".join(path): (name, path, spec) for name, (path, spec) in table_specs.items()}
    # id groups: tables sharing one id space.  Criteo models have a single
    # group fed by batch["ids"]; the multitable model declares one group
    # per id space (reference multitable construct consumes 21 separate
    # id columns — wide_and_deep_multitable/src/wide_and_deep.py:271-349).
    table_groups = getattr(model, "table_groups", None) or {
        "_default": {"keys": ("ids",), "tables": tuple(table_specs)}
    }
    multi_group = len(table_groups) > 1 or "_default" not in table_groups
    if use_pallas is None:
        # the streamed kernels target TPU; the generic gather/scatter path
        # is faster to compile (and fine) on CPU test meshes
        use_pallas = jax.default_backend() not in ("cpu",)
    if multi_group and use_pallas and not row_layout:
        raise NotImplementedError(
            "the feature-major streamed path handles single-id-group "
            "models; multi-group models stream via row_layout=True "
            "(the default) or use_pallas=False"
        )
    if (
        use_pallas
        and not row_layout
        and any(spec.row_packed for _p, spec in table_specs.values())
    ):
        warnings.warn(
            "row_layout=False streams feature-major [Dp, Vc] tables, but "
            "this model stores row_packed tables (the default layout); "
            "falling back to the generic path — build specs with "
            "layout='feature_major' (config table_layout) to use the "
            "legacy streamed formulation",
            stacklevel=2,
        )
        use_pallas = False
    if matmul_dtype is None:
        matmul_dtype = jnp.bfloat16

    # --- mesh composition of the streamed path --------------------------
    # On a multi-device mesh the streamed kernels must never see a
    # GSPMD-sharded operand: model-sharded (row-sliced) tables stream
    # per-shard under shard_map (ops/sharded_stream.py), the backward
    # segment-sum runs per DATA shard + psum, and everything else the
    # kernels consume is pinned replicated.  Row-slice is the supported
    # sharded regime (the reference flagship, wide_and_deep.py:232-249);
    # column-slice falls back to the generic path with a loud warning.
    mesh = getattr(model, "mesh", None)
    mesh_n = int(mesh.devices.size) if mesh is not None else 1
    axis_names = tuple(getattr(mesh, "axis_names", ())) if mesh is not None else ()
    model_shards = int(mesh.shape["model"]) if "model" in axis_names else 1
    data_shards = int(mesh.shape["data"]) if "data" in axis_names else 1
    sharded_tables = (
        {
            name
            for name, (_path, spec) in table_specs.items()
            if spec.slice_mode != "none"
        }
        if model_shards > 1
        else set()
    )
    if use_pallas and sharded_tables:

        def _stream_shardable(spec):
            if spec.slice_mode == "table_row_slice":
                return True
            if spec.slice_mode == "table_column_slice":
                # column slice shards the sublane (feature) axis: every
                # shard streams ALL ids over its [Dp/M, Vc] block — no
                # ownership clip, no vocab partitioning (the r4 verdict's
                # "plausibly simpler than the row case" composition)
                return (
                    spec.fold == 1
                    and spec.storage_shape[0] % model_shards == 0
                )
            return False

        unsupported = sorted(
            name
            for name in sharded_tables
            if not _stream_shardable(table_specs[name][1])
        )
        if unsupported or not row_layout:
            warnings.warn(
                "the streamed pallas path composes with a model mesh only "
                "for table_row_slice / fold-1 table_column_slice tables "
                f"under row_layout=True (unsupported: "
                f"{unsupported or 'row_layout=False'}); falling back to "
                "the generic sharded path (correct, bounded collectives, "
                "but slower)",
                stacklevel=2,
            )
            use_pallas = False
            sharded_tables = set()
    if use_pallas and mesh_n > 1 and not row_layout:
        warnings.warn(
            "the feature-major streamed path (row_layout=False) is "
            "single-device; falling back to the generic path on this "
            f"{mesh_n}-device mesh",
            stacklevel=2,
        )
        use_pallas = False
    if use_pallas and mesh_n > 1 and "data" not in axis_names:
        # the sharded backward runs per data shard; a mesh without the
        # standard (data, model) axes (parallel/mesh.make_mesh) is not
        # composed with the streamed kernels
        warnings.warn(
            f"mesh axes {axis_names} lack 'data'; falling back to the "
            "generic sharded path (build meshes with "
            "parallel.mesh.make_mesh for the streamed composition)",
            stacklevel=2,
        )
        use_pallas = False
        sharded_tables = set()
    use_mesh_stream = use_pallas and mesh_n > 1 and row_layout

    def _rep(x):
        """Pin an array replicated so plain (unpartitioned) pallas calls
        never receive a GSPMD-sharded operand on a multi-device mesh."""
        if not use_mesh_stream:
            return x
        from jax.sharding import NamedSharding, PartitionSpec

        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PartitionSpec())
        )

    def apply_updates(params, grads, opt_w_state, opt_d_state, skip_keys=()):
        flat_p, treedef = flatten_params(params)
        flat_g = treedef.flatten_up_to(grads)
        new_leaves = []
        new_w = dict(opt_w_state)
        new_d = dict(opt_d_state)
        for (key, p), g in zip(flat_p, flat_g):
            if key in skip_keys:
                new_leaves.append(p)  # handled by the row-sparse path
                continue
            if is_wide_key(key):
                p2, s2 = opt_w.update_leaf(g, new_w[key], p)
                new_w[key] = s2
            else:
                p2, s2 = opt_d.update_leaf(g, new_d[key], p)
                new_d[key] = s2
            new_leaves.append(p2)
        return treedef.unflatten(new_leaves), new_w, new_d

    def _set_table(params, path, new_table):
        def setter(node, rest):
            if not rest:
                return new_table
            head = rest[0]
            if isinstance(node, dict):
                out = dict(node)
                out[head] = setter(node[head], rest[1:])
                return out
            raise TypeError(f"cannot descend into {type(node)}")

        return setter(params, list(path))

    def dense_step(state: TrainState, batch):
        rng, sub = jax.random.split(state.rng)

        def loss_fn(params):
            logits = model.apply_batch(params, batch, train=True, rng=sub)
            loss_w, loss_d = model.loss(params, logits, batch["label"])
            return loss_d * sens, (loss_w, loss_d)

        grads, (loss_w, loss_d) = jax.grad(loss_fn, has_aux=True)(state.params)
        params, opt_w_state, opt_d_state = apply_updates(
            state.params, grads, state.opt_w, state.opt_d
        )
        new_state = TrainState(params, opt_w_state, opt_d_state, state.step + 1, rng)
        if check_overflow:
            new_state = _guard(_grads_finite(grads), new_state, state)
        return new_state, (loss_w, loss_d)

    def get_table(p, path):
        node = p
        for h in path:
            node = node[h]
        return node

    def _grads_finite(*trees):
        """Scalar bool: every gradient element is finite (loss-scale
        overflow check, reference ``rec_model.py:234-240`` semantics)."""
        leaves = [l for t in trees for l in jax.tree.leaves(t)]
        oks = [jnp.all(jnp.isfinite(l)) for l in leaves]
        out = oks[0]
        for o in oks[1:]:
            out = jnp.logical_and(out, o)
        return out

    def _guard(finite, new_state: TrainState, old_state: TrainState):
        """On overflow: keep params/opt state, still advance step+rng."""
        picked = jax.lax.cond(
            finite,
            lambda: (new_state.params, new_state.opt_w, new_state.opt_d),
            lambda: (old_state.params, old_state.opt_w, old_state.opt_d),
        )
        return TrainState(*picked, new_state.step, new_state.rng)

    def sparse_step(state: TrainState, batch):
        """Column-sparse step on feature-major [Dp, Vc] tables, two
        backends sharing one forward:

        Forward gathers each position's storage column and differentiates
        w.r.t. the gathered columns — the backward pass into the tables is
        pure elementwise (no scatter into the vocab dimension, ever).

        * pallas backend (TPU): sort (id, pos) pairs once (or take the
          host-precomputed ``sorted_ids``/``perm``/``inv`` from the
          batch), stream-gather in sorted order, un-permute with a
          custom-vjp gather, and run the scatter-free streamed optimizer
          kernels, which sum duplicate ids on the fly.
        * generic backend (CPU tests): native axis-1 gather + padded
          unique + segment-sum of the touch-augmented grads + column-wise
          gather/scatter optimizer update.

        One sort serves every table: ``col = id // fold`` is monotone.
        """
        from mindrec_tpu.ops.pallas.stream_update import make_aug_grads

        rng, sub_rng = jax.random.split(state.rng)
        params = state.params
        # per-group id tensors: [B, F_g] (concat of the group's batch keys)
        ids_by_group = {}
        for g, info in table_groups.items():
            parts = [batch[k] for k in info["keys"]]
            B = int(parts[0].shape[0])
            ids_by_group[g] = (
                parts[0] if len(parts) == 1
                else jnp.concatenate([p.reshape(B, -1) for p in parts], axis=1)
            )
        group_of = {
            t: g for g, info in table_groups.items() for t in info["tables"]
        }
        ids = ids_by_group.get("_default", next(iter(ids_by_group.values())))
        B, F = int(ids.shape[0]), int(ids.shape[1])
        n_pos = B * F
        flat_ids = ids.reshape(-1)

        def call_rows(params, rows):
            if hasattr(model, "apply_rows_batch"):
                return model.apply_rows_batch(
                    params, rows, batch, train=True, rng=sub_rng
                )
            return model.apply_rows(
                params, rows, batch["wts"], train=True, rng=sub_rng
            )

        def _finish_sparse(params, grads, col_grads, uq_cols, sub_uq, state,
                           loss_w, loss_d, rng, gcheck, touch_mask=None):
            """Shared pallas-path tail: dense updates + per-table streamed
            column-sparse optimizer updates + overflow guard.

            ``touch_mask``: optional {table: [1, ub] 0/1} — zeroes the
            touch-indicator rows of uniques NOT present in the batch
            (the tiny-vocab path enumerates the whole id space as its
            unique set, and lazy-optimizer semantics require absent
            rows to stay untouched)."""
            params2, opt_w_state, opt_d_state = apply_updates(
                params, grads, state.opt_w, state.opt_d,
                skip_keys=set(table_keys),
            )
            for key, (name, path, spec) in table_keys.items():
                table = get_table(params, path)
                opt = opt_w if is_wide_key(key) else opt_d
                opt_state = opt_w_state if is_wide_key(key) else opt_d_state
                if spec.row_packed and name not in sharded_tables:
                    present = None
                    if touch_mask is not None and name in touch_mask:
                        present = touch_mask[name].reshape(-1)
                    new_table, new_sub = _packed_table_update(
                        opt, col_grads[name], uq_cols[name], sub_uq[name],
                        opt_state[key], table, spec, present=present,
                        matmul_dtype=matmul_dtype,
                    )
                    if is_wide_key(key):
                        opt_w_state = {**opt_w_state, key: new_sub}
                    else:
                        opt_d_state = {**opt_d_state, key: new_sub}
                    params2 = _set_table(params2, path, new_table)
                    continue
                g_aug = make_aug_grads(col_grads[name], sub_uq[name])
                if touch_mask is not None and name in touch_mask:
                    g_aug = jnp.concatenate(
                        [g_aug[:-8], g_aug[-8:] * touch_mask[name]]
                    )
                shard_this = name in sharded_tables
                new_table, new_sub = _streamed_table_update(
                    opt, g_aug, uq_cols[name], opt_state[key], table, spec,
                    matmul_dtype=matmul_dtype,
                    mesh=mesh if shard_this else None,
                    n_shards=model_shards if shard_this else 1,
                )
                if is_wide_key(key):
                    opt_w_state = {**opt_w_state, key: new_sub}
                else:
                    opt_d_state = {**opt_d_state, key: new_sub}
                params2 = _set_table(params2, path, new_table)
            new_state = TrainState(
                params2, opt_w_state, opt_d_state, state.step + 1, rng
            )
            if check_overflow:
                new_state = _guard(
                    _grads_finite(grads, gcheck), new_state, state
                )
            return new_state, (loss_w, loss_d)

        def _sort_meta(g, ids_g):
            """Per-id-group sort/unique metadata: host-precomputed
            (``{g}:``-prefixed batch keys for named groups, bare keys
            for the default group) or device-derived.  The input
            pipeline overlaps the host path with the previous step.
            sorted_ids/inv are optional: with the full unique metadata
            present they are never read, and the minimal-prep pipeline
            skips computing (and uploading) them entirely."""
            flat_g = ids_g.reshape(-1)
            ng = int(flat_g.shape[0])
            pref = "" if g == "_default" else f"{g}:"
            if pref + "perm" in batch:
                perm_g = batch[pref + "perm"].reshape(-1)
                sorted_g = (
                    batch[pref + "sorted_ids"].reshape(-1)
                    if pref + "sorted_ids" in batch else None
                )
                inv_g = (
                    batch[pref + "inv"].reshape(-1)
                    if pref + "inv" in batch else None
                )
            else:
                iota = jnp.arange(ng, dtype=jnp.int32)
                sorted_g, perm_g = jax.lax.sort_key_val(flat_g, iota)
                _, inv_g = jax.lax.sort_key_val(perm_g, iota)
            if pref + "uq_ids" in batch:
                uq_g = batch[pref + "uq_ids"].reshape(-1)
                uidx_b = batch[pref + "uidx"].reshape(-1)
                if pref + "uidx_sorted" in batch:
                    uidx_s = batch[pref + "uidx_sorted"].reshape(-1)
                else:
                    if sorted_g is None:
                        raise ValueError(
                            "batch has uq_ids but neither uidx_sorted "
                            "nor sorted_ids to derive it from"
                        )
                    newv = jnp.concatenate(
                        [jnp.ones((1,), bool), sorted_g[1:] != sorted_g[:-1]]
                    )
                    uidx_s = jnp.cumsum(newv.astype(jnp.int32)) - 1
                uq_len = int(uq_g.shape[0])
            else:
                # unique-first (the reference's own sparse forward:
                # Unique -> MapTensorGet, embedding.py:189-195): gather
                # kernels then stream only the U distinct ids.  Padded
                # to static [N] with a sentinel past every vocab.
                if sorted_g is None or inv_g is None:
                    raise ValueError(
                        "batch prep must supply uq_ids/uidx/uidx_sorted "
                        "when it omits sorted_ids/inv"
                    )
                newv = jnp.concatenate(
                    [jnp.ones((1,), bool), sorted_g[1:] != sorted_g[:-1]]
                )
                uidx_s = jnp.cumsum(newv.astype(jnp.int32)) - 1
                uq_g = jnp.sort(
                    jnp.where(newv, sorted_g, jnp.int32(2**31 - 2))
                )
                uidx_b = uidx_s[inv_g]
                uq_len = ng
            return flat_g, perm_g, inv_g, sorted_g, uq_g, uidx_b, uidx_s, uq_len

        def _bucket_of(g, uq_len):
            """Static unique bucket for one group, rounded so the
            segsum/update tiles divide it.  Priority: explicit
            unique_bucket (int for a sole group, or {group: int}) >
            the host-provided uq_ids length (the input pipeline trims
            uq to its bucket, so a bucket regrow is just a shape
            change — jit re-traces automatically) > lossless."""
            if isinstance(unique_bucket, dict):
                ubv = unique_bucket.get(g)
            elif len(table_groups) == 1:
                ubv = unique_bucket
            else:
                ubv = None
            ub = ubv if ubv is not None else uq_len
            return (int(ub) + 2047) // 2048 * 2048

        if use_pallas and row_layout:
            # row-major streamed path, generic over id groups: each
            # group gets its own sorted stream / unique row buffer /
            # order crossings / segment-sum; each table updates from
            # its group's stream (the multitable model trains fully
            # streamed — reference flagship config at
            # wide_and_deep_multitable/src/wide_and_deep.py:271-349).
            from mindrec_tpu.ops.pallas.stream_gather import (
                streamed_gather_rows,
            )
            from mindrec_tpu.ops.pallas.stream_segsum import streamed_segsum

            # per-table lane width in the [ub, width] unique row buffer:
            # row_packed tables contribute their logical emb_dim (the
            # fold-sub lane extract happens in unique space, right after
            # the packed gather); feature-major tables contribute their
            # full storage sublane block (positions fold-mask it)
            dpf_of = {
                name: (
                    spec.emb_dim
                    if spec.row_packed
                    else get_table(params, path).shape[0]
                )
                for name, (path, spec) in table_specs.items()
            }
            gdata = {}
            for g, info in table_groups.items():
                ids_g = ids_by_group[g]
                Bg, Fg = int(ids_g.shape[0]), int(ids_g.shape[1])
                group_sharded = any(
                    name in sharded_tables for name in info["tables"]
                )
                # tiny id space: the whole vocabulary is the "unique"
                # set — no sort, no order crossings; the backward is
                # one unsorted streamed segment-sum over raw ids
                id_bound = max(
                    table_specs[name][1].vocab_size + 9
                    for name in info["tables"]
                )
                id_bound = (id_bound + 2047) // 2048 * 2048
                # streamed_segsum_unsorted holds the whole [D, ub]
                # accumulator in one VMEM block: 2048 is its hard cap
                tiny = id_bound <= min(tiny_vocab, 2048) and not group_sharded
                if tiny:
                    flat_g = ids_g.reshape(-1)
                    perm_g = uidx_s = None
                    ub = id_bound
                    uq_b = jnp.arange(ub, dtype=jnp.int32)
                    uidx_b = flat_g
                else:
                    (flat_g, perm_g, _inv_g, _sorted_g, uq_g, uidx_b,
                     uidx_s, uq_len) = _sort_meta(g, ids_g)
                    ub = _bucket_of(g, uq_len)
                    if ub <= uq_len:
                        uq_b = uq_g[:ub]
                    else:
                        uq_b = jnp.concatenate([
                            uq_g,
                            jnp.full((ub - uq_len,), jnp.int32(2**31 - 2)),
                        ])
                if not tiny:
                    # multi-device mesh: the unique vector feeds plain
                    # (unpartitioned) pallas gathers and the shard_map
                    # bodies — pin it replicated so GSPMD never hands
                    # the kernels a data-sharded operand
                    uq_b = _rep(uq_b)
                # lane layout: the group's tables side by side in ONE
                # row-major [ub, width] f32 buffer, so both order
                # crossings run as 512-byte-row gathers.  row_packed
                # tables come FIRST: their unique rows arrive as one
                # native XLA 512-byte-row gather + lane extract
                # (benchmarks/sweep_gather_r5.py: 2.2 ms vs 4.7 ms for
                # streaming the full deep table at the bench shape) and
                # concatenate directly into the buffer's leading lanes;
                # feature-major tables stream into the remaining lanes.
                t_order = sorted(
                    info["tables"],
                    key=lambda n: not table_specs[n][1].row_packed,
                )
                offs, off = {}, 0
                for name in t_order:
                    offs[name] = off
                    off += dpf_of[name]
                width = max(128, -(-off // 128) * 128)
                parts = []  # leading packed lanes
                st_list = []  # deferred feature-major streamed gathers
                uq_cols_g, sub_uq_g = {}, {}
                sh_tables, sh_uqcols, sh_offs, sh_tiles = [], [], [], []
                shc_tables, shc_uqcols, shc_offs = [], [], []
                shc_dpls, shc_tiles = [], []
                for name in t_order:
                    path, spec = table_specs[name]
                    table = get_table(params, path)
                    if spec.row_packed and name not in sharded_tables:
                        from mindrec_tpu.ops.embedding import packed_gather

                        p = spec.pack
                        uq_cols_g[name] = uq_b // p if p > 1 else uq_b
                        sub_uq_g[name] = uq_b % p if p > 1 else None
                        parts.append(
                            packed_gather(spec, table, uq_b).astype(
                                jnp.float32
                            )
                        )
                        continue
                    r = spec.fold
                    uq_cols_g[name] = uq_b // r if r > 1 else uq_b
                    sub_uq_g[name] = uq_b % r if r > 1 else None
                    if name in sharded_tables:
                        if spec.slice_mode == "table_column_slice":
                            # column-sliced: every shard streams ALL
                            # uniques over its sublane block; lanes
                            # merge via one model psum
                            dpl = table.shape[0] // model_shards
                            tl = _pick_tile(table.shape[1], dp=dpl)
                            if tl is None:
                                raise ValueError(
                                    f"table {name}: no streaming tile "
                                    f"divides {table.shape[1]}"
                                )
                            shc_tables.append(table)
                            shc_uqcols.append(uq_cols_g[name])
                            shc_offs.append(offs[name])
                            shc_dpls.append(dpl)
                            shc_tiles.append(tl)
                            continue
                        # row-sliced table: per-shard streamed gather
                        # under shard_map + ONE model-axis psum
                        tl = _pick_tile(
                            table.shape[1] // model_shards, dp=table.shape[0]
                        )
                        if tl is None:
                            raise ValueError(
                                f"table {name}: no streaming tile divides "
                                f"the per-shard column count "
                                f"{table.shape[1]}//{model_shards}; raise "
                                "the spec's row_alignment or the mesh"
                            )
                        sh_tables.append(table)
                        sh_uqcols.append(uq_cols_g[name])
                        sh_offs.append(offs[name])
                        sh_tiles.append(tl)
                        continue
                    tl = _pick_tile(table.shape[1], dp=table.shape[0])
                    st_list.append((name, table, tl))
                pk_lanes = sum(p.shape[1] for p in parts)
                if parts and pk_lanes < width:
                    parts.append(jnp.zeros((ub, width - pk_lanes), jnp.float32))
                buf = (
                    jnp.concatenate(parts, axis=1)
                    if parts
                    else jnp.zeros((ub, width), jnp.float32)
                )
                for name, table, tl in st_list:
                    buf = streamed_gather_rows(
                        table, uq_cols_g[name], buf, lane_offset=offs[name],
                        tile=tl, matmul_dtype=matmul_dtype,
                    )
                if sh_tables:
                    from mindrec_tpu.ops import sharded_stream as ss

                    # lanes are disjoint per table, so the psum'd sharded
                    # buffer adds cleanly onto the plain-table buffer
                    buf = buf + ss.gather_rows_sharded(
                        mesh, sh_tables, sh_uqcols, sh_offs, sh_tiles,
                        ub, width, matmul_dtype=matmul_dtype,
                    )
                if shc_tables:
                    from mindrec_tpu.ops import sharded_stream as ss

                    buf = buf + ss.gather_cols_sharded(
                        mesh, shc_tables, shc_uqcols, shc_offs, shc_dpls,
                        shc_tiles, ub, width, matmul_dtype=matmul_dtype,
                    )
                gdata[g] = dict(
                    buf=buf, flat=flat_g, perm=perm_g, uidx_batch=uidx_b,
                    uidx_sorted=uidx_s, ub=ub, width=width, offs=offs,
                    uq_cols=uq_cols_g, sub_uq=sub_uq_g, uq=uq_b,
                    ng=Bg * Fg, Bg=Bg, Fg=Fg, tiny=tiny,
                )

            # per group: ONE 512-byte-row f32 gather expands unique rows
            # to batch order OUTSIDE the loss closure; differentiating
            # w.r.t. the expanded rows directly yields batch-order
            # per-position grads with no pass-through zeros-delta add
            # (the r2-r4 formulation materialized buf[uidx] + zeros)
            rows_pos_in = {
                g: gd["buf"][gd["uidx_batch"]].astype(matmul_dtype)
                for g, gd in gdata.items()
            }

            def reorder_all_rows(rows_pos_all):
                rows = {}
                for g, info in table_groups.items():
                    gd = gdata[g]
                    rows_pos = rows_pos_all[g]  # [N_g, width]
                    for name in info["tables"]:
                        spec = table_specs[name][1]
                        o = gd["offs"][name]
                        r = rows_pos[:, o : o + dpf_of[name]]
                        if spec.fold > 1:
                            sub_pos = gd["flat"] % spec.fold
                            r = r * _fold_mask_rows(
                                dpf_of[name], spec.emb_dim, sub_pos, r.dtype
                            )
                        else:
                            r = r[:, : spec.emb_dim]  # drop sublane padding
                        rows[name] = r.reshape(gd["Bg"], gd["Fg"], -1)
                return rows

            def loss_fn(params, rows_pos_all):
                rows = reorder_all_rows(rows_pos_all)
                logits = call_rows(params, rows)
                loss_w, loss_d = model.loss(params, logits, batch["label"])
                return loss_d * sens, (loss_w, loss_d)

            (grads, g_deltas), (loss_w, loss_d) = jax.grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, rows_pos_in)
            # per group: batch-order grads -> sorted order (the mirror
            # 512B-row gather), then the row-major streamed segment-sum
            # folds duplicates; no transpose on either side
            col_grads, uq_cols, sub_uq = {}, {}, {}
            touch_mask = {}
            for g, info in table_groups.items():
                gd = gdata[g]
                if gd["tiny"]:
                    # no crossing: reduce batch-order grads by raw id
                    from mindrec_tpu.ops.pallas.stream_segsum import (
                        streamed_segsum_unsorted,
                    )

                    if use_mesh_stream:
                        from mindrec_tpu.ops import sharded_stream as ss

                        g_uq_all = ss.unsorted_segsum_sharded(
                            mesh, g_deltas[g], gd["flat"], gd["ub"],
                            matmul_dtype=matmul_dtype,
                        )  # [width, ub] f32, replicated
                        counts = ss.unsorted_segsum_sharded(
                            mesh, jnp.ones((gd["ng"], 8), matmul_dtype),
                            gd["flat"], gd["ub"], matmul_dtype=matmul_dtype,
                        )
                    else:
                        g_uq_all = streamed_segsum_unsorted(
                            g_deltas[g], gd["flat"], gd["ub"],
                            matmul_dtype=matmul_dtype,
                        )  # [width, ub] f32
                        # presence per id: lazy optimizers must skip ids
                        # absent from the batch even with zero gradients
                        counts = streamed_segsum_unsorted(
                            jnp.ones((gd["ng"], 8), matmul_dtype),
                            gd["flat"], gd["ub"], matmul_dtype=matmul_dtype,
                        )
                    present = (counts[0:1] > 0).astype(jnp.float32)
                    for name in info["tables"]:
                        touch_mask[name] = present
                elif use_mesh_stream:
                    # per-data-shard segment-sum directly in GLOBAL
                    # unique order (inject-uq local sort) + data psum —
                    # no global crossing, no sharded pallas operand
                    from mindrec_tpu.ops import sharded_stream as ss

                    g_uq_all = ss.partial_segsum_sharded(
                        mesh, g_deltas[g], gd["flat"], gd["uq"], gd["ub"],
                        matmul_dtype=matmul_dtype,
                    )  # [width, ub] f32, replicated
                else:
                    g_sorted = g_deltas[g][gd["perm"]]  # [N_g, width]
                    g_uq_all = streamed_segsum(
                        g_sorted, gd["uidx_sorted"], row_major=True,
                        n_out=gd["ub"], matmul_dtype=matmul_dtype,
                    )  # [width, ub] f32
                for name in info["tables"]:
                    spec = table_specs[name][1]
                    o = gd["offs"][name]
                    gcol = g_uq_all[o : o + dpf_of[name]]
                    if spec.fold > 1:
                        # defensive re-mask (grads are already masked by
                        # the forward's position fold mask)
                        gcol = gcol * _fold_mask(
                            dpf_of[name], spec.emb_dim, gd["sub_uq"][name],
                            gcol.dtype,
                        )
                    col_grads[name] = gcol
                uq_cols.update(gd["uq_cols"])
                sub_uq.update(gd["sub_uq"])
            return _finish_sparse(
                params, grads, col_grads, uq_cols, sub_uq, state,
                loss_w, loss_d, rng, g_deltas,
                touch_mask=touch_mask or None,
            )

        if use_pallas:
            # feature-major streamed path (row_layout=False):
            # single-id-group only
            from mindrec_tpu.ops.pallas.stream_gather import streamed_gather

            (flat_ids, perm, inv, sorted_ids, uq_ids, uidx_batch,
             uidx_sorted, _uq_len) = _sort_meta(
                "_default" if "_default" in table_groups
                else next(iter(table_groups)),
                ids,
            )

            rows_in = {}
            sub_uq = {}
            uq_cols = {}
            for name, (path, spec) in table_specs.items():
                table = get_table(params, path)
                r = spec.fold
                uq_cols[name] = uq_ids // r if r > 1 else uq_ids
                sub_uq[name] = uq_ids % r if r > 1 else None
                tl = _pick_tile(table.shape[1], dp=table.shape[0])
                rows_in[name] = streamed_gather(
                    table, uq_cols[name], tile=tl, matmul_dtype=matmul_dtype,
                )

            def reorder_all(rows_in, pos_delta):
                # mask folded sub-rows in unique space, concat all
                # tables, then expand unique rows to per-position rows
                # with ONE [N, sum(D)] gather (XLA gather cost is
                # per-row, so one fused gather beats one per table).
                # ``pos_delta`` (zeros) is the differentiation point:
                # the expansion itself is stop_gradient'ed, so the
                # backward yields batch-order per-position grads
                # directly — no scatter-add over duplicate ids; the
                # streamed update kernels sum duplicates themselves.
                parts, dims, names = [], [], []
                for name, r in rows_in.items():
                    spec = table_specs[name][1]
                    if spec.fold > 1:
                        r = r * _fold_mask(
                            r.shape[0], spec.emb_dim, sub_uq[name], r.dtype
                        )
                    else:
                        r = r[: spec.emb_dim]  # drop sublane padding
                    parts.append(r)
                    dims.append(r.shape[0])
                    names.append(name)
                big = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
                # transport the expansion at the path's matmul
                # precision: the MLP consumes rows in mixed precision
                # anyway and grads carry the loss scale (bf16 gather is
                # ~17% faster than f32 at bs 16000)
                big = big.astype(matmul_dtype)
                bigT = jax.lax.stop_gradient(big.T)[uidx_batch] + pos_delta
                rows, off = {}, 0
                for name, dn in zip(names, dims):
                    rows[name] = bigT[:, off : off + dn].reshape(B, F, dn)
                    off += dn
                return rows

            part_dims = []
            for name, (path, spec) in table_specs.items():
                part_dims.append(
                    (name, spec, get_table(params, path).shape[0] if spec.fold > 1 else spec.emb_dim)
                )
            sum_d = sum(d for _, _, d in part_dims)

        else:
            rows_in = {}
            sub_flat = {}
            cols_flat = {}
            for name, (path, spec) in table_specs.items():
                table = get_table(params, path)
                gflat = ids_by_group[group_of[name]].reshape(-1)
                if spec.row_packed:
                    from mindrec_tpu.ops.embedding import packed_gather

                    # keep the LOGICAL ids; the packed update tail
                    # re-derives (row, sub) after the unique pass
                    cols_flat[name] = gflat
                    sub_flat[name] = None
                    rows_in[name] = packed_gather(spec, table, gflat).T
                    continue
                r = spec.fold
                cols = gflat // r if r > 1 else gflat
                cols_flat[name] = cols
                sub_flat[name] = gflat % r if r > 1 else None
                rows_in[name] = jnp.take(table, cols, axis=1)  # (Dp, N_g)

            def reorder_all(rows_in):
                rows = {}
                for name, r in rows_in.items():
                    spec = table_specs[name][1]
                    if spec.fold > 1:
                        r = r * _fold_mask(
                            r.shape[0], spec.emb_dim, sub_flat[name], r.dtype
                        )
                    else:
                        r = r[: spec.emb_dim]  # drop sublane padding
                    f_g = ids_by_group[group_of[name]].shape[1]
                    rows[name] = r.T.reshape(B, f_g, r.shape[0])
                return rows

        if use_pallas:

            def loss_fn(params, pos_delta):
                rows = reorder_all(rows_in, pos_delta)
                logits = call_rows(params, rows)
                loss_w, loss_d = model.loss(params, logits, batch["label"])
                return loss_d * sens, (loss_w, loss_d)

            pos_delta = jnp.zeros((n_pos, sum_d), matmul_dtype)
            (grads, g_delta), (loss_w, loss_d) = jax.grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, pos_delta)
            # batch-order per-position grads -> sorted order (one fused
            # gather, the mirror of the forward expansion), then ONE
            # streamed segment-sum folds duplicate ids together so the
            # optimizer kernels stream only the U unique columns
            from mindrec_tpu.ops.pallas.stream_segsum import streamed_segsum

            g_sorted = g_delta[perm]  # [N, sum(D)]
            g_uq = streamed_segsum(
                g_sorted.T, uidx_sorted, matmul_dtype=matmul_dtype
            )[:, :n_pos]  # [sum(D), N] (valid first U cols; tail cols
            # map to sentinel ids no table tile ever owns)
            col_grads = {}
            off = 0
            for name, spec, dn in part_dims:
                g = g_uq[off : off + dn]  # [dn, N]
                off += dn
                if spec.fold > 1:
                    # pos_delta is unmasked; zero the non-owning
                    # sub-row lanes the fold mask would have zeroed
                    g = g * _fold_mask(dn, spec.emb_dim, sub_uq[name], g.dtype)
                dp_full = get_table(params, table_specs[name][0]).shape[0]
                if dn < dp_full:  # restore sublane padding rows
                    g = jnp.concatenate(
                        [g, jnp.zeros((dp_full - dn, n_pos), g.dtype)]
                    )
                col_grads[name] = g
            return _finish_sparse(
                params, grads, col_grads, uq_cols, sub_uq, state,
                loss_w, loss_d, rng, g_delta,
            )
        else:

            def loss_fn(params, rows_in):
                rows = reorder_all(rows_in)
                logits = call_rows(params, rows)
                loss_w, loss_d = model.loss(params, logits, batch["label"])
                return loss_d * sens, (loss_w, loss_d)

            (grads, col_grads), (loss_w, loss_d) = jax.grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, rows_in)

        # dense params (table grads are all-zero & skipped -> DCE'd by XLA)
        params2, opt_w_state, opt_d_state = apply_updates(
            params, grads, state.opt_w, state.opt_d, skip_keys=set(table_keys)
        )

        for key, (name, path, spec) in table_keys.items():
            table = get_table(params, path)
            opt = opt_w if is_wide_key(key) else opt_d
            opt_state = opt_w_state if is_wide_key(key) else opt_d_state
            g = col_grads[name]  # (Dp, N_g) per-position grads
            if spec.row_packed:
                from mindrec_tpu.ops.embedding import packed_expand

                gflat = cols_flat[name]  # LOGICAL ids
                n_g = int(gflat.shape[0])
                # 1) sum per logical id (fill target: the last padded
                # logical row, guaranteed free of trainable ids)
                uqL = unique_pad(
                    gflat, size=n_g, fill_value=spec.padded_vocab - 1
                )
                invL = uqL.inverse.reshape(-1)
                summed = jax.ops.segment_sum(g.T, invL, num_segments=n_g)
                counts = jax.ops.segment_sum(
                    jnp.ones((n_g, 1), g.dtype), invL, num_segments=n_g
                )
                p = spec.pack
                subL = uqL.ids % p if p > 1 else jnp.zeros_like(uqL.ids)
                physL = uqL.ids // p if p > 1 else uqL.ids
                touched = (counts > 0).astype(g.dtype)  # [U, 1]
                g128 = packed_expand(spec, summed, subL)
                t128 = packed_expand(
                    spec, jnp.broadcast_to(touched, summed.shape), subL
                )
                # 2) fold logical siblings into unique storage rows
                uqR = unique_pad(
                    physL, size=n_g, fill_value=table.shape[0] - 1
                )
                invR = uqR.inverse.reshape(-1)
                g_rows = jax.ops.segment_sum(g128, invR, num_segments=n_g)
                t_rows = (
                    jax.ops.segment_sum(t128, invR, num_segments=n_g) > 0
                )
                new_table, new_sub = _packed_update_generic(
                    opt, g_rows, uqR.ids, t_rows, opt_state[key], table
                )
                if is_wide_key(key):
                    opt_w_state = {**opt_w_state, key: new_sub}
                else:
                    opt_d_state = {**opt_d_state, key: new_sub}
                params2 = _set_table(params2, path, new_table)
                continue
            g_aug = make_aug_grads(g, sub_flat[name])
            # fill target = last storage column: guaranteed free of
            # trainable ids (spec reserves >= 7 spare rows past the
            # dummy), so the where(touch, new, old) scatter-set of
            # fill duplicates can never clobber a real update
            n_g = int(cols_flat[name].shape[0])
            uq = unique_pad(
                cols_flat[name], size=n_g,
                fill_value=table.shape[1] - 1,
            )
            summed = jax.ops.segment_sum(
                g_aug.T, uq.inverse.reshape(-1), num_segments=n_g
            )  # [U, Dp+8]
            dp = table.shape[0]
            touch = _expand_touch_jnp(
                summed[:, dp:], dp, spec.emb_dim, spec.fold
            )  # [U, Dp] bool
            new_table, new_sub = opt.update_cols(
                summed[:, :dp].T, uq.ids, touch.T, opt_state[key], table
            )
            if is_wide_key(key):
                opt_w_state = {**opt_w_state, key: new_sub}
            else:
                opt_d_state = {**opt_d_state, key: new_sub}
            params2 = _set_table(params2, path, new_table)

        new_state = TrainState(params2, opt_w_state, opt_d_state, state.step + 1, rng)
        if check_overflow:
            new_state = _guard(_grads_finite(grads, col_grads), new_state, state)
        return new_state, (loss_w, loss_d)

    step = sparse_step if sparse else dense_step
    if jit:
        step = jax.jit(step, donate_argnums=(0,) if donate else ())
    return step


def prep_groups(model, tiny_vocab: int = 2048) -> dict | None:
    """The id groups host prep should SORT for a model: its
    ``table_groups`` minus tiny-vocab groups, whose sort metadata the
    step's sort-free path (``make_train_step(tiny_vocab=...)``) never
    reads.  Returns None for single-group models (prep uses the bare
    ``ids`` contract), possibly-empty dict otherwise."""
    groups = getattr(model, "table_groups", None)
    if groups is None or ("_default" in groups and len(groups) == 1):
        return None
    specs = model.table_specs
    out = {}
    for g, info in groups.items():
        bound = max(specs[n][1].vocab_size + 9 for n in info["tables"])
        if (bound + 2047) // 2048 * 2048 <= tiny_vocab:
            continue
        out[g] = info
    return out


class BucketOverflow(RuntimeError):
    """A batch's distinct-id count exceeded the step's static
    ``unique_bucket``.  Carries ``n_unique`` so the input pipeline can
    re-jit at a larger bucket instead of dying (see
    ``data/pipeline.py``)."""

    def __init__(self, n_unique: int, bucket: int):
        super().__init__(
            f"batch has {n_unique} distinct ids > unique_bucket "
            f"{bucket}; raise the bucket or shrink the batch"
        )
        self.n_unique = n_unique
        self.bucket = bucket


def make_batch_sort(field_size: int, unique_bucket=None,
                    native: bool | None = None, minimal: bool = False,
                    groups: dict | None = None,
                    kept_budget: dict | None = None):
    """Host-side batch prep: attach ``sorted_ids``/``perm``/``inv`` so
    the jitted sparse step skips its device sorts (~4.7 ms at bs 16000).
    The input pipeline runs this on CPU, overlapped with the device step.

    Backend: ``native/libmindrec_batchprep.so`` (stable LSD radix sort
    with packed index payload, ~5 ms/batch at bs 16000x39 vs ~76 ms for
    the numpy path) when built; the ctypes call releases the GIL so a
    thread pool overlaps prep with the device step.  ``native=None``
    auto-selects; ``False`` forces the numpy fallback (tests pin exact
    native<->numpy parity).

    ``unique_bucket``: when the step was built with a static unique
    bucket, pass the same value here — a batch whose distinct-id count
    exceeds it would silently drop ids on device, so the host prep
    raises :class:`BucketOverflow` instead (the same fail-loud contract
    as the cache adapter's ``max_swap``; ``data/pipeline.py`` catches it
    to re-jit at a larger bucket).

    ``minimal=True`` (native only) omits ``sorted_ids``/``inv`` from the
    output — the jitted step never reads them when the unique metadata
    is present, and skipping them cuts both prep time and host->device
    transfer (the pipeline's hot config).

    ``groups``: a model's ``table_groups`` mapping (or any
    ``{name: {"keys": (...)}}`` / ``{name: (keys...)}``) — prep runs per
    id group over the concatenation of the group's batch keys and emits
    ``{name}:``-prefixed metadata (bare keys for ``_default``), the
    multi-group contract of the streamed step.  ``unique_bucket`` may
    then be a ``{name: int}`` dict.

    ``kept_budget``: ``{group: int}`` — groups that declare
    ``mask_keys`` (multi-hot fields whose towers multiply by the mask,
    so mask==0 positions have EXACTLY zero gradient) get their sorted
    backward stream COMPACTED to masked-in positions, padded to this
    static length: the device crossing + segment-sum then process only
    ~density*N rows.  Pad slots point at position 0 with the sentinel
    segment, which no table tile owns.  Raises :class:`BucketOverflow`
    if a batch keeps more positions than the budget.  Semantic note: an
    id occurring ONLY at masked positions is not "touched" (no zero-grad
    lazy-optimizer visit) — under the usual padding convention (masked
    slots hold a reserved padding id) this only affects the padding
    row; tests/test_multitable.py pins exact parity elsewhere."""
    import numpy as np

    from mindrec_tpu.native import batchprep as _bp

    use_native = _bp.available() if native is None else native
    SENT = np.int32(2**31 - 2)

    def group_items(batch):
        if groups is None:
            yield "", np.asarray(batch["ids"]).reshape(-1), unique_bucket, None, None
            return
        for g, info in groups.items():
            keys = info["keys"] if isinstance(info, dict) else tuple(info)
            parts = [np.asarray(batch[k]) for k in keys]
            B = parts[0].shape[0]
            ids_g = (
                parts[0]
                if len(parts) == 1
                else np.concatenate([p.reshape(B, -1) for p in parts], axis=1)
            )
            pref = "" if g == "_default" else f"{g}:"
            bucket_g = (
                unique_bucket.get(g)
                if isinstance(unique_bucket, dict) else unique_bucket
            )
            mask_g = None
            budget_g = (kept_budget or {}).get(g)
            mask_keys = (
                info.get("mask_keys") if isinstance(info, dict) else None
            )
            if budget_g is not None and mask_keys:
                mparts = [np.asarray(batch[k]) for k in mask_keys]
                mask_g = np.concatenate(
                    [m.reshape(B, -1) for m in mparts], axis=1
                ).reshape(-1)
            yield pref, np.asarray(ids_g).reshape(-1), bucket_g, mask_g, budget_g

    def sort_meta(ids):
        """-> (sorted_ids, perm, inv, uq[n], uidx, uidx_sorted, nu)."""
        n = ids.size
        if use_native:
            return _bp.batch_prep(ids, uq_len=n, minimal=minimal)
        perm = np.argsort(ids, kind="stable").astype(np.int32)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(n, dtype=np.int32)
        sorted_ids = ids[perm]
        newv = np.empty(n, bool)
        newv[0] = True
        np.not_equal(sorted_ids[1:], sorted_ids[:-1], out=newv[1:])
        uidx_sorted = np.cumsum(newv, dtype=np.int32) - 1
        uq = np.full(n, SENT, np.int32)
        u = sorted_ids[newv]
        uq[: u.size] = u
        return sorted_ids, perm, inv, uq, uidx_sorted[inv], uidx_sorted, int(u.size)

    def prep_one(out, pref, ids, bucket, mask=None, budget=None):
        n = ids.size
        if mask is not None:
            # masked-position compaction: sort only masked-in positions
            # (their excluded peers carry exactly zero gradient)
            pos = np.flatnonzero(mask > 0).astype(np.int32)
            nk = pos.size
            if nk > budget:
                raise BucketOverflow(nk, budget)
            (_s, perm_k, _i, uq_k, uidx_k, uidx_sorted_k,
             nu) = sort_meta(ids[pos])
            if bucket is not None and nu >= bucket:
                # >= : the pad slots' sentinel segment needs index nu
                raise BucketOverflow(nu + 1, bucket)
            perm = np.zeros(budget, np.int32)  # pads: position 0 ...
            perm[:nk] = pos[perm_k]
            uidx_sorted = np.full(budget, nu, np.int32)  # ... sentinel seg
            uidx_sorted[:nk] = uidx_sorted_k
            uq = np.full(n, SENT, np.int32)
            uq[:nk] = uq_k
            uidx = np.zeros(n, np.int32)
            uidx[pos] = uidx_k
            out[pref + "perm"] = perm
            out[pref + "uq_ids"] = uq
            out[pref + "uidx"] = uidx
            out[pref + "uidx_sorted"] = uidx_sorted
            return
        sorted_ids, perm, inv, uq, uidx, uidx_sorted, nu = sort_meta(ids)
        if bucket is not None and nu > bucket:
            raise BucketOverflow(nu, bucket)
        if not minimal and sorted_ids is not None:
            out[pref + "sorted_ids"] = sorted_ids
            out[pref + "inv"] = inv
        out[pref + "perm"] = perm
        out[pref + "uq_ids"] = uq
        out[pref + "uidx"] = uidx
        out[pref + "uidx_sorted"] = uidx_sorted

    def prep(batch: dict) -> dict:
        out = dict(batch)
        for pref, ids_g, bucket_g, mask_g, budget_g in group_items(batch):
            prep_one(out, pref, ids_g, bucket_g, mask_g, budget_g)
        return out

    return prep


def make_eval_step(model, jit: bool = True):
    """Build ``eval_step(params, batch) -> (probs, labels)`` (the
    reference PredictWithSigmoid head, ``wide_and_deep.py:495-519``)."""

    def eval_step(params, batch):
        probs = model.predict_batch(params, batch)
        return probs, batch["label"]

    return jax.jit(eval_step) if jit else eval_step
