"""Round-5 gather/update attribution at the CURRENT bench shape.

The r04 verdict: the primary W&D step sits at ~46% of its analytic
floor, and the two table pumps (gather 3.13 ms + adam 3.23 ms) are the
largest closable terms.  This sweep measures, at the unique-first
bench shape (U bucket ~102400, deep [16, 5.86M] f32, wide [8, 732k]):

  1. the production streamed_gather_rows (tile/chunk sweep);
  2. XLA-native alternatives: axis-1 gather, transposed row gather,
     and the 512-byte "packed-rows" layout gather + lane extract
     (the r03 permute experiments' fast path applied to the table);
  3. the streamed adam/ftrl updates at unique-first shapes.

Run: python benchmarks/sweep_gather_r5.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    leaf = jax.tree.leaves(x)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:58s} {dt:8.3f} ms", flush=True)
    return out


def main():
    from mindrec_tpu.data.criteo import SyntheticCriteo
    from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
    from mindrec_tpu.ops.pallas.stream_gather import streamed_gather_rows
    from mindrec_tpu.ops.pallas import stream_update as su
    from mindrec_tpu.train.step import _pick_tile

    cfg = WideDeepConfig(
        batch_size=16000, field_size=39, vocab_size=5_860_000, emb_dim=16,
        use_mixed_precision=True, sparse=True, loss_scale=1024.0,
    )
    model = WideDeepModel(cfg)
    wide_spec = model.wide_spec
    deep_spec = model.deep_spec
    dw_rows, Vw = wide_spec.storage_shape
    dd_rows, Vd = deep_spec.storage_shape
    print(f"wide [{dw_rows},{Vw}] fold={wide_spec.fold} | "
          f"deep [{dd_rows},{Vd}] fold={deep_spec.fold}", flush=True)

    data = SyntheticCriteo(cfg.batch_size, cfg.field_size, cfg.vocab_size,
                           steps=1, fields="criteo")
    ids = np.asarray(data.get_batch(0)["ids"]).reshape(-1)
    uq = np.unique(ids)
    ub = (int(uq.size * 1.2) + 2047) // 2048 * 2048
    print(f"N={ids.size} uniques={uq.size} bucket={ub}", flush=True)
    uq_b = np.full(ub, np.int32(2**31 - 2))
    uq_b[: uq.size] = uq
    uq_b = jax.device_put(jnp.asarray(uq_b))
    cols_w = jnp.where(uq_b < Vw * wide_spec.fold, uq_b // wide_spec.fold,
                       jnp.int32(2**31 - 2))
    fence(cols_w)

    key = jax.random.PRNGKey(0)
    td = jax.device_put(jax.random.normal(key, (dd_rows, Vd), jnp.float32))
    tw = jax.device_put(jax.random.normal(key, (dw_rows, Vw), jnp.float32))
    fence(td); fence(tw)
    width = 128
    base = jnp.zeros((ub, width), jnp.float32)

    # 1. production streamed_gather_rows, tile sweep
    for tile in (2048, 4096, 8192):
        if Vd % tile:
            continue
        f = jax.jit(lambda t, c, b, tile=tile: streamed_gather_rows(
            t, c, b, lane_offset=8, tile=tile))
        timeit(f"streamed_gather_rows deep T={tile} C=256", f, td, uq_b, base)
    tlw = _pick_tile(Vw, dp=dw_rows)
    f = jax.jit(lambda t, c, b: streamed_gather_rows(t, c, b, lane_offset=0,
                                                     tile=tlw))
    timeit(f"streamed_gather_rows wide T={tlw}", f, tw, cols_w, base)

    # 2a. XLA axis-1 gather
    timeit("xla take(td, uq, axis=1).T [ub,16]",
           jax.jit(lambda t, c: jnp.take(t, c, axis=1, mode='clip').T),
           td, uq_b)

    # 2b. XLA transposed row gather (64-byte rows)
    tdT = jnp.asarray(td.T)  # [Vd, 16]
    fence(tdT)
    timeit("xla rowgather tdT[uq] [ub,16] (64B rows)",
           jax.jit(lambda t, c: jnp.take(t, c, axis=0, mode='clip')),
           tdT, uq_b)

    # 2c. packed-rows layout: [Vd/8, 128] f32, row q = ids 8q..8q+7
    #     (512-byte rows — the r03 fast-path shape), then lane extract
    tdP = jnp.asarray(td.T.reshape(Vd // 8, 128))
    fence(tdP)

    def packed_gather(tp, c):
        rows = jnp.take(tp, c // 8, axis=0, mode='clip')      # [ub, 128]
        sub = (c % 8).astype(jnp.int32)
        m = (jax.lax.broadcasted_iota(jnp.int32, (c.shape[0], 8), 1)
             == sub[:, None])
        return jnp.sum(rows.reshape(-1, 8, 16) * m[..., None].astype(rows.dtype),
                       axis=1)  # [ub, 16]

    timeit("xla packed rowgather [Vd/8,128] + extract",
           jax.jit(packed_gather), tdP, uq_b)

    # 2d. packed WIDE: [Vw*8/128, 128] — wide id u at (row u//128, lane u%128)
    twP = jnp.asarray(tw.T.reshape(-1, 128))  # [Vw*8/128? ...]
    fence(twP)

    def packed_gather_w(tp, c):
        # wide logical id u: storage (sublane u%8, col u//8) -> flat
        # feature-major index col*8? NO: tw is [8, Vw]: element (s, q) is
        # id q*8+s?? fold layout: id u -> col u//8, sub u%8.  tw.T is
        # [Vw, 8] rows = col-major runs of 8 consecutive ids; reshape to
        # [Vw/16, 128]: row r = ids 128r..128r+127 in order.
        rows = jnp.take(tp, c // 128, axis=0, mode='clip')    # [ub, 128]
        lane = (c % 128).astype(jnp.int32)
        m = (jax.lax.broadcasted_iota(jnp.int32, (c.shape[0], 128), 1)
             == lane[:, None])
        return jnp.sum(rows * m.astype(rows.dtype), axis=1, keepdims=True)

    timeit("xla packed wide rowgather + lane extract",
           jax.jit(packed_gather_w), twP, uq_b)

    # 2e. fused packed deep+wide into one [ub,128] buffer write
    def packed_both(tp, wp, c):
        d = packed_gather(tp, c)
        w = packed_gather_w(wp, c)
        return jnp.concatenate(
            [w, d, jnp.zeros((c.shape[0], 128 - 24), jnp.float32)], axis=1)

    timeit("xla packed BOTH -> [ub,128] buffer",
           jax.jit(packed_both), tdP, twP, uq_b)

    # 3. streamed updates at unique-first shapes
    m0 = jnp.zeros((dd_rows, Vd), jnp.bfloat16)
    v0 = jnp.zeros((dd_rows, Vd), jnp.bfloat16)
    g_aug_d = jnp.ones((dd_rows + 8, ub), jnp.float32)
    tld = _pick_tile(Vd, update=True, dp=dd_rows)
    adam = jax.jit(lambda t, m, v, c, g: su.streamed_adam_cols(
        t, m, v, c, g, jnp.float32(3.5e-4), dim=deep_spec.emb_dim,
        fold=deep_spec.fold, loss_scale=1024.0, tile=tld))
    timeit(f"streamed_adam deep T={tld} (uq-first)", adam, td, m0, v0,
           uq_b, g_aug_d)

    a0 = jnp.zeros((dw_rows, Vw), jnp.float32)
    l0 = jnp.zeros((dw_rows, Vw), jnp.float32)
    g_aug_w = jnp.ones((dw_rows + 8, ub), jnp.float32)
    tlw_u = _pick_tile(Vw, update=True, dp=dw_rows)
    ftrl = jax.jit(lambda t, a, l, c, g: su.streamed_ftrl_cols(
        t, a, l, c, g, dim=wide_spec.emb_dim, fold=wide_spec.fold,
        loss_scale=1024.0, tile=tlw_u))
    timeit(f"streamed_ftrl wide T={tlw_u} (uq-first)", ftrl, tw, a0, l0,
           cols_w, g_aug_w)

    # 4. the two order crossings at bench shape, for scale
    bufR = jnp.zeros((ub, 128), jnp.float32)
    uidx_b = jax.device_put(
        jnp.asarray(np.random.randint(0, uq.size, ids.size, dtype=np.int32)))
    fence(uidx_b)
    timeit("fwd expand buf[uidx_batch] -> [624k,128] bf16",
           jax.jit(lambda b, i: b[i].astype(jnp.bfloat16)), bufR, uidx_b)
    gd = jnp.ones((ids.size, 128), jnp.bfloat16)
    perm = jax.device_put(jnp.asarray(np.random.permutation(
        ids.size).astype(np.int32)))
    fence(perm)
    timeit("bwd crossing g[perm] [624k,128] bf16",
           jax.jit(lambda g, p: g[p]), gd, perm)


if __name__ == "__main__":
    main()
