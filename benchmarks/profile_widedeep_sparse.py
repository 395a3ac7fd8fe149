"""Ablation profile of the Wide&Deep SPARSE step (benchmark recipe) on
the real chip: attribute the ~23 ms step at bs 16000, vocab 5.86M,
emb 16, 7x1024 MLP, row-major layout."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import os
import sys
import time

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
    and os.environ.get("MINDREC_BENCH_REEXEC") != "1"
):
    os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "1"
    os.environ["MINDREC_BENCH_REEXEC"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

import jax
import jax.numpy as jnp

from mindrec_tpu.data.criteo import SyntheticCriteo
from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
from mindrec_tpu.ops.pallas.stream_gather import streamed_gather_rows
from mindrec_tpu.ops.pallas.stream_segsum import streamed_segsum
from mindrec_tpu.train.step import _pick_tile


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
    print(f"{name:56s} {dt:8.2f} ms", flush=True)
    return out


def main():
    B, F, V, D = 16000, 39, 5_860_000, 16
    N = B * F
    cfg = WideDeepConfig(batch_size=B, field_size=F, vocab_size=V, emb_dim=D,
                         deep_layer_dim=(1024,) * 7, sparse=True,
                         loss_scale=1024.0)
    model = WideDeepModel(cfg)
    d_spec, w_spec = model.deep_spec, model.wide_spec
    print(f"deep storage {d_spec.storage_shape}, wide {w_spec.storage_shape}",
          flush=True)
    data = SyntheticCriteo(B, F, V, steps=1, seed=0, fields="criteo")
    ids = jax.device_put(data.get_batch(0)["ids"])
    key = jax.random.PRNGKey(0)
    d_tab = jax.random.normal(key, d_spec.storage_shape, jnp.float32) * 0.01
    w_tab = jax.random.normal(key, w_spec.storage_shape, jnp.float32) * 0.01

    @jax.jit
    def prep(ids):
        n = ids.size
        iota = jnp.arange(n, dtype=jnp.int32)
        sorted_ids, perm = jax.lax.sort_key_val(ids.reshape(-1), iota)
        _, inv = jax.lax.sort_key_val(perm, iota)
        newv = jnp.concatenate([jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]])
        uidx_sorted = jnp.cumsum(newv.astype(jnp.int32)) - 1
        uq = jnp.sort(jnp.where(newv, sorted_ids, jnp.int32(2**31 - 2)))
        return sorted_ids, perm, inv, uq, uidx_sorted[inv], uidx_sorted

    sorted_ids, perm, inv, uq, uidx, uidx_sorted = prep(ids)
    n_unique = int(jnp.sum(uq < 2**31 - 2))
    ub = int((n_unique * 1.2 + 2047) // 2048 * 2048)
    print(f"unique: {n_unique:,} / {N:,}; bucket {ub:,}", flush=True)
    uq_b = uq[:ub]

    # 1. row-major gathers into the [Ub, 128] buffer
    buf0 = jnp.zeros((ub, 128), jnp.float32)
    tl_d = _pick_tile(d_tab.shape[1], dp=d_tab.shape[0])
    tl_w = _pick_tile(w_tab.shape[1], dp=w_tab.shape[0])
    buf = timeit("gather_rows deep [16, 5.94M]",
                 jax.jit(lambda t, c, b: streamed_gather_rows(t, c, b, lane_offset=0, tile=tl_d)),
                 d_tab, uq_b, buf0)
    buf = timeit("gather_rows wide [8, 743k] fold",
                 jax.jit(lambda t, c, b: streamed_gather_rows(t, c // 8, b, lane_offset=16, tile=tl_w)),
                 w_tab, uq_b, jnp.zeros((ub, 128), jnp.float32))

    # 2. crossings
    timeit("expansion gather buf[uidx] [624k,128] f32",
           jax.jit(lambda b, i: b[i]), buf, uidx)
    g_delta = jax.random.normal(key, (N, 128), jnp.bfloat16)
    timeit("perm gather g[perm] [624k,128] bf16",
           jax.jit(lambda g, p: g[p]), g_delta, perm)
    g32 = g_delta.astype(jnp.float32)
    timeit("perm gather g[perm] [624k,128] f32",
           jax.jit(lambda g, p: g[p]), g32, perm)

    # 3. segsum row-major
    timeit("segsum row-major [624k,128] bf16 -> [128, Ub]",
           jax.jit(lambda g, u: streamed_segsum(g, u, row_major=True, n_out=ub)),
           g_delta, uidx_sorted)

    # 4. streamed updates at 5.94M cols
    from mindrec_tpu.ops.pallas import stream_update as su

    m = jnp.zeros(d_spec.storage_shape, jnp.bfloat16)
    v = jnp.zeros(d_spec.storage_shape, jnp.bfloat16)
    g_aug = jnp.zeros((16 + 8, ub), jnp.float32)
    tile_u = _pick_tile(d_tab.shape[1], update=True, dp=d_tab.shape[0])

    def adam_d(t, m, v, cols, g):
        return su.streamed_adam_cols(t, m, v, cols, g, 3.5e-4, dim=D, fold=1,
                                     b1=0.9, b2=0.999, eps=1e-8,
                                     loss_scale=1024.0, tile=tile_u)

    timeit("streamed_adam deep [16, 5.94M] bf16 state",
           jax.jit(adam_d), d_tab, m, v, uq_b, g_aug)

    wa = jnp.full(w_spec.storage_shape, 1.0, jnp.float32)
    wl = jnp.zeros(w_spec.storage_shape, jnp.float32)
    gw_aug = jnp.zeros((8 + 8, ub), jnp.float32)
    tile_w = _pick_tile(w_tab.shape[1], update=True, dp=w_tab.shape[0])

    def ftrl_w(t, a, l, cols, g):
        return su.streamed_ftrl_cols(t, a, l, cols, g, dim=1, fold=8,
                                     learning_rate=5e-2, l1=1e-8, l2=1e-8,
                                     loss_scale=1024.0, tile=tile_w)

    timeit("streamed_ftrl wide [8, 743k]",
           jax.jit(ftrl_w), w_tab, wa, wl, uq_b // 8, gw_aug)

    # 5. MLP fwd+bwd
    rows = jax.random.normal(key, (B, F, D), jnp.bfloat16)
    wts = jnp.ones((B, F), jnp.float32)

    dims = [F * D] + [1024] * 7 + [1]
    keys = jax.random.split(key, len(dims))
    mlp = [{"w": 0.01 * jax.random.normal(k, (i, o), jnp.float32),
            "b": jnp.zeros((o,), jnp.float32)}
           for k, i, o in zip(keys, dims[:-1], dims[1:])]

    def mlp_loss(mlp, rows):
        h = (rows * wts[:, :, None].astype(rows.dtype)).reshape(B, F * D)
        for i, l in enumerate(mlp):
            h = jnp.dot(h, l["w"].astype(jnp.bfloat16)) + l["b"].astype(jnp.bfloat16)
            if i < len(mlp) - 1:
                h = jax.nn.relu(h)
        return jnp.sum(h.astype(jnp.float32))

    timeit("MLP 624/7x1024/1 fwd+bwd", jax.jit(jax.grad(mlp_loss, argnums=(0, 1))), mlp, rows)

    # 6. full step
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.step import init_train_state, make_train_step

    opt_w = optim.ftrl(loss_scale=1024.0)
    opt_d = optim.lazy_adam(loss_scale=1024.0, state_dtype=jnp.bfloat16)
    state = init_train_state(model, jax.random.PRNGKey(0), opt_w, opt_d)
    step = make_train_step(model, opt_w, opt_d, jit=True, donate=True,
                           unique_bucket=ub)
    batch = {"ids": ids, "wts": wts,
             "label": jnp.zeros((B, 1), jnp.float32),
             "sorted_ids": sorted_ids, "perm": perm, "inv": inv,
             "uq_ids": uq, "uidx": uidx, "uidx_sorted": uidx_sorted}
    state, _ = step(state, batch)
    fence(state.step)
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        state, losses = step(state, batch)
    float(losses[1])
    print(f"{'FULL sparse step':56s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
