"""Ablation profile of the DeepFM SPARSE step pieces on the real chip.

Times each stage of train/step.py's pallas sparse path at the exact
DeepFM benchmark shape (bs 16000 x 39 fields, vocab 184,965, emb 80) so
the 23 ms step can be attributed: streamed gathers, the two
batch<->sorted order crossings, the transposes, segsum, and the
streamed Adam updates.
"""

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
from mindrec_tpu.models.deepfm import DeepFMConfig, DeepFMModel
from mindrec_tpu.ops.pallas.stream_gather import streamed_gather
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
    B, F, V, D = 16000, 39, 184_965, 80
    N = B * F
    cfg = DeepFMConfig(batch_size=B, field_size=F, vocab_size=V, emb_dim=D,
                       sparse=True, loss_scale=1024.0)
    model = DeepFMModel(cfg)
    v_spec, w_spec = model.v_spec, model.w_spec
    data = SyntheticCriteo(B, F, V, steps=1, seed=0, fields="criteo")
    ids = jax.device_put(data.get_batch(0)["ids"])
    key = jax.random.PRNGKey(0)
    v_tab = jax.random.normal(key, v_spec.storage_shape, jnp.float32) * 0.01
    w_tab = jax.random.normal(key, w_spec.storage_shape, jnp.float32) * 0.01
    print(f"v storage {v_spec.storage_shape}, w storage {w_spec.storage_shape}", flush=True)

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
    print(f"unique: {n_unique:,} / {N:,}", flush=True)

    timeit("device sort+unique prep", prep, ids)

    # 1. streamed gathers (unique cols, N-padded)
    tl_v = _pick_tile(v_tab.shape[1], dp=v_tab.shape[0])
    tl_w = _pick_tile(w_tab.shape[1], dp=w_tab.shape[0])
    g_v = timeit("streamed_gather v [80, 188416]",
                 jax.jit(lambda t, c: streamed_gather(t, c, tile=tl_v)), v_tab, uq)
    timeit("streamed_gather w [8, 23552]",
           jax.jit(lambda t, c: streamed_gather(t, c // 8, tile=tl_w)), w_tab, uq)

    # 2. concat + bf16 + transpose (the `big` build)
    big = jnp.concatenate([g_v[:D], jnp.zeros((8, N), jnp.float32)]).astype(jnp.bfloat16)

    timeit("transpose [88, N] -> [N, 88] bf16",
           jax.jit(lambda b: b.T.copy()), big)

    bigT = big.T

    # 3. order crossings (the two row gathers)
    timeit("expansion gather bigT[uidx] [624k, 88] bf16",
           jax.jit(lambda b, i: b[i]), bigT, uidx)
    g_delta = jax.random.normal(key, (N, 88), jnp.bfloat16)
    timeit("perm gather g_delta[perm] [624k, 88] bf16",
           jax.jit(lambda g, p: g[p]), g_delta, perm)

    # 4. segsum of sorted grads
    g_sorted = g_delta
    timeit("streamed_segsum [88, 624k]",
           jax.jit(lambda g, u: streamed_segsum(g.T, u)), g_sorted, uidx_sorted)

    # 5. streamed Adam updates
    from mindrec_tpu.ops.pallas import stream_update as su

    m_v = jnp.zeros(v_spec.storage_shape, jnp.bfloat16)
    vv_v = jnp.zeros(v_spec.storage_shape, jnp.bfloat16)
    g_aug = jnp.zeros((88, N), jnp.float32)
    tile_u = _pick_tile(v_tab.shape[1], update=True, dp=v_tab.shape[0])

    def adam_v(t, m, v, cols, g):
        return su.streamed_adam_cols(
            t, m, v, cols, g, 3.5e-4, dim=D, fold=1,
            b1=0.9, b2=0.999, eps=1e-8, loss_scale=1024.0, tile=tile_u,
        )

    timeit("streamed_adam v [80, 188416]", jax.jit(adam_v), v_tab, m_v, vv_v, uq, g_aug)

    # 6. MLP + FM fwd+bwd from per-position rows
    rows = jax.random.normal(key, (B, F, D), jnp.bfloat16)
    wts = jnp.ones((B, F), jnp.float32)
    label = jnp.zeros((B, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(1))

    def head_loss(mlp, rows):
        vx = rows * wts[:, :, None].astype(rows.dtype)
        v1 = jnp.square(jnp.sum(vx, axis=1, dtype=jnp.float32))
        v2 = jnp.sum(jnp.square(vx.astype(jnp.float32)), axis=1)
        fm = 0.5 * jnp.sum(v1 - v2, axis=1)[:, None]
        h = vx.reshape(B, F * D)
        for i, l in enumerate(mlp):
            h = jnp.dot(h, l["w"].astype(jnp.bfloat16)) + l["b"].astype(jnp.bfloat16)
            if i < len(mlp) - 1:
                h = jax.nn.relu(h)
        return jnp.sum(fm + h.astype(jnp.float32))

    timeit("FM+MLP fwd+bwd from rows", jax.jit(jax.grad(head_loss, argnums=(0, 1))),
           params["mlp"], rows)

    # 7. full sparse step for reference
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.step import init_train_state, make_train_step

    opt = optim.adam(learning_rate=5e-4, eps=5e-8, loss_scale=1024.0,
                     state_dtype=jnp.bfloat16)
    state = init_train_state(model, jax.random.PRNGKey(0), opt, opt)
    step = make_train_step(model, opt, opt, jit=True, donate=True)
    batch = {"ids": ids, "wts": wts, "label": label,
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
