"""Break down the DeepFM dense-path train-step cost on the real chip.

Times each piece of the step in isolation: table gather fwd, gather
fwd+bwd (XLA scatter-add), the FM interaction, the MLP fwd+bwd, and the
full-table Adam update — so we can see which piece eats the gap to the
21 ms/step Ascend-910 reference (``models/deepfm/README.md:427-433``).
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import time

import jax
import jax.numpy as jnp
import numpy as np

from mindrec_tpu.data.criteo import SyntheticCriteo


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
    data = SyntheticCriteo(B, F, V, steps=1, seed=0, fields="criteo")
    b = data.get_batch(0)
    ids = jax.device_put(b["ids"])
    wts = jax.device_put(b["wts"])
    label = jax.device_put(b["label"])
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (V, D), jnp.float32) * 0.01
    w_tab = jax.random.normal(key, (V, 1), jnp.float32) * 0.01
    print(f"unique ids in batch: {len(np.unique(np.asarray(b['ids']))):,}", flush=True)

    # 1. gather forward only (embedding table + the [V,1] linear/wide term)
    timeit("gather [624k,80] fwd", jax.jit(lambda t, i: jnp.take(t, i.reshape(-1), axis=0)), table, ids)
    timeit("gather [624k,1] linear-term fwd", jax.jit(lambda t, i: jnp.take(t, i.reshape(-1), axis=0)), w_tab, ids)

    # 2. gather fwd + scatter-add bwd
    def g_loss(t, i):
        return jnp.sum(jnp.take(t, i.reshape(-1), axis=0).astype(jnp.bfloat16).astype(jnp.float32))

    timeit("gather fwd+bwd (scatter-add)", jax.jit(jax.grad(g_loss)), table, ids)

    # 3. FM interaction fwd+bwd from gathered rows
    rows = jnp.take(table, ids.reshape(-1), axis=0).reshape(B, F, D).astype(jnp.bfloat16)

    def fm_loss(vr, w):
        mask = w[:, :, None]
        vx = vr * mask.astype(vr.dtype)
        v1 = jnp.square(jnp.sum(vx, axis=1, dtype=jnp.float32))
        v2 = jnp.sum(jnp.square(vx.astype(jnp.float32)), axis=1)
        return jnp.sum(0.5 * (v1 - v2))

    timeit("FM interaction fwd+bwd", jax.jit(jax.grad(fm_loss)), rows, wts)

    # 4. MLP fwd+bwd
    dims = [F * D, 1024, 512, 256, 128, 1]
    keys = jax.random.split(key, len(dims))
    mlp = [
        {"w": 0.01 * jax.random.normal(k, (i, o), jnp.float32), "b": jnp.zeros((o,), jnp.float32)}
        for k, i, o in zip(keys, dims[:-1], dims[1:])
    ]
    x0 = rows.reshape(B, F * D)

    def mlp_loss(mlp, x):
        h = x.astype(jnp.bfloat16)
        for i, l in enumerate(mlp):
            h = jnp.dot(h, l["w"].astype(jnp.bfloat16)) + l["b"].astype(jnp.bfloat16)
            if i < len(mlp) - 1:
                h = jax.nn.relu(h)
        return jnp.sum(h.astype(jnp.float32))

    timeit("MLP 3120/1024/512/256/128/1 fwd+bwd", jax.jit(jax.grad(mlp_loss)), mlp, x0)

    # 5. full-table dense Adam update (w + m + v stream).  Buffers are
    # donated, so rebind the outputs each iteration (re-calling with a
    # donated-and-deleted buffer raises on TPU).
    m = jnp.zeros((V, D), jnp.bfloat16)
    v = jnp.zeros((V, D), jnp.bfloat16)
    g = jnp.ones((V, D), jnp.float32)

    def adam(t, m, v, g):
        m2 = 0.9 * m.astype(jnp.float32) + 0.1 * g
        v2 = 0.999 * v.astype(jnp.float32) + 0.001 * g * g
        t2 = t - 5e-4 * m2 / (jnp.sqrt(v2) + 5e-8)
        return t2, m2.astype(jnp.bfloat16), v2.astype(jnp.bfloat16)

    adam_fn = jax.jit(adam, donate_argnums=(0, 1, 2))
    t_a, m, v = adam_fn(table.copy(), m, v, g)
    fence(t_a)
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        t_a, m, v = adam_fn(t_a, m, v, g)
    fence(t_a)
    print(f"{'dense Adam full table [185k,80]':56s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms", flush=True)

    # 6. full dense step for comparison
    from mindrec_tpu.models.deepfm import DeepFMConfig, DeepFMModel
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.step import init_train_state, make_train_step

    cfg = DeepFMConfig(batch_size=B, field_size=F, vocab_size=V, emb_dim=D,
                       deep_layer_dim=(1024, 512, 256, 128), use_mixed_precision=True,
                       sparse=False, loss_scale=1024.0)
    model = DeepFMModel(cfg)
    opt = optim.adam(learning_rate=5e-4, eps=5e-8, loss_scale=1024.0, state_dtype=jnp.bfloat16)
    state = init_train_state(model, jax.random.PRNGKey(0), opt, opt)
    step = make_train_step(model, opt, opt, jit=True, donate=True)
    batch = {"ids": ids, "wts": wts, "label": label}

    def run(state):
        s2, losses = step(state, batch)
        return s2

    state = run(state)
    fence(state.step)
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        state = run(state)
    fence(state.params["mlp"][0]["b"])
    print(f"{'FULL dense step':56s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
