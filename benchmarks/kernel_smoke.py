"""Per-kernel timing at the reference benchmark scale (real TPU).

Times each component of the sparse Wide&Deep step in isolation with the
chained-dispatch + scalar-fetch fencing pattern (jax.block_until_ready
is a no-op through the axon dev tunnel).  All data is generated
on-device (host->device upload through the tunnel is ~2 MB/s).

Usage: python benchmarks/kernel_smoke.py [sort|gather|permute|adam|ftrl|mlp|all]
"""

import sys
import time

import jax
import jax.numpy as jnp

from mindrec_tpu.ops.pallas.stream_gather import streamed_gather
from mindrec_tpu.ops.pallas.stream_update import (
    make_aug_grads,
    streamed_adam_cols,
    streamed_ftrl_cols,
)

B, F, V, D = 16000, 39, 5_860_000, 16
N = B * F
VP = 5_865_472  # EmbeddingTableSpec(vocab=5.86M, alignment 8192).padded_vocab
VC_W = VP // 8


def fence(x):
    while isinstance(x, (tuple, list)):
        x = x[0]
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, f, *a, n=10):
    t0 = time.perf_counter()
    fence(f(*a))
    print(f"{name}: compile+warm {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    outs = [f(*a) for _ in range(n)]
    for o in outs:
        fence(o)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1e3:.3f} ms", flush=True)


def main(which="all"):
    k = jax.random.PRNGKey(0)
    ids = jax.random.randint(k, (N,), 0, V, jnp.int32)
    iota = jnp.arange(N, dtype=jnp.int32)
    sorted_ids, perm = jax.jit(lambda i: jax.lax.sort_key_val(i, iota))(ids)
    inv = jax.jit(lambda p: jax.lax.sort_key_val(p, iota)[1])(perm)

    if which in ("sort", "all"):
        f = jax.jit(lambda i: jax.lax.sort_key_val(i, iota)[0])
        timeit("sort_key_val 624k", f, ids)

    if which in ("gather", "all"):
        table = jax.random.normal(k, (D, VP), jnp.float32)
        f = jax.jit(lambda t, c: streamed_gather(t, c, tile=2048))
        timeit(f"streamed_gather [16,{VP}] 624k", f, table, sorted_ids)

    if which in ("permute", "all"):
        rows = jax.random.normal(k, (N, D + 8), jnp.float32)
        f = jax.jit(lambda x, i: jnp.take(x, i, axis=0))
        timeit("permute take [624k,24]", f, rows, inv)

    if which in ("adam", "all"):
        table = jax.random.normal(k, (D, VP), jnp.float32)
        m = jnp.zeros((D, VP))
        v = jnp.zeros((D, VP))
        g = jax.random.normal(k, (D, N), jnp.float32)
        ga = jax.jit(lambda g: make_aug_grads(g, None))(g)
        f = jax.jit(
            lambda t, m, v, c, ga: streamed_adam_cols(
                t, m, v, c, ga, 1e-3, dim=D, tile=2048
            )
        )
        timeit(f"streamed_adam [16,{VP}]", f, table, m, v, sorted_ids, ga, n=5)

    if which in ("ftrl", "all"):
        wt = jax.random.normal(k, (8, VC_W), jnp.float32)
        acc = jnp.ones((8, VC_W))
        lin = jnp.zeros((8, VC_W))
        cols = sorted_ids // 8
        sub = sorted_ids % 8
        gw = jax.random.normal(k, (8, N), jnp.float32)
        ga = jax.jit(lambda g, s: make_aug_grads(g, s))(gw, sub)
        f = jax.jit(
            lambda t, a, l, c, ga: streamed_ftrl_cols(
                t, a, l, c, ga, dim=1, fold=8, tile=2048
            )
        )
        timeit(f"streamed_ftrl wide [8,{VC_W}]", f, wt, acc, lin, cols, ga, n=5)

    if which in ("mlp", "all"):
        dims = [F * D] + [1024] * 7 + [1]
        W = [
            jax.random.normal(jax.random.PRNGKey(i), (a, b), jnp.float32) * 0.01
            for i, (a, b) in enumerate(zip(dims[:-1], dims[1:]))
        ]
        x = jax.random.normal(k, (B, F * D), jnp.float32)

        def mlp_loss(W, x):
            h = x.astype(jnp.bfloat16)
            for i, w in enumerate(W):
                h = h @ w.astype(jnp.bfloat16)
                if i < len(W) - 1:
                    h = jax.nn.relu(h)
            return jnp.sum(h.astype(jnp.float32))

        f = jax.jit(lambda W, x: jax.grad(mlp_loss, argnums=1)(W, x))
        timeit("MLP 7x1024 fwd+bwd bs16000", f, W, x)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
