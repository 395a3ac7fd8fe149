"""Per-kernel timing at the reference benchmark scale (real TPU).

Each kernel is iterated inside ONE jitted ``lax.fori_loop`` that carries
its big operand through the loop (true data dependence), so a single
scalar fetch fences N real executions — per-dispatch tunnel overhead
(~30 ms through axon) is amortized away.  All data is generated
on-device (host->device upload through the tunnel is ~2 MB/s).

Usage: python benchmarks/kernel_smoke.py [sort|gather|permute|adam|ftrl|mlp|all]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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
ITERS = 10


def fence(x):
    while isinstance(x, (tuple, list)):
        x = x[0]
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(name, chained_fn, *args):
    """chained_fn(n, *args) runs the kernel n times with data dependence."""
    f1 = jax.jit(chained_fn, static_argnums=0)
    t0 = time.perf_counter()
    fence(f1(1, *args))
    print(f"{name}: compile+warm {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    fence(f1(1, *args))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    fence(f1(1 + ITERS, *args))
    tn = time.perf_counter() - t0
    print(f"{name}: {(tn - t1) / ITERS * 1e3:.3f} ms", flush=True)


def main(which="all"):
    k = jax.random.PRNGKey(0)
    ids = jax.random.randint(k, (N,), 0, V, jnp.int32)

    def _iota():
        return jnp.arange(N, dtype=jnp.int32)

    sorted_ids, perm = jax.jit(
        lambda i: jax.lax.sort_key_val(i, _iota())
    )(ids)
    inv = jax.jit(lambda p: jax.lax.sort_key_val(p, _iota())[1])(perm)

    if which in ("sort", "all"):
        def chain(n, ids0):
            def body(_, ids):
                s, p = jax.lax.sort_key_val(ids, _iota())
                return jnp.bitwise_xor(s, p)  # dependence, keeps range-ish
            return jax.lax.fori_loop(0, n, body, ids0)
        timeit("sort_key_val 624k", chain, ids)

    if which in ("gather", "all"):
        table = jax.random.normal(k, (D, VP), jnp.float32)
        def chain(n, t, c):
            def body(_, carry):
                t_, c_ = carry
                r = streamed_gather(t_, c_, tile=2048)  # [Dp, N]
                # fold a scalar of the result back into the cols (dependence)
                bump = (r[0, 0] > 1e30).astype(jnp.int32)
                return t_, c_ + bump
            return jax.lax.fori_loop(0, n, body, (t, c))[1]
        timeit(f"streamed_gather [16,{VP}] 624k", chain, table, sorted_ids)

    if which in ("permute", "all"):
        rows = jax.random.normal(k, (N, 24), jnp.float32)
        def chain(n, x, i):
            def body(_, x_):
                return jnp.take(x_, i, axis=0)
            return jax.lax.fori_loop(0, n, body, x)
        timeit("permute take [624k,24]", chain, rows, inv)

    if which in ("adam", "all"):
        table = jax.random.normal(k, (D, VP), jnp.float32)
        m = jnp.zeros((D, VP))
        v = jnp.zeros((D, VP))
        g = jax.random.normal(k, (D, N), jnp.float32) * 1e-3
        ga = jax.jit(lambda g: make_aug_grads(g, None))(g)
        def chain(n, t, m_, v_, c, ga_):
            def body(_, carry):
                t_, m2, v2 = carry
                return streamed_adam_cols(t_, m2, v2, c, ga_, 1e-3, dim=D,
                                          tile=2048)
            return jax.lax.fori_loop(0, n, body, (t, m_, v_))
        timeit(f"streamed_adam [16,{VP}]", chain, table, m, v, sorted_ids, ga)

    if which in ("ftrl", "all"):
        wt = jax.random.normal(k, (8, VC_W), jnp.float32)
        acc = jnp.ones((8, VC_W))
        lin = jnp.zeros((8, VC_W))
        cols = sorted_ids // 8
        sub = sorted_ids % 8
        gw = jax.random.normal(k, (8, N), jnp.float32) * 1e-3
        ga = jax.jit(lambda g, s: make_aug_grads(g, s))(gw, sub)
        def chain(n, t, a, l, c, ga_):
            def body(_, carry):
                t_, a_, l_ = carry
                return streamed_ftrl_cols(t_, a_, l_, c, ga_, dim=1, fold=8,
                                          tile=2048)
            return jax.lax.fori_loop(0, n, body, (t, a, l))
        timeit(f"streamed_ftrl wide [8,{VC_W}]", chain, wt, acc, lin, cols, ga)

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

        def chain(n, W_, x_):
            def body(_, x2):
                g = jax.grad(mlp_loss, argnums=1)(W_, x2)
                return x2 + 1e-9 * g
            return jax.lax.fori_loop(0, n, body, x_)
        timeit("MLP 7x1024 fwd+bwd bs16000", chain, W, x)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
