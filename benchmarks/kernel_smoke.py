"""Compile + run + time the streamed kernels standalone on the TPU."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mindrec_tpu.ops.pallas.stream_update import (
    streamed_adam_rows,
    streamed_ftrl_rows,
)


def run(name, fn, chain_args, n=10):
    out = fn(*chain_args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    args = chain_args
    for _ in range(n):
        out = fn(*args)
        args = (out[0], out[1], out[2]) + chain_args[3:]
    _ = np.asarray(out[0][0, :1])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)


def main():
    V, D, N = 5_861_376, 16, 16000 * 39  # V multiple of 2048
    rng = np.random.default_rng(0)
    ids = jnp.asarray(np.sort(rng.integers(0, V - 1000, size=N)).astype(np.int32))
    grads = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    table = jnp.zeros((V, D), jnp.float32)
    m = jnp.zeros_like(table)
    v = jnp.zeros_like(table)

    adam = jax.jit(
        lambda t, m_, v_, i, g: streamed_adam_rows(t, m_, v_, i, g, 1e-3)
    )
    print("compiling adam...", flush=True)
    run("streamed_adam [5.86M,16] 624k ids", adam, (table, m, v, ids, grads))

    wideV = V
    wtable = jnp.zeros((wideV, 1), jnp.float32)
    acc = jnp.ones_like(wtable)
    lin = jnp.zeros_like(wtable)
    wgrads = jnp.asarray(rng.normal(size=(N, 1)).astype(np.float32))
    ftrl = jax.jit(
        lambda t, a, l, i, g: streamed_ftrl_rows(t, a, l, i, g)
    )
    print("compiling ftrl...", flush=True)
    run("streamed_ftrl [5.86M,1] 624k ids", ftrl, (wtable, acc, lin, ids, wgrads))


if __name__ == "__main__":
    main()
