"""Measure XLA row-gather (the un-permute) across layouts/dtypes."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))


import time

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
    print(f"{name:52s} {dt:8.2f} ms")
    return out


def main():
    N = 624_000
    rng = np.random.default_rng(0)
    idx = jax.device_put(rng.permutation(N).astype(np.int32))

    for d, dt in [(24, jnp.float32), (32, jnp.float32), (128, jnp.float32),
                  (24, jnp.bfloat16), (128, jnp.bfloat16), (256, jnp.bfloat16)]:
        x = jax.device_put(np.ones((N, d), np.float32)).astype(dt)
        g = jax.jit(lambda x, i: x[i])
        timeit(f"x[idx]  [{N},{d}] {dt.__name__}", g, x, idx)

    # take along axis-1, feature-major
    for d, dt in [(24, jnp.float32), (32, jnp.float32)]:
        x = jax.device_put(np.ones((d, N), np.float32)).astype(dt)
        g = jax.jit(lambda x, i: jnp.take(x, i, axis=1))
        timeit(f"take axis1 [{d},{N}] {dt.__name__}", g, x, idx)

    # one-hot matmul permute in chunked form: out[:, c] = x @ (iota==inv[c])
    # (no tile pruning possible; just for scale)
    # skipped: O(N^2)

    # gather fused with reshape into [B, F*D]
    B, F, D = 16000, 39, 16
    x = jax.device_put(np.ones((N, D), np.float32))
    g = jax.jit(lambda x, i: x[i].reshape(B, F * D))
    timeit(f"x[idx].reshape(B,F*D) [{N},{D}] f32", g, x, idx)


if __name__ == "__main__":
    main()
