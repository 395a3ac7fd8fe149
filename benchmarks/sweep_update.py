"""Sweep (tile, chunk, combine-mode) for the streamed adam kernel."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))


import itertools
import time

import jax
import jax.numpy as jnp
import numpy as np

from mindrec_tpu.ops.pallas import stream_update as su


def fence(x):
    leaf = jax.tree.leaves(x)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])


def main():
    dp, Vc = 16, 5_865_472
    N = 624_000
    rng = np.random.default_rng(0)
    cols = np.sort(rng.integers(0, Vc - 8, N)).astype(np.int32)
    cols_d = jax.device_put(cols)
    table = jax.device_put(np.ones((dp, Vc), np.float32))
    m = jax.device_put(np.zeros((dp, Vc), np.float32))
    v = jax.device_put(np.zeros((dp, Vc), np.float32))
    g_aug = jax.device_put(np.ones((dp + 8, N), np.float32))

    for fact, tile, chunk in itertools.product(
        (True, False), (512, 1024, 2048), (128, 256, 512)
    ):
        if Vc % tile:
            continue
        su.FACTORIZED = fact
        fn = jax.jit(lambda t, m, v, c, g, tile=tile, chunk=chunk: su.streamed_adam_cols(
            t, m, v, c, g, jnp.float32(3.5e-4), dim=dp, fold=1,
            loss_scale=1024.0, tile=tile, chunk=chunk))
        try:
            out = fn(table, m, v, cols_d, g_aug)
            fence(out)
        except Exception as e:
            print(f"fact={fact} tile={tile:5d} chunk={chunk:4d}  FAIL {type(e).__name__}")
            continue
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            out = fn(table, m, v, cols_d, g_aug)
        fence(out)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"fact={fact} tile={tile:5d} chunk={chunk:4d}  {dt:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
