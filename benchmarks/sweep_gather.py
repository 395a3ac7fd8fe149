"""Sweep (tile, chunk) for the streamed gather kernel, wide+deep shapes."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))


import itertools
import time

import jax
import jax.numpy as jnp
import numpy as np

from mindrec_tpu.ops.pallas.stream_gather import streamed_gather


def fence(x):
    leaf = jax.tree.leaves(x)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])


def run(dp, Vc, N, label):
    rng = np.random.default_rng(0)
    cols = np.sort(rng.integers(0, Vc - 8, N)).astype(np.int32)
    cols_d = jax.device_put(cols)
    table = jax.device_put(np.ones((dp, Vc), np.float32))
    for tile, chunk in itertools.product((256, 512, 1024, 2048), (128, 256, 512)):
        if Vc % tile:
            continue
        fn = jax.jit(lambda t, c, tile=tile, chunk=chunk: streamed_gather(
            t, c, tile=tile, chunk=chunk))
        try:
            out = fn(table, cols_d)
            fence(out)
        except Exception as e:
            print(f"{label} tile={tile:5d} chunk={chunk:4d}  FAIL {type(e).__name__}", flush=True)
            continue
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            out = fn(table, cols_d)
        fence(out)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{label} tile={tile:5d} chunk={chunk:4d}  {dt:7.2f} ms", flush=True)


def main():
    run(8, 733_184, 624_000, "wide")
    run(16, 5_865_472, 624_000, "deep")


if __name__ == "__main__":
    main()
