"""Floor test: pure tile-streaming pallas kernels (read+write aliased).

How fast can we pump [dp, Vc] arrays HBM->VMEM->HBM tile by tile?
Variants: 1 array, 3 arrays, 3-packed-as-one [3*dp, Vc].
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))


import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def fence(x):
    leaf = jax.tree.leaves(x)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])


def timeit(name, fn, *args, n=10, bytes_moved=0):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    bw = bytes_moved / (dt * 1e-3) / 1e9 if bytes_moved else 0.0
    print(f"{name:44s} {dt:7.2f} ms  {bw:6.0f} GB/s", flush=True)


def make_stream1(dp, Vc, tile):
    def kernel(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] * 2.0

    spec = pl.BlockSpec((dp, tile), lambda i: (0, i))
    return pl.pallas_call(
        kernel,
        grid=(Vc // tile,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((dp, Vc), jnp.float32),
        input_output_aliases={0: 0},
    )


def make_stream3(dp, Vc, tile):
    def kernel(a_ref, b_ref, c_ref, ao, bo, co):
        ao[:, :] = a_ref[:, :] * 2.0
        bo[:, :] = b_ref[:, :] * 2.0
        co[:, :] = c_ref[:, :] * 2.0

    spec = pl.BlockSpec((dp, tile), lambda i: (0, i))
    return pl.pallas_call(
        kernel,
        grid=(Vc // tile,),
        in_specs=[spec] * 3,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((dp, Vc), jnp.float32)] * 3,
        input_output_aliases={0: 0, 1: 1, 2: 2},
    )


def main():
    dp, Vc = 16, 5_865_472
    nbytes = dp * Vc * 4

    for tile in (2048, 4096, 8192, 16384):
        f = jax.jit(make_stream1(dp, Vc, tile))
        x = jax.device_put(np.ones((dp, Vc), np.float32))
        timeit(f"stream1 [16,Vc] tile={tile}", f, x, bytes_moved=2 * nbytes)

    for tile in (2048, 4096, 8192):
        f = jax.jit(make_stream3(dp, Vc, tile))
        x = jax.device_put(np.ones((dp, Vc), np.float32))
        y = jax.device_put(np.ones((dp, Vc), np.float32))
        z = jax.device_put(np.ones((dp, Vc), np.float32))
        timeit(f"stream3 3x[16,Vc] tile={tile}", f, x, y, z, bytes_moved=6 * nbytes)

    for tile in (2048, 4096, 8192):
        f = jax.jit(make_stream1(3 * dp, Vc, tile))
        x = jax.device_put(np.ones((3 * dp, Vc), np.float32))
        timeit(f"packed [48,Vc] tile={tile}", f, x, bytes_moved=6 * nbytes)


if __name__ == "__main__":
    main()
