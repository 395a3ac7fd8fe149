"""Isolate the per-grid-step cost of the streamed adam kernel."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))


import time

import jax
import jax.numpy as jnp
import numpy as np

from mindrec_tpu.ops.pallas import stream_update as su
from mindrec_tpu.ops.pallas.stream_update import flat_schedule


def fence(x):
    leaf = jax.tree.leaves(x)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])


def run(dp, Vc, N, tile, chunk, label):
    rng = np.random.default_rng(0)
    cols = np.sort(rng.integers(0, Vc - 8, N)).astype(np.int32)
    cols_d = jax.device_put(cols)
    table = jax.device_put(np.ones((dp, Vc), np.float32))
    m = jax.device_put(np.zeros((dp, Vc), np.float32))
    v = jax.device_put(np.zeros((dp, Vc), np.float32))
    g_aug = jax.device_put(np.ones((dp + 8, N), np.float32))
    # report true step count
    _, _, _, S = flat_schedule(cols_d, Vc, tile, chunk, replay_pads=False)
    tile_of, chunkblk, flags, _ = flat_schedule(cols_d, Vc, tile, chunk, replay_pads=False)
    real = int(np.sum((np.asarray(flags) & 4) != 0))

    fn = jax.jit(lambda t, m, v, c, g: su.streamed_adam_cols(
        t, m, v, c, g, jnp.float32(3.5e-4), dim=dp, fold=1,
        loss_scale=1024.0, tile=tile, chunk=chunk))
    out = fn(table, m, v, cols_d, g_aug)
    fence(out)
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        out = fn(table, m, v, cols_d, g_aug)
    fence(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:34s} S={S:6d} real={real:6d}  {dt:7.2f} ms  ({dt*1e3/max(real,1):6.2f} us/real-step)", flush=True)


def main():
    su.FACTORIZED = True
    run(16, 5_865_472, 624_000, 2048, 256, "full aliased")
    su.NO_ALIAS = True
    run(16, 5_865_472, 624_000, 2048, 256, "full NO alias")
    run(16, 5_865_472, 1024, 2048, 256, "tiny N NO alias")
    run(16, 733_184, 624_000, 2048, 256, "small Vc NO alias")


if __name__ == "__main__":
    main()
