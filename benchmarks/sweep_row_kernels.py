"""Sweep (tile, chunk) for the row-major streamed gather and the
streamed adam/ftrl updates at the CURRENT benchmark shapes (unique
bucket ~102k for W&D, ~131k DeepFM)."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import itertools
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
import numpy as np

from mindrec_tpu.ops.pallas import stream_update as su
from mindrec_tpu.ops.pallas.stream_gather import streamed_gather_rows


def fence(x):
    leaf = jax.tree.leaves(x)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])


def timeit(fn, *args, n=15):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / n * 1e3


def uq_cols(Vc, U, real):
    rng = np.random.default_rng(0)
    cols = np.full(U, 2**31 - 2, np.int32)
    cols[:real] = np.sort(rng.choice(Vc - 8, real, replace=False)).astype(np.int32)
    return jax.device_put(cols)


def sweep_gather(dp, Vc, U, real, label):
    table = jax.device_put(np.random.default_rng(0).normal(
        size=(dp, Vc)).astype(np.float32) * 0.01)
    cols = uq_cols(Vc, U, real)
    base = jnp.zeros((U, 128), jnp.float32)
    for tile, chunk in itertools.product((2048, 4096, 8192, 16384), (256, 512, 1024)):
        if Vc % tile or U % chunk:
            continue
        try:
            ms = timeit(
                jax.jit(lambda t, c, b, _tl=tile, _ck=chunk: streamed_gather_rows(
                    t, c, b, lane_offset=0, tile=_tl, chunk=_ck)),
                table, cols, base,
            )
            print(f"gather {label:18s} tile={tile:5d} chunk={chunk:4d}  {ms:7.2f} ms", flush=True)
        except Exception as e:
            print(f"gather {label:18s} tile={tile:5d} chunk={chunk:4d}  FAIL {str(e)[:60]}", flush=True)


def sweep_adam(dp, Vc, U, real, dim, label):
    table = jax.device_put(np.ones((dp, Vc), np.float32))
    m = jnp.zeros((dp, Vc), jnp.bfloat16)
    v = jnp.zeros((dp, Vc), jnp.bfloat16)
    cols = uq_cols(Vc, U, real)
    g = jax.device_put(np.ones((dp + 8, U), np.float32))
    for tile, chunk in itertools.product((2048, 4096, 8192, 16384), (256, 512, 1024)):
        if Vc % tile or U % chunk:
            continue
        def f(t, mm, vv, c, gg, _tl=tile, _ck=chunk):
            return su.streamed_adam_cols(
                t, mm, vv, c, gg, 3.5e-4, dim=dim, fold=1,
                tile=_tl, chunk=_ck, loss_scale=1024.0)
        try:
            ms = timeit(jax.jit(f), table, m, v, cols, g)
            print(f"adam   {label:18s} tile={tile:5d} chunk={chunk:4d}  {ms:7.2f} ms", flush=True)
        except Exception as e:
            print(f"adam   {label:18s} tile={tile:5d} chunk={chunk:4d}  FAIL {str(e)[:60]}", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "wd"):
        sweep_gather(16, 5_865_472, 102_400, 84_000, "wd-deep[16,5.9M]")
        sweep_adam(16, 5_865_472, 102_400, 84_000, 16, "wd-deep[16,5.9M]")
    if which in ("all", "dfm"):
        sweep_gather(80, 188_416, 131_072, 56_000, "dfm-v[80,188k]")
        sweep_adam(80, 188_416, 131_072, 56_000, 80, "dfm-v[80,188k]")


if __name__ == "__main__":
    main()
