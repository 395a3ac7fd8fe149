"""Definitive experiments for the backward order-crossing (VERDICT r2
items 2+4): can ANY formulation beat XLA's row gather for
``g_delta[perm]`` ([624k, 128] bf16, random permutation)?

Hypotheses tested on the real chip:
  H1 row-rate bound: gather time is ~constant in row WIDTH (8..256
     lanes) => the unit is bound by random row accesses, not bytes.
  H2 footprint effect: gathering from a small (52 MB) source is far
     faster than from a 160 MB source at equal row count.
  H3 DMA-issue rate: a Pallas kernel replacing the gather with
     per-row async copies is bound by descriptor issue rate — measure
     rows/s to price any "manual gather" kernel.
  H4 pairing: gathering half the rows at double width (the only shape
     packing that preserves per-position random access) — if H1 holds
     this wins ~2x IF positions could pair, which they cannot for an
     arbitrary permutation; measured for the record.

Conclusions land in benchmarks/PROFILE_r03.md.
"""

import sys as _sys
import time
from functools import partial
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    print(f"{name:58s} {dt:8.3f} ms", flush=True)
    return dt


# -- H3: per-row DMA gather kernel ------------------------------------------


def dma_gather(x, idx, tile: int = 2048):
    """Gather x[idx] via one async copy per row (HBM -> VMEM output
    block).  Exists to MEASURE the DMA-descriptor issue rate; per the
    profile analysis it cannot beat the hardware gather unit."""
    n = idx.shape[0]
    d = x.shape[1]

    def kernel(idx_ref, x_hbm, o_ref, sem):
        def body(i, _):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(idx_ref[i], 1), :],
                o_ref.at[pl.ds(i, 1), :],
                sem,
            )
            cp.start()
            cp.wait()  # serialized issue+wait: prices one-at-a-time DMA
            return 0

        jax.lax.fori_loop(0, tile, body, 0)

    grid = n // tile
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((tile,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0)),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
    )(idx, x)


def main():
    N = 624_000
    rng = np.random.default_rng(0)
    perm = jax.device_put(rng.permutation(N).astype(np.int32))

    g = jax.jit(lambda x, i: x[i])

    print("== H1: row-rate vs byte-rate (source 624k rows) ==", flush=True)
    rates = {}
    for d, dt in [(8, jnp.bfloat16), (16, jnp.bfloat16), (24, jnp.bfloat16),
                  (64, jnp.bfloat16), (128, jnp.bfloat16),
                  (256, jnp.bfloat16), (128, jnp.float32)]:
        x = jnp.ones((N, d), dt)
        ms = timeit(f"x[perm]  [{N},{d}] {dt.__name__}", g, x, perm)
        rates[(d, dt.__name__)] = ms

    print("== H2: source-footprint effect (gather 624k rows) ==", flush=True)
    for rows, tag in [(102_400, "52MB-f32 source"), (624_000, "320MB-f32 source")]:
        src = jnp.ones((rows, 128), jnp.float32)
        idx = jax.device_put(
            rng.integers(0, rows, size=N).astype(np.int32)
        )
        timeit(f"x[idx] [{rows}x128 f32] ({tag})", g, src, idx)

    print("== H5: dtype crossings (cast fused into gather) ==", flush=True)
    x32 = jnp.ones((N, 128), jnp.float32)
    x16 = jnp.ones((N, 128), jnp.bfloat16)
    g16 = jax.jit(lambda x, i: x[i].astype(jnp.bfloat16))
    g32 = jax.jit(lambda x, i: x[i].astype(jnp.float32))
    timeit("f32 src -> bf16 out (candidate)", g16, x32, perm)
    timeit("bf16 src -> f32 out", g32, x16, perm)

    print("== H4: half rows, double width ==", flush=True)
    x2 = jnp.ones((N // 2, 256), jnp.bfloat16)
    perm2 = jax.device_put(rng.permutation(N // 2).astype(np.int32))
    timeit(f"x[perm] [{N//2},256] bf16", g, x2, perm2)

    print("== H3: per-row DMA kernel (Pallas) ==", flush=True)
    # price the issue rate at a reduced N first (it may be very slow)
    for n_small in (65_536, 624_000 if "--full-dma" in _sys.argv else 65_536):
        xs = jnp.ones((n_small, 128), jnp.bfloat16)
        ps = jax.device_put(rng.permutation(n_small).astype(np.int32))
        f = jax.jit(partial(dma_gather, tile=2048))
        try:
            ms = timeit(f"dma_gather [{n_small},128] bf16", f, xs, ps, n=5)
            print(f"  -> issue rate ~{n_small/ms/1e3:.0f} rows/ms", flush=True)
        except Exception as e:  # pragma: no cover
            print(f"  dma_gather failed: {type(e).__name__}: {e}", flush=True)
        if n_small == 624_000:
            break


if __name__ == "__main__":
    main()
