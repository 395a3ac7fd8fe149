"""Systematic host->device transfer probe: dtype/shape/size effects
through the axon tunnel.  Informs the wire's arena layout."""

import time

import numpy as np

import jax
import jax.numpy as jnp


def _fence(a):
    float(jnp.asarray(a).reshape(-1)[0].astype(jnp.float32))


def t_put(arr, reps=3):
    a = jax.device_put(arr)
    _fence(a)
    t0 = time.perf_counter()
    for _ in range(reps):
        a = jax.device_put(arr)
    _fence(a)
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    nb = 16000 * 13 * 4 * 5  # ~4.2 MB payload, divisible by 16000
    cases = {
        "u8 1d": rng.integers(0, 256, nb, np.uint8),
        "u8 [N,128]": rng.integers(0, 256, nb, np.uint8).reshape(-1, 128),
        "u8 [16000,x]": rng.integers(0, 256, nb, np.uint8).reshape(16000, -1),
        "u8 [16000,x,3]": rng.integers(0, 256, nb - (nb % (16000 * 3)),
                                       np.uint8).reshape(16000, -1, 3),
        "u16 1d": rng.integers(0, 1 << 16, nb // 2, np.uint16),
        "i32 1d rand": rng.integers(0, 1 << 31, nb // 4, np.int32),
        "i32 1d small": rng.integers(0, 5_860_000, nb // 4, np.int32),
        "f32 1d": rng.random(nb // 4, np.float32),
        "f32 zeros": np.zeros(nb // 4, np.float32),
        "bf16 1d": rng.random(nb // 2, np.float32).astype(jnp.bfloat16),
        "i32 [16000,x]": rng.integers(0, 5_860_000, nb // 4, np.int64)
        .astype(np.int32).reshape(16000, -1),
    }
    # small-array fixed cost
    small = {
        "f32 64KB": rng.random(16000, np.float32),
        "u8 16KB": rng.integers(0, 2, 16000, np.uint8),
    }
    for rnd in range(2):
        print(f"--- round {rnd} ---", flush=True)
        for name, arr in {**cases, **small}.items():
            dt = t_put(arr)
            mb = arr.nbytes / 1e6
            print(f"{name:16s} {mb:6.2f} MB {dt*1e3:8.2f} ms "
                  f"{mb/1e3/dt:6.3f} GB/s", flush=True)


if __name__ == "__main__":
    main()
