"""Probe: per-key host->device upload cost of wire-encoded vs raw
batches, plus decode dispatch — explains the e2e wire number.

Run on the real chip: `python benchmarks/wire_probe.py`.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from mindrec_tpu.data.criteo import SyntheticCriteo
from mindrec_tpu.data.wire import BatchWire, measure_bandwidth


def _fence(a):
    """Fetch a scalar that depends on `a` (block_until_ready is a
    no-op through the tunnel)."""
    float(jnp.asarray(a).reshape(-1)[0].astype(jnp.float32))


def time_put(name, arr, reps=4):
    a = jax.device_put(arr)  # warm
    _fence(a)
    t0 = time.perf_counter()
    for _ in range(reps):
        a = jax.device_put(arr)
    _fence(a)
    dt = (time.perf_counter() - t0) / reps
    mb = arr.nbytes / 1e6
    print(f"{name:28s} {mb:7.2f} MB  {dt*1e3:8.2f} ms  "
          f"{mb/1e3/max(dt,1e-9):7.2f} GB/s", flush=True)
    return dt


def main():
    bs, F, vocab = 16000, 39, 5_860_000
    data = SyntheticCriteo(bs, F, vocab, steps=1, seed=0, fields="criteo")
    b = data.get_batch(0)
    w = BatchWire.for_sparse(vocab, bs, F)
    enc = w.encode(b)

    print("bandwidth probe:", f"{measure_bandwidth()/1e6:.1f} MB/s", flush=True)

    print("-- raw keys --")
    for k, v in b.items():
        time_put(f"raw {k} {v.dtype}", np.asarray(v))
    print("-- encoded keys --")
    for k, v in enc.items():
        time_put(f"enc {k} {v.dtype}", np.asarray(v))

    # whole-batch staged put + decode dispatch
    dec = w.decoder(donate=True)
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        staged = {k: jax.device_put(v) for k, v in enc.items()}
        out = dec(staged)
    float(jnp.sum(out["wts"]))
    print(f"enc put+decode   {(time.perf_counter()-t0)/reps*1e3:8.2f} ms/batch",
          flush=True)

    t0 = time.perf_counter()
    for _ in range(reps):
        staged = {k: jax.device_put(v) for k, v in b.items()}
    float(jnp.sum(staged["wts"]))
    print(f"raw put          {(time.perf_counter()-t0)/reps*1e3:8.2f} ms/batch",
          flush=True)


if __name__ == "__main__":
    main()
