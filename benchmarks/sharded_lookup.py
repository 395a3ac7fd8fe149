"""Sharded embedding lookup: explicit all-to-all vs GSPMD jnp.take.

Runs both paths at the headline-benchmark shape (5.86M vocab, emb 16,
bs 16000 x 39 fields -> 624k positions, ~330k unique) on the virtual
8-device CPU mesh and reports wall time plus the per-device collective
payload parsed from the compiled HLO — the evidence that the explicit
exchange moves rows (U-scale) while GSPMD is free to move the table
(Vc-scale).  Reference axis: TABLE_ROW_SLICE
(``models/wide_deep/src/wide_and_deep.py:232-249``).

Usage:  python benchmarks/sharded_lookup.py [--vocab N] [--unique U]
"""

import argparse
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mindrec_tpu.ops.a2a import SENTINEL, sharded_unique_gather


def collective_bytes(hlo: str) -> dict:
    ops = re.compile(
        r"=\s*\(?\s*(?:f32|bf16|s32|u32)?.*?(all[-_]to[-_]all|all[-_]gather|all[-_]reduce)\("
    )
    shape = re.compile(r"(f32|bf16|s32|u32)\[([\d,]*)\]")
    total = {}
    for line in hlo.splitlines():
        m = ops.search(line)
        if not m:
            continue
        lhs = line[: m.start(1)]  # shapes precede the op token
        b = 0
        for sm in shape.finditer(lhs):
            dims = [int(d) for d in sm.group(2).split(",") if d]
            b += int(np.prod(dims) if dims else 1) * (2 if sm.group(1) == "bf16" else 4)
        key = m.group(1).replace("_", "-")
        total[key] = total.get(key, 0) + b
    return total


def bench(fn, args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=5_865_472)  # 5.86M aligned
    ap.add_argument("--dp", type=int, default=16)
    ap.add_argument("--unique", type=int, default=331_776)  # ~criteo bs16000
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    vc = (args.vocab + 1023) // 1024 * 1024
    u = (args.unique + 1023) // 1024 * 1024
    table = jax.device_put(
        jnp.zeros((args.dp, vc), jnp.float32), NamedSharding(mesh, P(None, "model"))
    )
    rng = np.random.default_rng(0)
    ids = np.sort(rng.choice(vc - 64, size=u - 64, replace=False)).astype(np.int32)
    uq = np.full(u, int(SENTINEL), np.int32)
    uq[: u - 64] = ids
    uq = jnp.asarray(uq)

    with mesh:
        a2a = jax.jit(lambda t, q: sharded_unique_gather(t, q, mesh, data_axis=None))
        gspmd = jax.jit(
            lambda t, q: jnp.where(
                q[None, :] < SENTINEL, jnp.take(t, jnp.clip(q, 0, vc - 1), axis=1), 0.0
            )
        )
        for name, fn in (("a2a", a2a), ("gspmd", gspmd)):
            hlo = fn.lower(table, uq).compile().as_text()
            coll = collective_bytes(hlo)
            ms = bench(fn, (table, uq), n=args.steps)
            table_mb = args.dp * vc * 4 / 1e6
            print(
                f"{name:6s} {ms:8.2f} ms/lookup   collectives: "
                + (", ".join(f"{k}={v/1e6:.1f}MB" for k, v in coll.items()) or "none")
                + f"   (table={table_mb:.0f}MB, unique rows={args.dp*u*4/1e6:.1f}MB)",
                flush=True,
            )


if __name__ == "__main__":
    main()
