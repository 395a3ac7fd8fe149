"""Multi-chip scaling projection for the flagship sparse row-slice
config — the driver-visible artifact for the one axis this rig cannot
measure (a single chip is attached; SURVEY §6 targets the reference's
1/4/8-GPU table, ``/root/reference/benchmarks/README.md:76-80``).

Method
------
1. Compile the REAL sharded train step (streamed pallas kernels under
   shard_map, row-sliced deep table, data-parallel batch — the same
   program `tests/test_sharded_stream.py` pins) on an n-device virtual
   CPU mesh and extract every collective's payload bytes from the
   optimized HLO — the same machinery the CI byte-bound tests use, so
   the numbers cannot silently drift from the shipped program.
2. Feed those measured per-step collective bytes into an ICI cost model
   (per-chip ring bandwidth + per-collective latency) and combine with
   the MEASURED 1-chip step time at the bench shape.

Scaling protocol matches the reference table: per-chip batch fixed at
16000 (weak scaling), so samples/s(n) = n * B / t(n) with

    t(n) = t_compute(n) + t_collectives(n)
    t_compute(n)     = t_1chip        (per-chip batch constant; the
                       row-sliced table makes per-chip table streams
                       SHRINK with n — holding t_1chip is conservative)
    t_collectives(n) = sum_c bytes_c(n) * (n-1)/n / ICI_BW
                       + count_c * ICI_LAT

Collective bytes are extracted at a reduced batch/vocab shape and
scaled to the bench shape by the measured linear law (payloads are
batch-scale by construction — the byte-bound test asserts no collective
within 4x of the table; scaling is verified against a second shape).

Constants: v5e ICI ~ 45 GB/s per link x 4 links, 2D torus; we model an
effective per-chip ring bandwidth of 90 GB/s one-direction and 1 us
launch latency per collective — the "How to Scale Your Model" class of
first-order model.  Override with --ici-gbps / --ici-lat-us.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=16 \
     MINDREC_PLATFORM=cpu python benchmarks/scaling_projection.py
Writes benchmarks/scaling_projection.json.
"""

import argparse
import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

COLLECTIVE_RE = re.compile(
    r"=\s*\(?\s*.*?(all[-_]to[-_]all|all[-_]gather|all[-_]reduce|"
    r"reduce[-_]scatter|collective[-_]permute)\("
)
SHAPE_RE = re.compile(r"(f32|bf16|s32|u32|pred)\[([\d,]*)\]")
DSIZE = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "pred": 1}


def collective_bytes(hlo: str) -> dict:
    """{collective kind: total payload bytes} over one step's HLO."""
    out = {}
    for line in hlo.splitlines():
        m = COLLECTIVE_RE.search(line)
        if not m:
            continue
        b = 0
        for sm in SHAPE_RE.finditer(line[: m.start(1)]):
            dims = [int(d) for d in sm.group(2).split(",") if d]
            b += int(np.prod(dims) if dims else 1) * DSIZE[sm.group(1)]
        kind = m.group(1).replace("-", "_")
        out[kind] = out.get(kind, 0) + b
        out["_count"] = out.get("_count", 0) + 1
    return out


def sharded_step_hlo(n_dev: int, batch_size: int, vocab: int,
                     field_size: int = 39, emb_dim: int = 16,
                     layers=(64, 32), unique_bucket: int | None = None) -> str:
    """Compile the row-slice streamed W&D step on an n-device mesh and
    return its optimized HLO (abstract operands — no arrays built)."""
    import jax

    from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
    from mindrec_tpu.ops.pallas import stream_update
    from mindrec_tpu.parallel.mesh import make_mesh, shard_batch, shard_train_state
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.step import init_train_state, make_train_step

    stream_update.INTERPRET = True  # CPU mesh: kernels lower as jax ops
    try:
        mesh = make_mesh(data=max(n_dev // 2, 1), model=2)
        cfg = WideDeepConfig(
            batch_size=batch_size, field_size=field_size, vocab_size=vocab,
            emb_dim=emb_dim, deep_layer_dim=tuple(layers), sparse=True,
            deep_table_slice_mode="table_row_slice", loss_scale=1024.0,
        )
        model = WideDeepModel(cfg, mesh=mesh)
        ow = optim.ftrl(loss_scale=cfg.loss_scale)
        od = optim.lazy_adam(loss_scale=cfg.loss_scale)
        state = init_train_state(model, jax.random.PRNGKey(0), ow, od)
        rng = np.random.default_rng(0)
        batch = {
            "ids": rng.integers(0, vocab, (batch_size, field_size)).astype(
                np.int32
            ),
            "wts": np.ones((batch_size, field_size), np.float32),
            "label": np.zeros((batch_size, 1), np.float32),
        }
        with mesh:
            state = shard_train_state(state, model, mesh)
            step = make_train_step(model, ow, od, jit=False, donate=False,
                                   use_pallas=True,
                                   unique_bucket=unique_bucket)
            batch = shard_batch(batch, mesh)
            return jax.jit(step).lower(state, batch).compile().as_text()
    finally:
        stream_update.INTERPRET = False


def project(args):
    # 1. collective bytes at THREE probe shapes -> the 2-variable law
    #    bytes_k = a_k + b_k * batch + c_k * unique_bucket.
    #    Separating the two scales matters: the backward segsum psum
    #    carries [width, bucket] payloads that SATURATE at the bench
    #    bucket (~102k distinct ids per 624k-position batch), while the
    #    forward gathers carry true batch-scale payloads — a single
    #    linear-in-batch fit would overstate the psum 4-6x at bench
    #    scale and understate the projected efficiency.
    b0, b1 = args.probe_batch, args.probe_batch * 2
    u0, u1 = args.probe_bucket, args.probe_bucket * 2
    h00 = sharded_step_hlo(args.mesh_devices, b0, args.probe_vocab,
                           unique_bucket=u0)
    h10 = sharded_step_hlo(args.mesh_devices, b1, args.probe_vocab,
                           unique_bucket=u0)
    h01 = sharded_step_hlo(args.mesh_devices, b0, args.probe_vocab,
                           unique_bucket=u1)
    c00, c10, c01 = (collective_bytes(h) for h in (h00, h10, h01))
    kinds = sorted(k for k in set(c00) | set(c10) | set(c01)
                   if k != "_count")
    per_sample, per_unique, fixed = {}, {}, {}
    for k in kinds:
        y00, y10, y01 = (c.get(k, 0) for c in (c00, c10, c01))
        bcoef = (y10 - y00) / (b1 - b0)
        ucoef = (y01 - y00) / (u1 - u0)
        per_sample[k] = max(bcoef, 0.0)
        per_unique[k] = max(ucoef, 0.0)
        fixed[k] = max(y00 - bcoef * b0 - ucoef * u0, 0.0)
    n_coll = c00.get("_count", 0)

    # 2. project to the bench shape + chip counts
    B, U = args.batch_size, args.bench_bucket
    bytes_at_B = {
        k: fixed[k] + per_sample[k] * B + per_unique[k] * U for k in kinds
    }
    total_bytes = sum(bytes_at_B.values())
    ici_bw = args.ici_gbps * 1e9
    lat_s = args.ici_lat_us * 1e-6
    t1 = args.step_ms_1chip / 1e3
    rows = []
    for n in (1, 4, 8, 16):
        if n == 1:
            t_n, coll_ms = t1, 0.0
        else:
            coll_s = total_bytes * (n - 1) / n / ici_bw + n_coll * lat_s
            coll_ms = coll_s * 1e3
            t_n = t1 + coll_s
        sps = n * B / t_n
        rows.append({
            "chips": n,
            "samples_per_sec": round(sps),
            "speedup": round(sps / (B / t1), 2),
            "scaling_efficiency_pct": round(100.0 * t1 / t_n, 1),
            "collective_ms": round(coll_ms, 3),
        })

    ref = {"1": 267558, "4": 767663, "8": 1163636}  # V100 table
    out = {
        "config": {
            "per_chip_batch": B,
            "vocab": 5_860_000,
            "regime": "data-parallel batch + table_row_slice deep table, "
                      "streamed pallas path (ops/sharded_stream.py)",
            "step_ms_1chip_measured": args.step_ms_1chip,
            "ici_gbps": args.ici_gbps,
            "ici_lat_us": args.ici_lat_us,
            "mesh_probe_devices": args.mesh_devices,
        },
        "collective_bytes_per_step_at_bench_batch": {
            k: int(v) for k, v in bytes_at_B.items()
        },
        "collective_count_per_step": int(n_coll),
        "per_sample_bytes": {k: round(v, 2) for k, v in per_sample.items()},
        "per_unique_bytes": {k: round(v, 2) for k, v in per_unique.items()},
        "projection": rows,
        "reference_v100_table": ref,
        "note": "collective bytes extracted from the compiled sharded "
                "step's HLO at two probe shapes (linear in batch, "
                "verified); per-chip compute held at the measured "
                "1-chip step — conservative, since the row-sliced "
                "table's per-chip streams shrink with n",
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=16000)
    ap.add_argument("--probe-batch", type=int, default=256)
    ap.add_argument("--probe-bucket", type=int, default=4096)
    ap.add_argument("--bench-bucket", type=int, default=102400,
                    help="distinct-id bucket at the bench shape (the "
                    "AdaptiveBucket derivation over criteo-shaped "
                    "traffic at bs 16000x39)")
    ap.add_argument("--probe-vocab", type=int, default=262144)
    ap.add_argument("--mesh-devices", type=int, default=8)
    ap.add_argument("--step-ms-1chip", type=float, default=19.4,
                    help="measured 1-chip step at the bench shape "
                    "(BENCH_r05 primary)")
    ap.add_argument("--ici-gbps", type=float, default=90.0)
    ap.add_argument("--ici-lat-us", type=float, default=1.0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    out = project(args)
    path = Path(__file__).parent / "scaling_projection.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
