"""Per-op trace of the round-5 W&D bench step (row_packed layout).

Replicates bench.py's primary exactly (same shapes -> compile-cache
hit), wraps 3 steps in jax.profiler.start_trace, and prints the top
device ops aggregated from the perfetto trace the profiler writes.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
    and os.environ.get("MINDREC_BENCH_REEXEC") != "1"
):
    os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "1"
    os.environ["MINDREC_BENCH_REEXEC"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)


def top_ops(out_dir, n=24, steps=3):
    files = sorted(glob.glob(f"{out_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        print("no trace.json.gz found under", out_dir)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    pids = {
        p["pid"]
        for p in trace.get("traceEvents", [])
        if p.get("ph") == "M" and p.get("name") == "process_name"
        and any(s in str(p.get("args", {}).get("name", ""))
                for s in ("TPU", "Device", "/device:"))
    }
    agg = defaultdict(float)
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("pid") in pids and "dur" in e:
            agg[e["name"]] += e["dur"] / 1e3
    total = sum(agg.values())
    print(f"\ndevice op total over trace window: {total:.1f} ms "
          f"({steps} steps -> /{steps} for ms/step)")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:n]:
        print(f"{ms / steps:8.2f} ms/step  {name[:90]}")


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wd_r5_trace"
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mindrec_tpu.data.criteo import SyntheticCriteo
    from mindrec_tpu.data.pipeline import AdaptiveBucket
    from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.step import (
        init_train_state,
        make_batch_sort,
        make_train_step,
    )

    cfg = WideDeepConfig(
        batch_size=16000, field_size=39, vocab_size=5_860_000, emb_dim=16,
        deep_layer_dim=(1024,) * 7, use_mixed_precision=True, sparse=True,
        loss_scale=1024.0,
    )
    model = WideDeepModel(cfg)
    print("deep", model.deep_spec.storage_shape, "rp",
          model.deep_spec.row_packed, "| wide", model.wide_spec.storage_shape,
          "pack", model.wide_spec.pack, flush=True)
    opt_w = optim.ftrl(loss_scale=cfg.loss_scale)
    opt_d = optim.lazy_adam(loss_scale=cfg.loss_scale,
                            state_dtype=jnp.bfloat16)
    data = SyntheticCriteo(cfg.batch_size, cfg.field_size, cfg.vocab_size,
                           steps=8, seed=0, fields="criteo")
    bucket = AdaptiveBucket.from_sample(
        [data.get_batch(s) for s in range(8)], log=lambda *a, **k: None
    ).bucket
    print("bucket", bucket, flush=True)
    state = init_train_state(model, jax.random.PRNGKey(0), opt_w, opt_d)
    step = make_train_step(model, opt_w, opt_d, jit=True, donate=True)
    prep = make_batch_sort(cfg.field_size, minimal=True)
    host = [prep(data.get_batch(s)) for s in range(8)]
    for b in host:
        b["uq_ids"] = b["uq_ids"][:bucket]
    batches = [{k: jax.device_put(v) for k, v in b.items()} for b in host]
    float(np.asarray(batches[-1]["perm"]).reshape(-1)[0])
    print("warmup...", flush=True)
    for i in range(8):
        state, losses = step(state, batches[i % 8])
    float(losses[1])
    t0 = time.perf_counter()
    for i in range(20):
        state, losses = step(state, batches[i % 8])
    float(losses[1])
    print(f"step: {(time.perf_counter() - t0) / 20 * 1e3:.2f} ms", flush=True)
    jax.profiler.start_trace(out_dir)
    for i in range(3):
        state, losses = step(state, batches[i % 8])
    float(losses[1])
    jax.profiler.stop_trace()
    top_ops(out_dir)


if __name__ == "__main__":
    main()
