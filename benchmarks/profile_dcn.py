"""Per-op trace of the DCN bench step (reference recipe: bs 16000,
vocab 200k, emb 27, 2x1024 deep + 6 cross layers).

Replicates bench.py's bench_dcn exactly (same shapes -> compile-cache
hit), wraps 3 steps in jax.profiler.start_trace, and prints the top
device ops aggregated from the perfetto trace.json.gz the profiler
writes (no tensorboard dependency).
"""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def top_ops(out_dir, n=18):
    files = sorted(glob.glob(f"{out_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        print("no trace.json.gz found under", out_dir)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    # device-side ops live on TPU/xla-op track rows; host threads carry
    # python/runtime noise — keep events from process names with a chip
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
            agg[e["name"]] += e["dur"] / 1e3  # us -> ms
    total = sum(agg.values())
    print(f"\ndevice op total over trace window: {total:.1f} ms "
          f"(3 steps -> /3 for ms/step)")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:n]:
        print(f"{ms / 3:8.2f} ms/step  {name[:90]}")


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dcn_trace"
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mindrec_tpu.data.criteo import SyntheticCriteo
    from mindrec_tpu.models.dcn import DCNConfig, DCNModel
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.step import init_train_state, make_batch_sort, make_train_step

    cfg = DCNConfig(
        batch_size=16000, field_size=39, vocab_size=200_000,
        emb_dim=27, deep_layer_dim=(1024, 1024), cross_layer_num=6,
        use_mixed_precision=True, sparse=True, loss_scale=1024.0,
    )
    model = DCNModel(cfg)
    opt = lambda: optim.adam(
        learning_rate=cfg.learning_rate, loss_scale=cfg.loss_scale,
        state_dtype=jnp.bfloat16,
    )
    data = SyntheticCriteo(cfg.batch_size, 39, cfg.vocab_size, steps=8,
                           seed=0, fields="criteo")
    state = init_train_state(model, jax.random.PRNGKey(0), opt(), opt())
    step = make_train_step(model, opt(), opt(), jit=True, donate=True)
    prep = make_batch_sort(39, minimal=True)
    host = [prep(data.get_batch(s)) for s in range(8)]
    for b in host:
        b["uq_ids"] = b["uq_ids"][:131_072]
    batches = [{k: jax.device_put(v) for k, v in b.items()} for b in host]
    float(np.asarray(batches[-1]["perm"]).reshape(-1)[0])
    print("warmup...", flush=True)
    for i in range(6):
        state, losses = step(state, batches[i % 8])
    float(losses[1])
    t0 = time.perf_counter()
    for i in range(10):
        state, losses = step(state, batches[i % 8])
    float(losses[1])
    print(f"step: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms", flush=True)
    jax.profiler.start_trace(out_dir)
    for i in range(3):
        state, losses = step(state, batches[i % 8])
    float(losses[1])
    jax.profiler.stop_trace()
    top_ops(out_dir)


if __name__ == "__main__":
    main()
