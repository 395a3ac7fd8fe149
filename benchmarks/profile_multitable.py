"""Per-op trace of the multitable streamed step (cached shapes).

Stages 2 batches like bench_multitable, runs warmup to hit the compile
cache, then wraps 3 steps in jax.profiler.start_trace.  Prints the top
device ops by total duration from the perfetto trace.json.gz via
profile_dcn.top_ops (no tensorboard dependency).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mt_trace"
    import jax

    import bench_multitable as bm
    from mindrec_tpu.data.pipeline import round_bucket
    from mindrec_tpu.models.multitable import (
        MultiTableConfig,
        MultiTableWideDeepModel,
    )
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.step import (
        init_train_state,
        make_batch_sort,
        make_train_step,
        prep_groups,
    )

    cfg = MultiTableConfig(batch_size=131072, sparse=True)
    model = MultiTableWideDeepModel(cfg)
    opt_w = optim.ftrl(learning_rate=cfg.ftrl_lr, l1=5e-4, l2=5e-4,
                       initial_accum=0.1, loss_scale=cfg.loss_scale)
    opt_d = optim.lazy_adam(learning_rate=cfg.adam_lr, eps=1e-6,
                            loss_scale=cfg.loss_scale)
    step = make_train_step(model, opt_w, opt_d, jit=True, donate=True)
    state = init_train_state(model, jax.random.PRNGKey(0), opt_w, opt_d)
    host = [bm.synth_batch(cfg, s) for s in range(2)]
    groups = prep_groups(model)
    prep = make_batch_sort(0, groups=groups, minimal=True)
    host = [prep(b) for b in host]
    for g in groups:
        nu = max(int(b[f"{g}:uidx_sorted"][-1]) + 1 for b in host)
        bucket = round_bucket(int(nu * 1.2))
        for b in host:
            if b[f"{g}:uq_ids"].shape[0] > bucket:
                b[f"{g}:uq_ids"] = b[f"{g}:uq_ids"][:bucket]
    print("staging...", flush=True)
    batches = [{k: jax.device_put(v) for k, v in b.items()} for b in host]
    float(__import__("numpy").asarray(batches[-1]["label"]).reshape(-1)[0])
    print("warmup...", flush=True)
    for i in range(3):
        state, losses = step(state, batches[i % 2])
    float(losses[1])
    print("tracing 3 steps...", flush=True)
    jax.profiler.start_trace(out_dir)
    for i in range(3):
        state, losses = step(state, batches[i % 2])
    float(losses[1])
    jax.profiler.stop_trace()
    print("trace written to", out_dir, flush=True)
    from profile_dcn import top_ops

    top_ops(out_dir)


if __name__ == "__main__":
    main()
