"""Outbrain multitable W&D throughput on one chip — the reference
flagship config (batch 131,072; tables 650k x128, 17.3k x64, 20.9k x64
shared by 6 multi-hot fields, 16 x64 indicator; 5x1024 MLP —
``models/wide_and_deep_multitable/src/wide_and_deep.py:154-198``) on
the multi-group STREAMED (pallas row-layout) path vs the generic
gather/scatter path.

Usage:  python benchmarks/bench_multitable.py [--batch-size 131072]
        [--steps 10] [--staged 2] [--generic]
Prints one JSON line with samples/s.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synth_batch(cfg, seed):
    from mindrec_tpu.models.multitable import MULTI_FIELDS

    rng = np.random.default_rng(seed)
    B = cfg.batch_size
    b = {
        "continue_val": rng.uniform(size=(B, cfg.continue_field_size)).astype(np.float32),
        "indicator_id": rng.integers(0, cfg.indicator_size, (B, cfg.indicator_field_size)).astype(np.int32),
        "emb_128_id": rng.integers(0, cfg.emb_128_size, (B, cfg.emb128_field_size)).astype(np.int32),
        "emb_64_single_id": rng.integers(0, cfg.emb64_single_size, (B, cfg.emb64_single_field_size)).astype(np.int32),
        "label": (rng.uniform(size=(B, 1)) > 0.8).astype(np.float32),
    }
    for name, L in zip(MULTI_FIELDS, cfg.multi_hot_sizes):
        b[f"multi_{name}_id"] = rng.integers(0, cfg.emb64_multi_size, (B, L)).astype(np.int32)
        lens = rng.integers(1, L + 1, B)
        b[f"multi_{name}_mask"] = (
            np.arange(L)[None, :] < lens[:, None]
        ).astype(np.float32)
    return b


def run(batch_size=131072, steps=10, warmup=3, staged=2, generic=False,
        verbose=True):
    """Stage `staged` synthetic Outbrain batches, time `steps` steps.
    Returns (samples_per_sec, ms_per_step)."""
    import jax

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
    )

    cfg = MultiTableConfig(batch_size=batch_size, sparse=True)
    model = MultiTableWideDeepModel(cfg)
    opt_w = optim.ftrl(learning_rate=cfg.ftrl_lr, l1=5e-4, l2=5e-4,
                       initial_accum=0.1, loss_scale=cfg.loss_scale)
    opt_d = optim.lazy_adam(learning_rate=cfg.adam_lr, eps=1e-6,
                            loss_scale=cfg.loss_scale)
    use_pallas = None if not generic else False
    step = make_train_step(model, opt_w, opt_d, jit=True, donate=True,
                           use_pallas=use_pallas, row_layout=True)
    state = init_train_state(model, jax.random.PRNGKey(0), opt_w, opt_d)

    host = [synth_batch(cfg, s) for s in range(staged)]
    if not generic:
        from mindrec_tpu.models.multitable import MULTI_FIELDS
        from mindrec_tpu.train.step import prep_groups

        groups = prep_groups(model)  # tiny groups (indicator) skip sort
        # masked-position compaction budget for the multi group: max
        # kept positions across the staged batches + headroom, rounded
        kept = max(
            int(sum(b[f"multi_{n}_mask"].sum() for n in MULTI_FIELDS))
            for b in host
        )
        budget = (int(kept * 1.05) + 511) // 512 * 512
        prep = make_batch_sort(0, groups=groups, minimal=True,
                               kept_budget={"multi": budget})
        host = [prep(b) for b in host]
        # trim each group's unique buffer to a shared bucket so all
        # staged batches hit one compiled trace (shape-driven ub)
        for g in groups:
            nu = max(int(b[f"{g}:uidx_sorted"][-1]) + 1 for b in host)
            bucket = round_bucket(int(nu * 1.2))
            for b in host:
                if b[f"{g}:uq_ids"].shape[0] > bucket:
                    b[f"{g}:uq_ids"] = b[f"{g}:uq_ids"][:bucket]
    if verbose:
        print("staging...", flush=True)
    batches = [{k: jax.device_put(v) for k, v in b.items()} for b in host]
    key0 = next(iter(batches[-1]))
    float(np.asarray(batches[-1][key0]).reshape(-1)[0])  # fence
    if verbose:
        print("compiling...", flush=True)
    t0 = time.perf_counter()
    for i in range(warmup):
        state, losses = step(state, batches[i % len(batches)])
    float(losses[1])
    if verbose:
        print(f"warmup done in {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(steps):
        state, losses = step(state, batches[i % len(batches)])
    float(losses[1])
    dt = time.perf_counter() - t0
    return steps * batch_size / dt, dt / steps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=131072)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--staged", type=int, default=2)
    ap.add_argument("--generic", action="store_true",
                    help="generic gather/scatter path instead of streamed")
    args = ap.parse_args()
    sps, ms = run(args.batch_size, args.steps, args.warmup, args.staged,
                  args.generic)
    print(json.dumps({
        "metric": "multitable_outbrain_train_samples_per_sec_1chip",
        "value": round(sps, 1), "unit": "samples/s",
        "path": "generic" if args.generic else "streamed",
        "ms_per_step": round(ms, 2),
        "batch_size": args.batch_size,
    }))


if __name__ == "__main__":
    main()
