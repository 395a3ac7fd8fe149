"""Measure online-learning model freshness end to end.

The reference's headline online-learning claim is a "minute-level"
model update: sample arrives -> incremental train -> checkpoint the
serving side can reload (``RELEASE.md:19``,
``docs/online_learning/online_learning.md:17``).  The reference never
MEASURES it; this harness does, for this framework:

    freshness(batch b) = mtime(first checkpoint whose step covers b)
                         - send_time(b)

i.e. the wall time from a batch entering the channel to its update
being durable on disk.  Reported: worst / median over the stream, plus
the serving-reload time (restore_checkpoint) — the full
sample->servable-model latency is freshness + reload.

Usage:
  python benchmarks/online_freshness.py --platform cpu          # quick
  python benchmarks/online_freshness.py --steps 200 --ckpt-interval 100
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def measure(
    batch_size=256,
    field_size=39,
    vocab=50_000,
    emb_dim=8,
    steps=40,
    ckpt_interval=10,
    ckpt_dir="./freshness_ckpt",
    async_ckpt=True,
    produce_hz=0.0,
    deep_layer_dim=(64, 32),
    evict_every=0,
) -> dict:
    from mindrec_tpu import RecModel
    from mindrec_tpu.data.streaming import (
        Channel,
        DataReceiver,
        StreamingDataset,
        feed_channel_from_iterator,
    )
    from mindrec_tpu.io.checkpoint import restore_checkpoint
    from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.callbacks import CheckpointCallback

    send_times: list[float] = []

    def stream():
        rng = np.random.default_rng(0)
        for s in range(steps):
            if evict_every:
                # drifting raw-id window: early ids go idle -> evicted
                base = 10**12 + (s // evict_every) * (vocab // 2)
                ids = base + rng.integers(0, vocab // 2, (batch_size, field_size))
            else:
                ids = rng.integers(0, vocab, (batch_size, field_size)).astype(np.int32)
            b = {
                "ids": ids,
                "wts": np.ones((batch_size, field_size), np.float32),
                "label": rng.integers(0, 2, (batch_size, 1)).astype(np.float32),
            }
            send_times.append(time.time())
            yield b
            if produce_hz:
                time.sleep(1.0 / produce_hz)

    channel = Channel(num_shards=1)
    feed_channel_from_iterator(stream(), channel)

    cfg = WideDeepConfig(
        batch_size=batch_size, field_size=field_size, vocab_size=vocab,
        emb_dim=emb_dim, deep_layer_dim=tuple(deep_layer_dim), sparse=True,
    )
    rm = RecModel(
        WideDeepModel(cfg),
        optim.ftrl(loss_scale=cfg.loss_scale),
        optim.lazy_adam(loss_scale=cfg.loss_scale),
    )
    ck = CheckpointCallback(
        ckpt_dir, save_steps=ckpt_interval, keep_max=0, async_save=async_ckpt
    )
    cbs = [ck]
    ds = StreamingDataset(DataReceiver(channel, 0))
    adapter = None
    if evict_every:
        # eviction ON (the reference's known-risk path): dynamic-hash
        # admission + periodic evict + incremental export, concurrent
        # with the freshness measurement
        from mindrec_tpu.train.callbacks import EvictionCallback
        from mindrec_tpu.train.dynamic import DynamicEmbeddingAdapter

        adapter = DynamicEmbeddingAdapter(
            capacity=vocab, permit_filter_value=1,
            evict_filter_value=2 * evict_every,
        )
        ev = EvictionCallback(
            adapter, rm.model.table_specs, every_steps=evict_every,
            export_path=Path(ckpt_dir) / "incremental.npz",
        )
        cbs.append(ev)
        ds = (adapter.transform_batch(b) for b in ds)
    rm.online_train(ds, callbacks=cbs, dataset_sink_mode=False)

    # freshness per batch: the first checkpoint covering batch b is the
    # save at step ceil((b+1)/K)*K (1-indexed steps, every K steps)
    saved = {}  # step -> mtime
    for p in ck.saved:
        st = int(Path(p).name.split("-")[1])
        saved[st] = os.stat(p).st_mtime
    fresh = []
    for b, t_send in enumerate(send_times):
        cover = ((b + 1 + ckpt_interval - 1) // ckpt_interval) * ckpt_interval
        if cover in saved:
            fresh.append(saved[cover] - t_send)
    assert fresh, "no batch was covered by any checkpoint"

    t0 = time.perf_counter()
    state = restore_checkpoint(ck.saved[-1], rm.state)
    del state
    reload_s = time.perf_counter() - t0

    return {
        "batches": len(send_times),
        "covered": len(fresh),
        "ckpt_interval": ckpt_interval,
        "async_ckpt": async_ckpt,
        "freshness_worst_s": round(max(fresh), 3),
        "freshness_median_s": round(float(np.median(fresh)), 3),
        "serving_reload_s": round(reload_s, 3),
        **(
            {
                "evict_every": evict_every,
                "evicted_total": cbs[-1].evicted_total,
                "incremental_exports": cbs[-1].exports,
            }
            if evict_every else {}
        ),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--vocab", type=int, default=50_000)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--ckpt-interval", type=int, default=10)
    ap.add_argument("--ckpt-dir", default="./freshness_ckpt")
    ap.add_argument("--produce-hz", type=float, default=0.0,
                    help="throttle the producer (0 = as fast as possible)")
    ap.add_argument("--sync", action="store_true", help="blocking saves")
    ap.add_argument("--evict-every", type=int, default=0,
                    help="dynamic-hash mode: evict + incremental-export "
                    "every N steps (0 = fixed-table mode)")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    out = measure(
        batch_size=args.batch_size, vocab=args.vocab, steps=args.steps,
        ckpt_interval=args.ckpt_interval, ckpt_dir=args.ckpt_dir,
        async_ckpt=not args.sync, produce_hz=args.produce_hz,
        evict_every=args.evict_every,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
