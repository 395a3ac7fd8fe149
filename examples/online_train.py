"""Online (streaming) training — reference
``examples/online_learning/online_train.py`` parity, TPU-native.

Pipeline (reference §3.2 call stack, in-process by default):

    producer thread -> sharded Channel -> StreamingDataset
        -> RecModel.online_train (unbounded) -> minute-level checkpoints

With ``--kafka`` the producer is replaced by a Kafka consumer
(reference ``read_kafka.py`` + ``consumer.py`` feature engineering).
Checkpoints are written every ``--ckpt-interval`` steps keeping
``--ckpt-keep`` (reference: every 100 steps keep 5,
``online_train.py:81-82``).

Usage:
  python examples/online_train.py --steps 30            # synthetic stream
  python examples/online_train.py --kafka --topic criteo --stats stats.pkl
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def synthetic_stream(batch_size, field_size, vocab, steps, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(steps):
        yield {
            "ids": rng.integers(0, vocab, (batch_size, field_size)).astype(np.int32),
            "wts": rng.uniform(0.5, 1.5, (batch_size, field_size)).astype(np.float32),
            "label": rng.integers(0, 2, (batch_size, 1)).astype(np.float32),
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=1000)
    ap.add_argument("--field-size", type=int, default=39)
    ap.add_argument("--vocab", type=int, default=200_000)
    ap.add_argument("--emb-dim", type=int, default=16)
    ap.add_argument("--steps", type=int, default=30, help="synthetic stream length")
    ap.add_argument("--shards", type=int, default=1, help="channel shards (device count)")
    ap.add_argument("--shard-id", type=int, default=0)
    ap.add_argument("--ckpt-dir", default="./online_ckpt")
    ap.add_argument("--ckpt-interval", type=int, default=100)
    ap.add_argument("--ckpt-keep", type=int, default=5)
    ap.add_argument("--sink", action="store_true", help="dataset sink mode")
    ap.add_argument("--kafka", action="store_true")
    ap.add_argument("--topic", default="criteo")
    ap.add_argument("--bootstrap", default="localhost:9092")
    ap.add_argument("--stats", default="", help="CriteoStats pickle for --kafka")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from mindrec_tpu import RecModel
    from mindrec_tpu.data.streaming import (
        Channel,
        DataReceiver,
        StreamingDataset,
        feed_channel_from_iterator,
    )
    from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.callbacks import (
        CheckpointCallback,
        LossCallback,
        TimeMonitor,
    )

    channel = Channel(num_shards=args.shards)
    if args.kafka:
        import pickle

        from mindrec_tpu.data.streaming import CriteoFeatureEngineer, KafkaSource

        stats = pickle.loads(Path(args.stats).read_bytes())
        fe = CriteoFeatureEngineer(stats)
        src = (fe(batch) for batch in KafkaSource(
            args.topic, range(args.shards), args.bootstrap,
            count=args.batch_size,
        ))
    else:
        src = synthetic_stream(
            args.batch_size, args.field_size, args.vocab, args.steps
        )
    feed_channel_from_iterator(src, channel)

    cfg = WideDeepConfig(
        batch_size=args.batch_size, field_size=args.field_size,
        vocab_size=args.vocab, emb_dim=args.emb_dim,
        deep_layer_dim=(1024, 512, 256, 128), sparse=True,
    )
    model = WideDeepModel(cfg)
    rm = RecModel(
        model,
        optim.ftrl(loss_scale=cfg.loss_scale),
        optim.lazy_adam(loss_scale=cfg.loss_scale),
    )

    ds = StreamingDataset(DataReceiver(channel, args.shard_id))
    t0 = time.perf_counter()
    rm.online_train(
        ds,
        callbacks=[
            LossCallback("online_loss.log", per_print_times=10),
            TimeMonitor(),
            CheckpointCallback(
                args.ckpt_dir, save_steps=args.ckpt_interval,
                keep_max=args.ckpt_keep,
            ),
        ],
        dataset_sink_mode=args.sink,
    )
    print(f"online stream drained in {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
