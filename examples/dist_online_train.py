"""DISTRIBUTED online (streaming) training — reference
``examples/online_learning/dist_online_train.py:63-97`` parity: one
trainer process per rank, channel receiver sharded by rank, per-rank
checkpoints, data-parallel gradients across the process group.

TPU-native topology: every rank joins ``jax.distributed`` through the
MR_* env bootstrap (the reference's mpirun / dynamic-networking launch
translates 1:1 — ``mpirun_dist_online_train.sh:22-24``,
``run_dist_online_train.sh:17-45``); the stream arrives through a
:class:`FileChannel` spool with ``num_shards == world`` (rank r tails
shard r), each rank's batch becomes that rank's slice of a GLOBAL batch
over the process-spanning mesh, and XLA all-reduces the gradients.

Launch (2 ranks, one host):
  for i in 0 1; do
    MR_SCHED_HOST=127.0.0.1 MR_SCHED_PORT=12411 MR_WORKER_NUM=2 \
    MR_WORKER_ID=$i python examples/dist_online_train.py \
        --spool /tmp/spool --steps 0 &
  done
(a producer fills the spool: see examples/online_train.py or
tests/test_dist_online.py)
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spool", required=True, help="FileChannel directory")
    ap.add_argument("--batch-size", type=int, default=1000,
                    help="PER-RANK batch size")
    ap.add_argument("--field-size", type=int, default=39)
    ap.add_argument("--vocab", type=int, default=200_000)
    ap.add_argument("--emb-dim", type=int, default=16)
    ap.add_argument("--deep-layers", type=int, nargs="*", default=[1024, 512, 256, 128])
    ap.add_argument("--ckpt-dir", default="./online_ckpt")
    ap.add_argument("--ckpt-interval", type=int, default=100)
    ap.add_argument("--ckpt-keep", type=int, default=5)
    ap.add_argument("--recv-timeout", type=float, default=60.0)
    ap.add_argument("--final-params", default="",
                    help="npz path for the final replicated params (tests)")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from mindrec_tpu import RecModel
    from mindrec_tpu.data.streaming import FileChannel
    from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
    from mindrec_tpu.parallel.dist import initialize_from_env
    from mindrec_tpu.parallel.mesh import batch_sharding, make_mesh, shard_train_state
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.callbacks import (
        CheckpointCallback,
        LossCallback,
        TimeMonitor,
    )
    from mindrec_tpu.train.step import flatten_params

    topo = initialize_from_env()
    world, rank = topo["process_count"], topo["process_index"]
    print(f"dist_online rank {rank}/{world}: {topo}", flush=True)

    cfg = WideDeepConfig(
        batch_size=args.batch_size * world, field_size=args.field_size,
        vocab_size=args.vocab, emb_dim=args.emb_dim,
        deep_layer_dim=tuple(args.deep_layers), sparse=True,
    )
    mesh = make_mesh(model=1)
    model = WideDeepModel(cfg, mesh=mesh)
    rm = RecModel(
        model,
        optim.ftrl(loss_scale=cfg.loss_scale),
        optim.lazy_adam(loss_scale=cfg.loss_scale),
        donate=False,
    )
    rm.state = shard_train_state(rm.state, model, mesh)

    # rank-sharded receiver (reference dist_online_train.py:63-97:
    # DataReceiver shard = rank); each local batch becomes this rank's
    # slice of the global DP batch
    channel = FileChannel(args.spool, num_shards=world)
    recv = channel.receiver(rank)
    bs = batch_sharding(mesh)

    class _GlobalStream:
        def __iter__(self):
            while True:
                try:
                    local = recv.recv(timeout=args.recv_timeout)
                except StopIteration:
                    return
                global_shape = {
                    k: (v.shape[0] * world,) + v.shape[1:]
                    for k, v in local.items()
                }
                yield {
                    k: jax.make_array_from_process_local_data(
                        bs, v, global_shape[k]
                    )
                    for k, v in local.items()
                }

    stream = _GlobalStream()

    t0 = time.perf_counter()
    with mesh:
        rm.online_train(
            stream,
            callbacks=[
                LossCallback(f"online_loss_rank{rank}.log", per_print_times=10),
                TimeMonitor(),
                CheckpointCallback(
                    f"{args.ckpt_dir}/rank_{rank}",
                    save_steps=args.ckpt_interval, keep_max=args.ckpt_keep,
                ),
            ],
            dataset_sink_mode=False,
        )
    print(f"rank {rank}: stream drained in {time.perf_counter() - t0:.1f}s",
          flush=True)

    if args.final_params and rank == 0:
        flat, _ = flatten_params(rm.state.params)
        np.savez(args.final_params, **{
            k: np.asarray(jax.device_get(v.addressable_data(0)))
            for k, v in flat
        })
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("dist_online_done")


if __name__ == "__main__":
    main()
