#!/bin/bash
# Multi-process data-parallel launch (reference parity:
# models/wide_deep/scripts/run_distribute_train_for_gpu.sh — mpirun over
# N ranks — and the dynamic-networking MS_* variant; on TPU both
# collapse to one process per host joining jax.distributed through the
# MR_* env bootstrap, mindrec_tpu/parallel/dist.py).
#
# Single host, N simulated processes:
#   bash examples/run_distribute_train.sh 4 --vocab_size 200000 ...
# Multi host: run on every host with MR_WORKER_ID=<rank> and
#   MR_SCHED_HOST pointing at host 0.
set -e
WORKERS=${1:-2}
shift 1 2>/dev/null || true
export MR_SCHED_HOST=${MR_SCHED_HOST:-127.0.0.1}
export MR_SCHED_PORT=${MR_SCHED_PORT:-11273}
export MR_WORKER_NUM=$WORKERS

rm -rf dp_logs && mkdir -p dp_logs
for ((i = 0; i < WORKERS; i++)); do
  MR_WORKER_ID=$i python examples/train_criteo.py "$@" \
    >dp_logs/worker_$i.log 2>&1 &
  echo "worker $i pid $!"
done
wait
