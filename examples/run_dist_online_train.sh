#!/bin/bash
# Distributed online training launch (reference parity:
# examples/online_learning/run_dist_online_train.sh:17-45 — one trainer
# per rank, channel receiver sharded by rank).  A producer fills the
# FileChannel spool; each rank tails its shard and trains DP.
#
# Usage: bash examples/run_dist_online_train.sh [RANKS] [SPOOL_DIR] [args...]
set -e
RANKS=${1:-2}
SPOOL=${2:-/tmp/mindrec_spool}
shift 2 2>/dev/null || true
export MR_SCHED_HOST=${MR_SCHED_HOST:-127.0.0.1}
export MR_SCHED_PORT=${MR_SCHED_PORT:-11274}
export MR_WORKER_NUM=$RANKS

rm -rf online_logs && mkdir -p online_logs
for ((i = 0; i < RANKS; i++)); do
  MR_WORKER_ID=$i python examples/dist_online_train.py \
    --spool "$SPOOL" --ckpt-dir online_ckpt "$@" \
    >online_logs/rank_$i.log 2>&1 &
  echo "rank $i pid $!"
done
wait
