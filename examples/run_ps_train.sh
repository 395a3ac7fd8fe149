#!/bin/bash
# Three-role launch: 1 scheduler + S table servers + W workers, all on
# this host (reference parity:
# models/wide_deep/scripts/run_parameter_server_distribute_train.sh:39-75
# spawns MS_SCHED + MS_PSERVER*N + MS_WORKER*N the same way).
#
# Usage: bash examples/run_ps_train.sh [SERVER_NUM] [WORKER_NUM] [extra train args...]
set -e
export MR_SERVER_NUM=${1:-1}
export MR_WORKER_NUM=${2:-1}
shift 2 2>/dev/null || true
export MR_SCHED_HOST=${MR_SCHED_HOST:-127.0.0.1}
export MR_SCHED_PORT=${MR_SCHED_PORT:-11272}
export MR_SERVER_PORT_BASE=${MR_SERVER_PORT_BASE:-18900}
# server-side RAM cap (GB) before SSD spill — reference terabyte knob
# MS_EMBEDDING_REMOTE_CACHE_MEMORY_SIZE
export MR_EMBEDDING_REMOTE_CACHE_MEMORY_SIZE=${MR_EMBEDDING_REMOTE_CACHE_MEMORY_SIZE:-10}

rm -rf ps_logs && mkdir -p ps_logs

for ((i = 0; i < MR_SERVER_NUM; i++)); do
  MR_ROLE=MR_PSERVER MR_SERVER_PORT=$((MR_SERVER_PORT_BASE + i)) \
    python -c "from mindrec_tpu.parallel.ps import run_role; run_role()" \
    >ps_logs/server_$i.log 2>&1 &
  echo "server $i pid $! port $((MR_SERVER_PORT_BASE + i))"
done

# workers reach the servers through MR_SERVER_HOSTS; pick the regime via
# train_criteo flags: --vocab_cache_size N (HBM cache + remote tiers) or
# --parameter_server 1 (host-target, optimizer server-side) or
# --dynamic_embedding 1 (server-sharded hash vocab)
hosts=""
for ((i = 0; i < MR_SERVER_NUM; i++)); do
  hosts+="${hosts:+,}${MR_SCHED_HOST}:$((MR_SERVER_PORT_BASE + i))"
done
export MR_SERVER_HOSTS=$hosts

for ((i = 0; i < MR_WORKER_NUM; i++)); do
  MR_ROLE=MR_WORKER MR_WORKER_ID=$i \
    python examples/train_criteo.py "$@" \
    >ps_logs/worker_$i.log 2>&1 &
  echo "worker $i pid $!"
done
wait
