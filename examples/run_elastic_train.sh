#!/bin/bash
# Elastic recovery wrapper: failure detection = trainer process exit;
# recovery = restart from the latest checkpoint (--resume).  SURVEY §5
# notes the reference has no elastic story (restart-from-checkpoint is
# manual); this makes it automatic with bounded retries.
#
# Usage: bash examples/run_elastic_train.sh [MAX_RESTARTS] [train args...]
set -u
HERE="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
MAX_RESTARTS=${1:-3}
shift 1 2>/dev/null || true

attempt=0
while true; do
  python "$HERE/train_criteo.py" --ckpt_interval "${MR_CKPT_INTERVAL:-100}" \
    --resume "$@" && break
  rc=$?
  attempt=$((attempt + 1))
  if [ "$attempt" -gt "$MAX_RESTARTS" ]; then
    echo "elastic: giving up after $MAX_RESTARTS restarts (rc=$rc)" >&2
    exit "$rc"
  fi
  echo "elastic: trainer exited rc=$rc; restart $attempt/$MAX_RESTARTS from latest checkpoint" >&2
done
