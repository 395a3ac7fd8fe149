#!/bin/bash
# TB-scale single-worker training (reference parity:
# models/wide_deep/scripts/run_parameter_server_standalone_train_terabyte_scale_model.sh:35-42
# — vocab 900M x emb 240, 4.6M-row device cache, 10 GB server RAM cap
# with SSD spill).  MR_EMBEDDING_REMOTE_CACHE_MEMORY_SIZE mirrors the
# reference's MS_EMBEDDING_REMOTE_CACHE_MEMORY_SIZE knob.
#
#   bash examples/run_terabyte_train.sh                   # quick demo shape
#   FULL=1 bash examples/run_terabyte_train.sh            # the 864 GB point
set -e
RAM_GB=${MR_EMBEDDING_REMOTE_CACHE_MEMORY_SIZE:-10}
mkdir -p terabyte_train
if [ "${FULL:-0}" = "1" ]; then
  python examples/train_terabyte.py \
    --vocab 900000000 --emb-dim 240 --cache-rows 4600000 \
    --ram-gb "$RAM_GB" "$@" 2>&1 | tee terabyte_train/train.log
else
  python examples/train_terabyte.py --ram-gb "$RAM_GB" "$@" \
    2>&1 | tee terabyte_train/train.log
fi
