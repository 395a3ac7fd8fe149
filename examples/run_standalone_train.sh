#!/bin/bash
# Single-device Wide&Deep train+eval (reference parity:
# models/wide_deep/scripts/run_standalone_train_for_gpu.sh and
# run_standalone_train_for_ascend.sh — one process, one device, logs to
# a work dir).  All train_criteo.py flags pass through, e.g.:
#
#   bash examples/run_standalone_train.sh --epochs 2 --data_path data/criteo
#
# Defaults mirror the reference accuracy recipe
# (models/wide_deep/default_config.yaml:14-44).
set -e
mkdir -p standalone_train
python examples/train_criteo.py --model wide_deep "$@" \
  2>&1 | tee standalone_train/train.log
