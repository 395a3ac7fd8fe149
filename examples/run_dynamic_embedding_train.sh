#!/bin/bash
# Dynamic (hash) embedding training launch (reference parity:
# models/wide_deep/scripts/run_dynamic_embed_standalone_train_for_gpu.sh:24-30).
# With MR_SERVER_HOSTS set, the id->slot map runs server-side and is
# shared by every worker (RemoteHashStore).
#
# Usage: bash examples/run_dynamic_embedding_train.sh [args...]
set -e
python examples/train_criteo.py --dynamic_embedding 1 "$@"
