#!/bin/bash
# Criteo-1TB downloader (reference datasets/criteo_1tb/download.sh:17-38):
# fetch N days of the terabyte click-logs and gunzip them.
#
#   bash examples/download_criteo.sh <num_days 1..24> [out_dir]
#
# After downloading, preprocess with:
#   python -c "from mindrec_tpu.data.preprocess import preprocess; \
#              preprocess(['<out>/day_0', ...], '<dest>')"
set -euo pipefail

NUM_DAYS="${1:?usage: download_criteo.sh <num_days 1..24> [out_dir]}"
OUT="${2:-./criteo_1tb}"
BASE="https://storage.googleapis.com/criteo-cail-datasets"

if [ "$NUM_DAYS" -lt 1 ] || [ "$NUM_DAYS" -gt 24 ]; then
  echo "num_days must be in 1..24" >&2
  exit 1
fi

mkdir -p "$OUT"
for ((d = 0; d < NUM_DAYS; d++)); do
  f="day_${d}.gz"
  if [ -f "$OUT/day_${d}" ]; then
    echo "day_${d} already present, skipping"
    continue
  fi
  echo "downloading $f"
  curl -fL --retry 3 -o "$OUT/$f" "$BASE/$f"
  echo "unzipping $f"
  gunzip "$OUT/$f"
done
echo "done: $NUM_DAYS day(s) in $OUT"
