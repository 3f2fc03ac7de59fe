#!/bin/bash
# Round-4 evidence, pass 2: the realistic small-delta decremental shape
# (0.01% ~ daily unlinks) where the localized recompute's wall should be
# a small fraction of fresh batch, plus the 64M incremental k-truss row.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/round4_evidence2.log}
run() {
  echo "=== $* ($(date -u +%H:%M:%S), $(cut -d' ' -f1-3 /proc/loadavg)) ===" >> "$LOG"
  timeout 3600 python scripts/run_at_scale.py "$@" >> "$LOG" 2>&1
  echo "=== rc=$? ===" >> "$LOG"
}

run --algo wcc_dec --power 23 --edges 64000000 --zstd --delta-mod 10000
run --algo bfs_dec --power 23 --edges 64000000 --zstd --delta-mod 10000
run --algo ktruss --power 23 --edges 64000000 --k 10 --method incremental

echo "ALL DONE $(date -u)" >> "$LOG"
