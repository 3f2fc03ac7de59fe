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
# the 1% bulk-delta rerun on the support-counting algorithm (the closure
# variant timed out at 3600s on this exact input in pass 1)
run --algo bfs_dec --power 23 --edges 64000000 --zstd --delta-mod 100
run --algo ktruss --power 23 --edges 64000000 --k 10 --method incremental
# interleaved HITS dual re-read: pass 1's dual run shared the box with a
# concurrent test suite; quote the quieter of the two dual readings
run --algo hits --power 25 --edges 256000000 --hits-cache dual --max-iter 3

echo "ALL DONE $(date -u)" >> "$LOG"
