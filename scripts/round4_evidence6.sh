#!/bin/bash
# Round-4 evidence, pass 6 — chained after pass 5. Re-measures the
# bfs_dec 0.01% row with the max_support_rounds cap in place (the uncapped
# cascade DNF'd its 4000s slot: few-vertices-per-round promotion over a
# deep dependency chain, each round scanning the 64M-row tight table).
set -u
cd "$(dirname "$0")/.."
PREV_LOG=${PREV_LOG:-/tmp/round4_evidence5.log}
LOG=${1:-/tmp/round4_evidence6.log}
while ! grep -q 'ALL DONE' "$PREV_LOG" 2>/dev/null; do sleep 60; done
run() {
  echo "=== $* ($(date -u +%H:%M:%S), $(cut -d' ' -f1-3 /proc/loadavg)) ===" >> "$LOG"
  timeout "${T:-4000}" python "$@" >> "$LOG" 2>&1
  echo "=== rc=$? ===" >> "$LOG"
}

run scripts/run_at_scale.py --algo bfs_dec --power 23 --edges 64000000 --zstd --delta-mod 10000

echo "ALL DONE $(date -u)" >> "$LOG"
