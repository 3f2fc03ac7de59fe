#!/bin/bash
# Round-4 evidence, pass 5 — chained after pass 4. The primary-metric
# continuity row (converged PageRank at the 10^9-edge target scale on the
# round-4 engine) and, once every measurement is done and the box is free
# to get noisy again, the full pytest gate.
set -u
cd "$(dirname "$0")/.."
PREV_LOG=${PREV_LOG:-/tmp/round4_evidence4.log}
LOG=${1:-/tmp/round4_evidence5.log}
while ! grep -q 'ALL DONE' "$PREV_LOG" 2>/dev/null; do sleep 60; done
run() {
  echo "=== $* ($(date -u +%H:%M:%S), $(cut -d' ' -f1-3 /proc/loadavg)) ===" >> "$LOG"
  timeout "${T:-4000}" python "$@" >> "$LOG" 2>&1
  echo "=== rc=$? ===" >> "$LOG"
}

T=5400 run scripts/run_at_scale.py --algo pr --power 27 --edges 1000000000 --zstd

echo "=== pytest ($(date -u +%H:%M:%S), $(cut -d' ' -f1-3 /proc/loadavg)) ===" >> "$LOG"
timeout 3000 python -m pytest tests/ -x -q >> "$LOG" 2>&1
echo "=== pytest rc=$? ===" >> "$LOG"

echo "ALL DONE $(date -u)" >> "$LOG"
