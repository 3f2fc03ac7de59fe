#!/bin/bash
# Round-4 evidence, pass 7 — chained after pass 6. Retries the two 64M rows
# whose first attempts ENOSPC'd the disk, on the fixed code paths:
#   - k-truss incremental: hybrid heavy-drop fallback + endpoint-restricted
#     adjacency (plans/ktruss.py) — the pass-3 attempt died on round 1's
#     near-total dying-triangle materialization. Full method took 2352 s,
#     so the incremental retry gets a 5400 s slot.
#   - decremental BFS 1% bulk delta: per-round lineage truncation +
#     support-round cap (plans/bfs.py) — the pass-3 attempt cascaded to
#     ENOSPC. The 0.01% re-measure runs in pass 6; this is the bulk row.
set -u
cd "$(dirname "$0")/.."
PREV_LOG=${PREV_LOG:-/tmp/round4_evidence6.log}
LOG=${1:-/tmp/round4_evidence7.log}
while ! grep -q 'ALL DONE' "$PREV_LOG" 2>/dev/null; do sleep 60; done
run() {
  echo "=== $* ($(date -u +%H:%M:%S), $(cut -d' ' -f1-3 /proc/loadavg)) ===" >> "$LOG"
  timeout "${T:-4000}" python "$@" >> "$LOG" 2>&1
  echo "=== rc=$? ===" >> "$LOG"
}

T=5400 run scripts/run_at_scale.py --algo ktruss --power 23 --edges 64000000 --k 10 --method incremental
run scripts/run_at_scale.py --algo bfs_dec --power 23 --edges 64000000 --zstd --delta-mod 100

echo "ALL DONE $(date -u)" >> "$LOG"
