#!/bin/bash
# Round-4 evidence, pass 8 — re-queue of the pass-5/6/7 rows that were lost
# to a sandbox restart before their logs could be read back (/tmp fixture
# cache and logs wiped; the code fixes those passes were written to verify
# are committed). Order puts the primary-metric row first because the box
# is measured QUIET at queue time (load ~1) — the first such window in four
# rounds:
#   1. 10^9-edge converged PageRank (the literal BASELINE.json metric) on
#      the round-4 engine (leak fixes + salt-off default).
#   2. k-truss 64M incremental retry on the hybrid heavy-drop fallback
#      (pass-3 attempt ENOSPC'd; full method measured 2352 s).
#   3. decremental BFS 0.01% and 1% deltas at 64M with the
#      max_support_rounds cap + per-round lineage truncation (pass-3
#      attempts: 3064 s cascade / ENOSPC).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/round4_evidence8.log}
run() {
  echo "=== $* ($(date -u +%H:%M:%S), $(cut -d' ' -f1-3 /proc/loadavg), df=$(df --output=avail -BG / | tail -1)) ===" >> "$LOG"
  timeout "${T:-4000}" python "$@" >> "$LOG" 2>&1
  echo "=== rc=$? ===" >> "$LOG"
}

T=7200 run scripts/run_at_scale.py --algo pr --power 27 --edges 1000000000 --zstd
T=5400 run scripts/run_at_scale.py --algo ktruss --power 23 --edges 64000000 --k 10 --method incremental
run scripts/run_at_scale.py --algo bfs_dec --power 23 --edges 64000000 --zstd --delta-mod 10000
run scripts/run_at_scale.py --algo bfs_dec --power 23 --edges 64000000 --zstd --delta-mod 100

echo "ALL DONE $(date -u)" >> "$LOG"
