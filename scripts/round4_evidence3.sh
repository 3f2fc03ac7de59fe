#!/bin/bash
# Round-4 evidence, pass 3 (pass 2 was killed mid-queue when its shell
# died; wcc_dec 0.01% completed with 179s vs 124s batch = 0.69x on R-MAT).
# Remaining items, plus the transcript-chain-shaped decremental runs:
# R-MAT deltas all land in the one giant component, so component-local
# recompute cannot win there; the production input shape ((conv_id,
# turn_idx) chains -> millions of tiny components) is where the
# locality term dominates, and --graph chains measures exactly that.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/round4_evidence3.log}
run() {
  echo "=== $* ($(date -u +%H:%M:%S), $(cut -d' ' -f1-3 /proc/loadavg)) ===" >> "$LOG"
  timeout 4000 python scripts/run_at_scale.py "$@" >> "$LOG" 2>&1
  echo "=== rc=$? ===" >> "$LOG"
}

# chains-shaped decremental WCC: small (0.01%) and bulk (1%) deltas
run --algo wcc_dec --graph chains --edges 64000000 --zstd --delta-mod 10000
run --algo wcc_dec --graph chains --edges 64000000 --zstd --delta-mod 100
# support-counting decremental BFS on R-MAT: small delta, then the 1%
# bulk delta that the old closure variant could not finish in 3600s
run --algo bfs_dec --power 23 --edges 64000000 --zstd --delta-mod 10000
run --algo bfs_dec --power 23 --edges 64000000 --zstd --delta-mod 100
# 64M incremental k-truss (the 16M A/B measured 283s vs 1070s full)
run --algo ktruss --power 23 --edges 64000000 --k 10 --method incremental
# interleaved HITS dual re-read: pass 1's dual run shared the box with a
# concurrent test suite; quote the quieter of the two dual readings
run --algo hits --power 25 --edges 256000000 --hits-cache dual --max-iter 3
# 64M full-peel k-truss A/B partner (longest; last so a timeout only
# costs this row)
run --algo ktruss --power 23 --edges 64000000 --k 10 --method full

echo "ALL DONE $(date -u)" >> "$LOG"
