#!/bin/bash
# Round-4 at-scale evidence queue (VERDICT r3 items #3, #4, #5).
# Sequential on purpose: concurrent Spark jobs on this box distort each
# other's throughput readings (BASELINE.md variance protocol).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/round4_evidence.log}
run() {
  echo "=== $* ($(date -u +%H:%M:%S), $(cut -d' ' -f1-3 /proc/loadavg)) ===" >> "$LOG"
  timeout 3600 python scripts/run_at_scale.py "$@" >> "$LOG" 2>&1
  echo "=== rc=$? ===" >> "$LOG"
}

# item 3: decremental IncEval at scale (1% delta vs fresh batch)
run --algo wcc_dec --power 23 --edges 64000000 --zstd
run --algo bfs_dec --power 23 --edges 64000000 --zstd

# item 5: k-truss support-maintenance vs re-enumerating peel (A/B at 16M
# first — round-count reconnaissance; 64M incremental after)
run --algo ktruss --power 21 --edges 16000000 --k 10 --method incremental
run --algo ktruss --power 21 --edges 16000000 --k 10 --method full

# item 4: HITS at 256M, dual vs single edge cache (3 sweeps, as bench's hits3)
run --algo hits --power 25 --edges 256000000 --hits-cache dual --max-iter 3
run --algo hits --power 25 --edges 256000000 --hits-cache single --max-iter 3

echo "ALL DONE $(date -u)" >> "$LOG"
