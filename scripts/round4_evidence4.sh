#!/bin/bash
# Round-4 evidence, pass 4 — chained after pass 3 (waits for its ALL DONE
# marker so the two queues never share the box). Rows:
#  - linkpred capped-default at 16M (VERDICT #2's bench line); the run
#    prints the capped vs uncapped wedge-pair volume so the hazard is
#    documented without executing the quadratic pass at 16M
#  - linkpred uncapped-vs-capped A/B on the 2M fixture (bounded timeout:
#    a DNF there is itself the measurement)
#  - fresh N->4N scaling pair for the round (quiet box required)
#  - final quiet-window bench.py reading at sf0.1
set -u
cd "$(dirname "$0")/.."
PREV_LOG=${PREV_LOG:-/tmp/round4_evidence3.log}
LOG=${1:-/tmp/round4_evidence4.log}
while ! grep -q 'ALL DONE' "$PREV_LOG" 2>/dev/null; do sleep 60; done
run() {
  echo "=== $* ($(date -u +%H:%M:%S), $(cut -d' ' -f1-3 /proc/loadavg)) ===" >> "$LOG"
  timeout "${T:-4000}" python "$@" >> "$LOG" 2>&1
  echo "=== rc=$? ===" >> "$LOG"
}

run scripts/run_at_scale.py --algo linkpred --power 21 --edges 16000000 --cap -1 --buckets 4
run scripts/run_at_scale.py --algo linkpred --power 19 --edges 2000000 --cap -1
T=2400 run scripts/run_at_scale.py --algo linkpred --power 19 --edges 2000000 --cap 0 --buckets 4
run bench_scaling.py
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 run bench.py

echo "ALL DONE $(date -u)" >> "$LOG"
