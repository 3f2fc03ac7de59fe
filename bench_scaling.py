#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: throughput scaling efficiency
>= 0.8 from N to 4N executors).

No real cluster exists in-sandbox, so the same PageRank job runs at two
parallelism levels — local[8] and local[32] (N and 4N cores), one fresh JVM
per level — on the SAME deterministic R-MAT edge table. Reported per level:
edges/sec per iteration; efficiency = (throughput_4N / throughput_N) / 4.

Usage:  python bench_scaling.py            # runs both levels, prints JSON
        python bench_scaling.py --inner 8  # one level (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RMAT_POWER = int(os.environ.get("SPARK_GRAFT_RMAT_POWER", "20"))
RMAT_EDGES = int(os.environ.get("SPARK_GRAFT_RMAT_EDGES", "8000000"))
LEVELS = (8, 32)


def run_level(cores: int) -> None:
    from minigraph_spark.fixtures import make_rmat_edges
    from minigraph_spark.plans.pagerank import run_pagerank
    from minigraph_spark.session import get_spark

    spark = get_spark(
        f"minigraph_spark_scaling_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    rmat = make_rmat_edges(spark, RMAT_POWER, RMAT_EDGES, seed=42)
    n_edges = rmat.persist().count()
    # warm-up: JIT/codegen and the engine's one-time edge prepartition cost
    run_pagerank(rmat, tol=0.0, max_iter=2)
    t0 = time.time()
    res = run_pagerank(rmat, tol=0.0, max_iter=10)  # fixed iterations
    sec = time.time() - t0
    iters = max(res.iterations, 1)
    print(
        "LEVEL_RESULT "
        + json.dumps(
            {
                "cores": cores,
                "edges": n_edges,
                "iterations": iters,
                "sec": round(sec, 3),
                "edges_per_sec_per_iter": round(n_edges * iters / sec, 1),
            }
        )
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--inner":
        run_level(int(sys.argv[2]))
        return
    results = {}
    for cores in LEVELS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner", str(cores)],
            capture_output=True, text=True, check=True,
        )
        for line in out.stdout.splitlines():
            if line.startswith("LEVEL_RESULT "):
                r = json.loads(line[len("LEVEL_RESULT "):])
                results[r["cores"]] = r
    lo, hi = LEVELS
    tput_lo = results[lo]["edges_per_sec_per_iter"]
    tput_hi = results[hi]["edges_per_sec_per_iter"]
    eff = (tput_hi / tput_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": f"PageRank scaling efficiency local[{lo}] -> local[{hi}]",
                "value": round(eff, 3),
                "unit": "efficiency",
                "levels": results,
                "rmat_edges": RMAT_EDGES,
            }
        )
    )


if __name__ == "__main__":
    main()
