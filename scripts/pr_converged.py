"""PageRank run TO 1e-6 CONVERGENCE at scale — the literal BASELINE.json
primary metric ("edges/sec per iteration, PageRank to 1e-6 convergence ...
at 10^9-edge scale"); prior big-graph readings used fixed iteration counts.
Reports rounds-to-tol, per-iteration walls, and median throughput.

Usage: PR_POWER=27 PR_EDGES=1000000000 PR_SHUFFLE=128 python scripts/pr_converged.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from minigraph_spark.fixtures import ensure_rmat_parquet

POWER = int(os.environ.get("PR_POWER", "25"))
EDGES = int(os.environ.get("PR_EDGES", "256000000"))
SHUFFLE = int(os.environ.get("PR_SHUFFLE", "64"))

t0 = time.time()
p = ensure_rmat_parquet(POWER, EDGES, seed=42)
print(f"gen/ensure: {time.time()-t0:.0f}s -> {p}; load {os.getloadavg()}", flush=True)

from minigraph_spark.session import get_spark
from minigraph_spark.operators.superstep import SuperstepEngine
from minigraph_spark.plans.pagerank import run_pagerank

spark = get_spark(f"pr_conv_p{POWER}", master="local[32]", shuffle_partitions=SHUFFLE)
rmat = spark.read.parquet(p)
n = rmat.count()
print(f"edges {n}; load {os.getloadavg()}", flush=True)

t0 = time.time()
eng = SuperstepEngine(rmat.select("src", "dst"))
run_pagerank(rmat, tol=0.0, max_iter=1, engine=eng)  # prepartition + JIT warm
print(f"setup+warm-iter: {time.time()-t0:.0f}s; load {os.getloadavg()}", flush=True)

t0 = time.time()
r = run_pagerank(rmat, tol=1e-6, max_iter=200, engine=eng)
wall = time.time() - t0
iters = [round(m.elapsed_sec, 1) for m in r.metrics]
med = sorted(iters)[len(iters) // 2] if iters else float("nan")
print(
    f"converged={r.converged} in {r.iterations} iterations, {wall:.0f}s wall; "
    f"per-iter {iters}; median iter {med:.1f}s = {n/med/1e6:.2f}M e/s/iter; "
    f"mean {n*max(r.iterations,1)/wall/1e6:.2f}M e/s/iter; load {os.getloadavg()}",
    flush=True,
)
eng.close()
spark.stop()
