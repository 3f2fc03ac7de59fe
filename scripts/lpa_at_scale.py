"""LPA (5 iters) on the 10^9-edge R-MAT — with this, all three iterative
north-rule algorithms (PageRank, WCC, LPA) hold measured throughput at the
BASELINE.json target scale; triangles are disk-bound past 128M in this
sandbox (wedge table in BASELINE.md)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from minigraph_spark.session import get_spark
from minigraph_spark.plans.lpa import run_lpa

PATH = "/tmp/minigraph_rmat_p27_e1000000000_s42.parquet"

spark = get_spark("lpa1b", master="local[32]", shuffle_partitions=128)
rmat = spark.read.parquet(PATH)
n = rmat.count()
print(f"edges: {n}; load {os.getloadavg()}", flush=True)

t0 = time.time()
r = run_lpa(rmat, max_iter=5)
wall = time.time() - t0
iters = [round(m.elapsed_sec, 1) for m in r.metrics]
med = sorted(iters)[len(iters) // 2]
print(
    f"lpa 5 iters: {wall:.0f}s; per-iter {iters}; "
    f"median {n/med/1e6:.2f}M e/s/iter; load {os.getloadavg()}",
    flush=True,
)
spark.stop()
