"""WCC at the 10^9-edge target scale (2B-row symmetrized closure) —
completes the north-rule algorithm suite's at-scale evidence (PageRank and
LPA hold 256M-1B rows in BASELINE.md; WCC was previously proven at 256M).
SV hooking + pointer jumping, fresh JVM."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from minigraph_spark.session import get_spark
from minigraph_spark.plans.wcc import run_wcc

PATH = "/tmp/minigraph_rmat_p27_e1000000000_s42.parquet"

spark = get_spark("wcc1b", master="local[32]", shuffle_partitions=128)
rmat = spark.read.parquet(PATH)
n = rmat.count()
print(f"edges: {n}; load {os.getloadavg()}", flush=True)

t0 = time.time()
r = run_wcc(rmat)
wall = time.time() - t0
iters = [round(m.elapsed_sec, 1) for m in r.metrics]
print(
    f"wcc: {r.iterations} rounds, {wall:.0f}s wall; per-round {iters}; "
    f"load {os.getloadavg()}",
    flush=True,
)
t0 = time.time()
ncomp = r.state.select("value").distinct().count()
print(f"components: {ncomp} (count {time.time()-t0:.0f}s)", flush=True)
spark.stop()
