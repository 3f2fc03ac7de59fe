"""Triangle count on a big R-MAT fixture — fresh JVM, disk-footprint-aware.

The 256M-edge attempt ENOSPC'd twice at ~54 GB free: the intersection join
ships each vertex's oriented adjacency array once per incident oriented
edge, and lz4-compressed long arrays did not fit. Three reductions here:

- oriented_edges now canonicalizes before distinct (E-row dedup, not 2E)
- ids cast to int32 before counting (p<=30 fixtures fit; halves array bytes)
- zstd shuffle/spill compression (MG measured ~1.5-2x over lz4 on id data)

Usage: TRI_PATH=/tmp/minigraph_rmat_p23_e64000000_s42.parquet python scripts/scale_tri.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from minigraph_spark.session import get_spark
from minigraph_spark.plans.triangles import triangle_count

PATH = os.environ.get("TRI_PATH", "/tmp/minigraph_rmat_p25_e256000000_s42.parquet")

spark = get_spark(
    "scale_tri",
    master="local[32]",
    shuffle_partitions=256,
    extra_conf={"spark.io.compression.codec": "zstd"},
)
rmat = spark.read.parquet(PATH).selectExpr(
    "cast(src as int) as src", "cast(dst as int) as dst"
)
n = rmat.count()
print(f"edges: {n}; load {os.getloadavg()}", flush=True)

t0 = time.time()
tc = triangle_count(rmat).collect()
print(
    f"triangles: {tc[0]['num_triangles']} in {time.time()-t0:.0f}s; "
    f"load {os.getloadavg()}",
    flush=True,
)
spark.stop()
