#!/usr/bin/env python
"""Phase-decomposed benchmarks for optimization work (guide §1: measure
first). NOT the driver contract — bench.py stays frozen; this file isolates
where each headline query's wall time goes (engine build / init / loop) so
optimizations target the real cost. Prints one JSON line.

Usage:
    python bench_extra.py [pagerank_rmat wcc_rmat ...]   # default: all
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from minigraph_spark import relational  # noqa: E402
from minigraph_spark.fixtures import make_rmat_edges_parquet  # noqa: E402
from minigraph_spark.plans.anf import run_anf  # noqa: E402
from minigraph_spark.plans.hits import run_hits  # noqa: E402
from minigraph_spark.plans.lpa import run_lpa  # noqa: E402
from minigraph_spark.plans.pagerank import run_pagerank  # noqa: E402
from minigraph_spark.plans.wcc import run_wcc  # noqa: E402
from minigraph_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RMAT_POWER = int(os.environ.get("SPARK_GRAFT_RMAT_POWER", "21"))
RMAT_EDGES = int(os.environ.get("SPARK_GRAFT_RMAT_EDGES", "16000000"))

out: dict[str, dict] = {}


def phase(name: str, fn):
    t0 = time.time()
    res = fn()
    wall = round(time.time() - t0, 3)
    loop = round(getattr(res, "total_sec", 0.0), 3) if res is not None else 0.0
    rec = {"wall": wall, "loop": loop, "setup": round(wall - loop, 3)}
    if hasattr(res, "iterations"):
        rec["iters"] = res.iterations
        if res.iterations:
            rec["per_iter"] = round(loop / max(res.iterations, 1), 3)
    out[name] = rec
    print(f"# {name}: {rec}", file=sys.stderr, flush=True)
    return res


def main() -> None:
    which = set(sys.argv[1:])

    def want(n: str) -> bool:
        return not which or n in which

    spark = get_spark("minigraph_spark_bench_extra", shuffle_partitions=CPUS)
    from bench import clear_storage

    rmat = make_rmat_edges_parquet(spark, RMAT_POWER, RMAT_EDGES, seed=42)
    rmat.count()

    if want("pagerank_rmat"):
        spark.sparkContext.setJobDescription("pagerank_rmat")
        phase("pagerank_rmat", lambda: run_pagerank(rmat, tol=0.0, max_iter=10))
        clear_storage(spark)
    if want("wcc_rmat"):
        spark.sparkContext.setJobDescription("wcc_rmat")
        phase("wcc_rmat", lambda: run_wcc(rmat))
        clear_storage(spark)
    if want("hits3_rmat"):
        spark.sparkContext.setJobDescription("hits3_rmat")
        phase("hits3_rmat", lambda: run_hits(rmat, iters=3))
        clear_storage(spark)
    if want("anf3_rmat"):
        spark.sparkContext.setJobDescription("anf3_rmat")
        phase("anf3_rmat", lambda: run_anf(rmat, depth=3))
        clear_storage(spark)

    if want("events"):
        seq = relational.events_seq_edges(spark, SF_DIR).persist()
        seq.count()
        spark.sparkContext.setJobDescription("pagerank_events")
        phase("pagerank_events", lambda: run_pagerank(seq, tol=1e-6, max_iter=50))
        clear_storage(spark)
        seq = relational.events_seq_edges(spark, SF_DIR).persist()
        seq.count()
        spark.sparkContext.setJobDescription("wcc_events")
        phase("wcc_events", lambda: run_wcc(seq))
        clear_storage(spark)
        seq = relational.events_seq_edges(spark, SF_DIR).persist()
        seq.count()
        spark.sparkContext.setJobDescription("lpa5_events")
        phase("lpa5_events", lambda: run_lpa(seq, max_iter=5))
        clear_storage(spark)

    if want("stream"):
        import shutil
        import tempfile

        from minigraph_spark.streaming import (  # noqa: E402
            run_available_now,
            stream_sessionize,
        )

        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        stream_dir = tempfile.mkdtemp(prefix="bx_sessionize_")
        try:
            (
                ev.select("event_id", "user_id", "ts")
                .withColumn(
                    "_slice", F.ntile(4).over(Window.orderBy("ts", "event_id"))
                )
                .repartition(4, "_slice")
                .sortWithinPartitions("ts", "event_id")
                .write.partitionBy("_slice")
                .mode("overwrite")
                .parquet(stream_dir)
            )
            base_mtime = time.time() - 1000
            for k in range(1, 5):
                sdir = f"{stream_dir}/_slice={k}"
                for fn in sorted(os.listdir(sdir)):
                    os.utime(f"{sdir}/{fn}", (base_mtime + k, base_mtime + k))
            sess_stream = (
                spark.readStream.schema("event_id long, user_id long, ts timestamp")
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{stream_dir}/_slice=*")
            )
            t0 = time.time()
            n = run_available_now(
                stream_sessionize(sess_stream, gap_seconds=1800), "bx_sessionize"
            ).count()
            out["stream_sessionize_events"] = {
                "wall": round(time.time() - t0, 3), "rows": n,
            }
            print(f"# stream: {out['stream_sessionize_events']}", file=sys.stderr)
        finally:
            shutil.rmtree(stream_dir, ignore_errors=True)
            spark.catalog.dropTempView("bx_sessionize")

    try:
        with open("/proc/loadavg") as fh:
            out["_loadavg_end"] = float(fh.read().split()[0])
    except OSError:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
