"""k-core decomposition by iterative peeling (beyond the reference's app
suite — no MiniGraph analog; a link-graph staple for spam/hub trimming and
community seeding, added for the training-pipeline mandate).

The k-core is the maximal subgraph of the undirected simple closure in
which every vertex has degree >= k. Synchronous peeling: drop every vertex
with degree < k, recompute degrees, repeat to fixpoint. Deterministic, and
the round count is derivable by the same NumPy simulation the to-
convergence oracles use (oracle.kcore_peel_rounds), so the DuckDB oracle
unrolls exactly.

Scale shape: each round is ONE degree aggregation (map-side partial over
the canonical E-row closure) plus two semi joins of the edge table against
the surviving-vertex set — no collect, no per-row driver work; the peeled
edge table shrinks monotonically, so later rounds get cheaper. Round count
on real graphs is small (bounded by the degeneracy peel depth, typically
tens); each round materializes the shrunken closure and frees the previous
one, the same persist discipline as the superstep loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.project import canonicalize
from ..operators.superstep import free_rdd_ids, persistent_rdd_ids


def run_kcore(edges: DataFrame, k: int, max_rounds: int = 200) -> DataFrame:
    """Vertices of the k-core: (vid) rows, possibly empty.

    Peels on the canonical (src < dst, self-loops dropped, deduped) closure;
    degree = undirected degree. Returns the fixpoint vertex set.
    """
    spark = edges.sparkSession
    # Eager localCheckpoint per round, NOT persist: the next-round plan
    # references `cur` 3x (degree explode + the two anti joins), so an
    # un-truncated logical plan grows ~3^rounds and its sizeInBytes
    # BigIntegers with it — the same driver-side GC blowup measured on
    # run_ktruss (plans/ktruss.py) at only 3 peel rounds. A deep peel
    # (k near the degeneracy) runs tens of rounds.
    before = persistent_rdd_ids(spark)
    cur = (
        canonicalize(edges)
        .localCheckpoint(eager=True)
    )
    cur_ids = persistent_rdd_ids(spark) - before
    n_edges = cur.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        deg = (
            cur.select(F.explode(F.array("src", "dst")).alias("v"))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        # anti-join against the DROP set, not semi against the keep set:
        # past the first rounds few vertices fall below k, so the drop side
        # is small (broadcast-able) while keep stays V-row
        drop = deg.filter(F.col("deg") < k).select("v")
        before = persistent_rdd_ids(spark)
        nxt = (
            cur.join(drop.withColumnRenamed("v", "src"), "src", "left_anti")
            .join(drop.withColumnRenamed("v", "dst"), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        nxt_ids = persistent_rdd_ids(spark) - before
        n_next = nxt.count()
        if n_next == n_edges:
            free_rdd_ids(spark, nxt_ids)
            break
        free_rdd_ids(spark, cur_ids)
        cur, cur_ids, n_edges = nxt, nxt_ids, n_next
    out = (
        cur.select(F.col("src").alias("vid"))
        .unionAll(cur.select(F.col("dst").alias("vid")))
        .distinct()
        .persist()
    )
    out.count()
    free_rdd_ids(spark, cur_ids)
    return out
