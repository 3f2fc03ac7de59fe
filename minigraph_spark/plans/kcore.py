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

from ..operators.project import symmetrize


def run_kcore(edges: DataFrame, k: int, max_rounds: int = 200) -> DataFrame:
    """Vertices of the k-core: (vid) rows, possibly empty.

    Peels on the canonical (src < dst, self-loops dropped, deduped) closure;
    degree = undirected degree. Returns the fixpoint vertex set.
    """
    cur = (
        symmetrize(edges)
        .filter(F.col("src") < F.col("dst"))
        .persist()
    )
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
        nxt = (
            cur.join(drop.withColumnRenamed("v", "src"), "src", "left_anti")
            .join(drop.withColumnRenamed("v", "dst"), "dst", "left_anti")
            .select("src", "dst")
            .persist()
        )
        n_next = nxt.count()
        if n_next == n_edges:
            nxt.unpersist()
            break
        cur.unpersist()
        cur, n_edges = nxt, n_next
    out = (
        cur.select(F.col("src").alias("vid"))
        .unionAll(cur.select(F.col("dst").alias("vid")))
        .distinct()
        .persist()
    )
    out.count()
    cur.unpersist()
    return out
