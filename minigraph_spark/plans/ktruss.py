"""k-truss decomposition by iterative support peeling (beyond the
reference's app suite — no MiniGraph analog; the cohesion notion one step
up from k-core, standard for mining near-clique link-farm / community
cores out of web graphs).

The k-truss is the maximal subgraph of the undirected simple closure in
which every EDGE participates in >= k-2 triangles (its "support") within
the subgraph. Synchronous peel: compute per-edge support on the current
edge set, drop every edge below k-2, repeat to fixpoint. Deterministic;
the round count is derivable by the same NumPy simulation as k-core
(oracle.ktruss_peel_rounds), so the DuckDB oracle unrolls exactly.

Scale shape: each round is one triangle ENUMERATION of the shrinking
closure — the degree-oriented intersection plan from plans/triangles.py
(quadratic wedge volume rides inside row arrays, oriented out-degree
O(sqrt E) on power-law graphs), then a 3T-row edge-credit explode and one
E-row support agg + semi join. This is the classic distributed truss
decomposition round; the peeled edge table shrinks monotonically, so late
rounds are cheap. No collect, no per-row driver work; per-round EAGER
localCheckpoint with previous-round block freeing, the superstep loop's
discipline (plain persist is not enough — see the comment in run_ktruss).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.project import symmetrize
from ..operators.superstep import free_rdd_ids, persistent_rdd_ids
from .triangles import _edge_intersections, oriented_edges


def _edge_support(cur: DataFrame) -> DataFrame:
    """(src, dst, support) for the canonical edge set `cur` — every triangle
    credits all three of its canonical edges (unlike the count plan, which
    credits exactly one)."""
    e_or = oriented_edges(cur, by_degree=True)
    tri = (
        _edge_intersections(e_or)
        .select("u", "v", F.explode("cs").alias("c"))
    )

    def canon(a, b):
        return [F.least(a, b).alias("src"), F.greatest(a, b).alias("dst")]

    credits = (
        tri.select(*canon(F.col("u"), F.col("v")))
        .unionAll(tri.select(*canon(F.col("u"), F.col("c"))))
        .unionAll(tri.select(*canon(F.col("v"), F.col("c"))))
    )
    return credits.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("support")
    )


def run_ktruss(edges: DataFrame, k: int, max_rounds: int = 200) -> DataFrame:
    """Edges of the k-truss: canonical (src, dst) rows, possibly empty.

    k <= 2 is the trivial truss (every edge has support >= 0), returned
    as the simple closure without peeling.
    """
    spark = edges.sparkSession
    # Eager localCheckpoint per round, NOT persist: the support plan
    # references `cur` ~8x (degree agg, orientation join, two adjacency
    # joins, the semi join), so an un-truncated logical plan grows ~8^rounds
    # and its sizeInBytes BigIntegers with it — measured as a driver GC
    # storm (all CPU in G1 refine) on the 9.6k-edge sf0.01 graph at 3 peel
    # rounds. Same discipline as SuperstepEngine (superstep.py:340).
    before = persistent_rdd_ids(spark)
    cur = (
        symmetrize(edges)
        .filter(F.col("src") < F.col("dst"))
        .localCheckpoint(eager=True)
    )
    cur_ids = persistent_rdd_ids(spark) - before
    n_edges = cur.count()
    if k <= 2:
        return cur
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        sup = _edge_support(cur)
        # inner semi join: an edge absent from the support table has
        # support 0 and must drop (k >= 3 here)
        before = persistent_rdd_ids(spark)
        nxt = cur.join(
            sup.filter(F.col("support") >= k - 2), ["src", "dst"], "semi"
        ).localCheckpoint(eager=True)
        nxt_ids = persistent_rdd_ids(spark) - before
        n_next = nxt.count()
        if n_next == n_edges:
            free_rdd_ids(spark, nxt_ids)
            break
        free_rdd_ids(spark, cur_ids)
        cur, cur_ids, n_edges = nxt, nxt_ids, n_next
    return cur
