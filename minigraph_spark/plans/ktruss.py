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

from ..operators.project import canonicalize
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


def run_ktruss(
    edges: DataFrame, k: int, max_rounds: int = 200, method: str = "incremental"
) -> DataFrame:
    """Edges of the k-truss: canonical (src, dst) rows, possibly empty.

    k <= 2 is the trivial truss (every edge has support >= 0), returned
    as the simple closure without peeling.

    method="incremental" (default) enumerates triangles ONCE for the
    initial supports, then maintains them: a round's support can only drop
    on edges that shared a triangle with a dropped edge, so each peel round
    intersects just the DROPPED edges against the alive adjacency to find
    the dying triangles and decrements their surviving edges — 1 full
    enumeration + R localized updates instead of R full enumerations
    (VERDICT r3 item #5; the classic support-maintenance step of
    Wang-Cheng-style truss decomposition). method="full" keeps the
    re-enumerating peel for cross-checking; both produce the identical
    synchronous-peel fixpoint, and the DuckDB oracle unrolls the full
    form.
    """
    if method == "incremental":
        return _run_ktruss_incremental(edges, k, max_rounds)
    if method != "full":
        raise ValueError(f"unknown method: {method}")
    spark = edges.sparkSession
    # Eager localCheckpoint per round, NOT persist: the support plan
    # references `cur` ~8x (degree agg, orientation join, two adjacency
    # joins, the semi join), so an un-truncated logical plan grows ~8^rounds
    # and its sizeInBytes BigIntegers with it — measured as a driver GC
    # storm (all CPU in G1 refine) on the 9.6k-edge sf0.01 graph at 3 peel
    # rounds. Same discipline as SuperstepEngine (superstep.py:340).
    before = persistent_rdd_ids(spark)
    cur = (
        canonicalize(edges)
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


def _run_ktruss_incremental(
    edges: DataFrame, k: int, max_rounds: int = 200
) -> DataFrame:
    """Support-maintenance peel (see run_ktruss). State per round is the
    alive canonical edge set WITH its current support; the invariant is
    support(e) == #triangles of the alive closure containing e, re-derived
    only where it can change:

        dying triangles = { {u,v,w} in alive : some edge dropped } — found
        by intersecting each DROPPED edge's endpoints against the alive
        undirected adjacency (w in adj(u) ∩ adj(v)), deduped as sorted
        triples (a triangle with 2-3 dropped edges dies once);
        decrement(e) = #dying triangles containing e, applied to SURVIVING
        edges only.

    Scale shape: round 0 pays one full triangle enumeration (the same
    oriented-intersection plan as method="full"); each later round costs
    an adjacency groupBy RESTRICTED to the dropped edges' endpoints (semi
    join before the aggregate, so the shuffle is ∝ touched degree, not 2E)
    plus an intersection join whose left side is only the dropped edges —
    on deep peels (the expensive case) this replaces R quadratic-volume
    enumerations with R dropped-local passes.

    Heavy-drop rounds fall back to re-enumeration: when a round drops more
    than a quarter of the alive edges (typical for round 1 of a deep peel
    on a power-law graph), the maintenance pass is strictly worse than one
    full enumeration of the survivors — the dying-triangle set approaches
    ALL triangles, but unlike the oriented enumeration (quadratic volume
    inside row arrays, each triangle produced once) it ships hub-sized
    adjacency arrays through a join and dedups exploded triples with a
    distinct. The un-hybridized form ENOSPC'd a 252 GB disk on the 64M-edge
    k=10 peel (round-4 evidence pass 3) exactly there; the fallback bounds
    every round by the full method's round cost while keeping the
    dropped-local win on the deep tail, where rounds are many and drops
    are small. Same eager-localCheckpoint-per-round discipline (the
    support plan references the state multiply; see run_ktruss's lineage
    comment)."""
    spark = edges.sparkSession
    before = persistent_rdd_ids(spark)
    cur = (
        canonicalize(edges)
        .localCheckpoint(eager=True)
    )
    cur_ids = persistent_rdd_ids(spark) - before
    if k <= 2:
        return cur
    if cur.limit(1).count() == 0:
        return cur

    # round 0: full enumeration -> (src, dst, support), support-0 edges kept
    before = persistent_rdd_ids(spark)
    alive = (
        cur.join(_edge_support(cur), ["src", "dst"], "left")
        .select(
            "src", "dst",
            F.coalesce("support", F.lit(0)).cast("long").alias("support"),
        )
        .localCheckpoint(eager=True)
    )
    alive_ids = persistent_rdd_ids(spark) - before
    free_rdd_ids(spark, cur_ids)
    n_alive = alive.count()

    for _ in range(max_rounds):
        dropped = alive.filter(F.col("support") < k - 2)
        n_dropped = dropped.count()
        if n_dropped == 0:
            break
        survivors = alive.filter(F.col("support") >= k - 2)
        if 4 * n_dropped > n_alive:
            # heavy-drop round: one full enumeration of the survivors is
            # cheaper (and far smaller on disk) than maintaining supports
            # through a near-total dying-triangle set — see the docstring
            before = persistent_rdd_ids(spark)
            surv = survivors.select("src", "dst")
            nxt = (
                surv.join(_edge_support(surv), ["src", "dst"], "left")
                .select(
                    "src", "dst",
                    F.coalesce("support", F.lit(0)).cast("long").alias("support"),
                )
                .localCheckpoint(eager=True)
            )
            nxt_ids = persistent_rdd_ids(spark) - before
            free_rdd_ids(spark, alive_ids)
            alive, alive_ids = nxt, nxt_ids
            n_alive -= n_dropped
            continue
        # undirected adjacency of the (old) alive closure — dropped edges
        # included: a dying triangle's third edge may itself be dropped.
        # Only the dropped edges' endpoints are ever looked up, so restrict
        # BEFORE the groupBy: the aggregate shuffles rows ∝ the touched
        # vertices' degree, not 2E per round.
        touched = (
            dropped.select(F.col("src").alias("vid"))
            .unionAll(dropped.select(F.col("dst").alias("vid")))
            .distinct()
        )
        und = alive.select("src", "dst").unionAll(
            alive.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        adj = (
            und.join(
                touched.withColumnRenamed("vid", "src"), "src", "semi"
            )
            .groupBy("src")
            .agg(F.collect_list("dst").alias("nbrs"))
        )
        dying = (
            dropped.select("src", "dst")
            .join(
                adj.select(F.col("src").alias("_u"), F.col("nbrs").alias("_un")),
                F.col("src") == F.col("_u"),
            )
            .join(
                adj.select(F.col("src").alias("_v"), F.col("nbrs").alias("_vn")),
                F.col("dst") == F.col("_v"),
            )
            .select(
                "src", "dst",
                F.explode(F.array_intersect("_un", "_vn")).alias("w"),
            )
            .select(F.array_sort(F.array("src", "dst", "w")).alias("t"))
            .distinct()
        )
        tri = dying.select(
            F.element_at("t", 1).alias("a"),
            F.element_at("t", 2).alias("b"),
            F.element_at("t", 3).alias("c"),
        )
        edge3 = (
            tri.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionAll(tri.select(F.col("a").alias("src"), F.col("c").alias("dst")))
            .unionAll(tri.select(F.col("b").alias("src"), F.col("c").alias("dst")))
        )
        dec = (
            edge3.join(dropped.select("src", "dst"), ["src", "dst"], "left_anti")
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("_dec"))
        )
        before = persistent_rdd_ids(spark)
        nxt = (
            survivors.join(dec, ["src", "dst"], "left")
            .select(
                "src", "dst",
                (F.col("support") - F.coalesce("_dec", F.lit(0))).alias("support"),
            )
            .localCheckpoint(eager=True)
        )
        nxt_ids = persistent_rdd_ids(spark) - before
        free_rdd_ids(spark, alive_ids)
        alive, alive_ids = nxt, nxt_ids
        n_alive -= n_dropped
    return alive.select("src", "dst")
