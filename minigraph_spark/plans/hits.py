"""HITS (hubs and authorities) — the canonical link-analysis companion to
PageRank (beyond the reference's app suite: no MiniGraph analog; added for
the link-graph mandate, same slot as k-core/k-truss).

Kleinberg's synchronous power iteration with L1 normalization:

    auth'(v) = sum over in-edges (u, v)  of hub(u);  auth = auth' / ||auth'||_1
    hub'(u)  = sum over out-edges (u, v) of auth(v); hub  = hub'  / ||hub'||_1

(hub reads the CURRENT iteration's normalized auth — the standard update
order; L1 rather than L2 so the oracle needs no sqrt and mass stays
interpretable as a distribution.)

Scale shape (r06 rewrite — the old loop built one 150-node plan per sweep
whose auth/vertex subtrees Catalyst re-executed up to 4x with zero exchange
reuse, under AQE and per-sweep V-row broadcasts; see
plans/r06/hits_rmat_before.txt): inherently TWO shuffles per iteration (one
per phase — each phase is a co-partitioned scatter join + a sum combine).
The loop now runs under iterative_confs (AQE off, no auto-broadcast — the
same static-plan rationale as the superstep engine) and carries SLIM state:
`h` = (src, hub) over the src-set only and `a` = (dst, auth) over the
dst-set only, each eagerly localCheckpoint-ed per phase so every subtree
executes exactly once. Exactness: a vertex outside the src-set has hub
identically 0 from sweep 1 on (its h_raw sum is empty) and contributes
exactly 0.0 to every auth sum, so dropping its row changes no float result;
symmetrically for auth outside the dst-set — both zero-sets are restored as
literal 0.0 rows in the one-time final assembly against the full vertex
set. Each edge's dst is by definition in the dst-set and each src in the
src-set, so both phase joins match exactly the same edge rows as the
full-state formulation. The edge table is deduped INSIDE its one-time
partitioning exchange (prepartition_edges dedup=True) instead of by a
separate distinct shuffle. Normalization totals are 1-row broadcasts inside
the plan (the dangling-mass device from plans/pagerank.py) — no driver
collect in the loop.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.partition import prepartition_edges
from ..operators.superstep import free_rdd_ids, persistent_rdd_ids
from ..session import iterative_confs

# debug aid: MG_EXPLAIN=<k> prints the physical plans of sweep k (0-based),
# the same hook the superstep engine exposes (operators/superstep.py)
_EXPLAIN = int(__import__("os").environ.get("MG_EXPLAIN", "-1") or -1)


@dataclass
class HitsResult:
    state: DataFrame  # (vid, auth, hub)
    iterations: int
    converged: bool


def run_hits(
    edges: DataFrame,
    iters: int | None = 3,
    tol: float | None = None,
    max_iter: int = 100,
    num_partitions: int | None = None,
    edge_cache: str = "single",
) -> HitsResult:
    """HITS over the directed simple edge set (duplicate edges are deduped;
    self-loops kept — they are legitimate hub-to-own-authority mass and the
    oracle pins the same rule).

    Fixed-sweep mode (``iters``, the oracle face) runs exactly that many
    iterations; convergence mode (``tol``) runs until
    max(|Δauth|, |Δhub|) <= tol or max_iter.

    ``edge_cache`` trades resident memory against per-sweep shuffle:
    "dual" pins TWO prepartitioned edge copies (by src and by dst) so BOTH
    phase joins are exchange-free on the E-row side — 2× the serialized
    edge bytes; "single" (default) pins only the src-partitioned copy and
    lets the hub phase re-shuffle the E rows on dst every sweep — half the
    resident edge memory. Measured three times at 256M edges / 3 sweeps
    (BASELINE.md round-4 HITS rows): dual 310.9 s/sweep (load 33.9),
    single 275.0 s/sweep (load 31.6), dual re-read 270.3 s/sweep (load
    30.8) — wall parity within this sandbox's co-tenant noise, so the
    halved resident cache decides the default (at 10^9 edges the second
    copy doubles the serialized block set, the round-3 memory concern).
    Pick "dual" when sweeps ≫ setup AND memory headroom is ample.
    """
    if (iters is None) == (tol is None):
        raise ValueError("pass exactly one of iters= or tol=")
    if edge_cache not in ("dual", "single"):
        raise ValueError(f"unknown edge_cache: {edge_cache}")
    spark = edges.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    with iterative_confs(spark):
        # scope the shuffle width to the edge partition count so the
        # per-sweep combine exchanges line up with the prepartitioned edge
        # cache (the same scoping SuperstepEngine.run applies)
        saved = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
        try:
            return _run_hits_loop(
                spark, edges, iters, tol, max_iter, n_part, edge_cache
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", saved)


def _run_hits_loop(
    spark,
    edges: DataFrame,
    iters: int | None,
    tol: float | None,
    max_iter: int,
    n_part: int,
    edge_cache: str,
) -> HitsResult:
    _pre = persistent_rdd_ids(spark)
    fwd = prepartition_edges(
        edges.select("src", "dst"), n_part, by="src", dedup=True
    )
    bwd = (
        prepartition_edges(fwd, n_part, by="dst")
        if edge_cache == "dual"
        else fwd
    )
    edge_ids = persistent_rdd_ids(spark) - _pre
    verts = (
        fwd.select(F.col("src").alias("vid"))
        .unionAll(fwd.select(F.col("dst").alias("vid")))
        .distinct()
    )

    def assemble(a_cur: DataFrame | None, h_cur: DataFrame | None) -> DataFrame:
        """One-time full-vertex state: restore the identically-0.0 rows the
        slim loop frames omit (None = pre-loop all-ones init)."""
        if a_cur is None or h_cur is None:
            st = verts.select(
                "vid", F.lit(1.0).alias("auth"), F.lit(1.0).alias("hub")
            )
        else:
            st = (
                verts.join(a_cur.withColumnRenamed("dst", "vid"), "vid", "left")
                .join(h_cur.withColumnRenamed("src", "vid"), "vid", "left")
                .select(
                    "vid",
                    F.coalesce("auth", F.lit(0.0)).alias("auth"),
                    F.coalesce("hub", F.lit(0.0)).alias("hub"),
                )
            )
        return st.localCheckpoint(eager=True)

    limit = iters if iters is not None else max_iter
    if limit <= 0 or fwd.limit(1).count() == 0:
        st = assemble(None, None)
        free_rdd_ids(spark, edge_ids)
        return HitsResult(st, 0, iters is not None or limit > 0)

    # slim init: hub = 1.0 over the src-set (exchange-free distinct — fwd is
    # already hash-partitioned by src)
    before = persistent_rdd_ids(spark)
    h = (
        fwd.select("src").distinct().select("src", F.lit(1.0).alias("hub"))
    ).localCheckpoint(eager=True)
    h_ids = persistent_rdd_ids(spark) - before
    a_prev: DataFrame | None = None
    a_prev_ids: set = set()
    n_verts: int | None = None

    it, converged = 0, False
    for it in range(1, limit + 1):
        # auth phase: co-partitioned scatter join (exchange-free on the
        # E side AND the h side) + one sum-combine exchange on dst.
        # The RAW phase aggregate is what gets checkpointed: the
        # normalization total and the normalized frame both re-reference
        # the phase subtree, and Spark's ReuseExchange rule does NOT
        # match exchanges over partitioning-recording checkpoint leaves
        # (verified empirically r06: identical subtrees over a
        # prepartitioned LogicalRDD plan twice, ReusedExchange absent) —
        # checkpointing the raw aggregate makes every consumer a trivial
        # projection over cached V rows, so the E-row join+combine runs
        # exactly ONCE per phase.
        a_raw = fwd.join(h, "src").groupBy("dst").agg(F.sum("hub").alias("_raw"))
        if it - 1 == _EXPLAIN:
            a_raw.explain("formatted")
        before = persistent_rdd_ids(spark)
        a_raw = a_raw.localCheckpoint(eager=True)
        a_ids = persistent_rdd_ids(spark) - before
        a_tot = a_raw.agg(F.sum("_raw").alias("_t"))
        a_cur = a_raw.crossJoin(F.broadcast(a_tot)).select(
            "dst", (F.col("_raw") / F.col("_t")).alias("auth")
        )

        # hub phase: edge side exchange-free only under edge_cache="dual";
        # a_cur is dst-hash partitioned (projection over the combine's
        # checkpoint), so the small side never re-shuffles
        h_raw = bwd.join(a_cur, "dst").groupBy("src").agg(
            F.sum("auth").alias("_raw")
        )
        if it - 1 == _EXPLAIN:
            h_raw.explain("formatted")
        before = persistent_rdd_ids(spark)
        h_raw = h_raw.localCheckpoint(eager=True)
        h_cur_ids = persistent_rdd_ids(spark) - before
        h_tot = h_raw.agg(F.sum("_raw").alias("_t"))
        h_cur = h_raw.crossJoin(F.broadcast(h_tot)).select(
            "src", (F.col("_raw") / F.col("_t")).alias("hub")
        )

        if tol is not None:
            # max(|Δauth|, |Δhub|) over ALL vertices. The slim frames' key
            # sets are constant across sweeps (every edge endpoint is in
            # its set from sweep 1 on), so a plain key join is exact for
            # it >= 2; sweep 1 compares against the all-ones init, where a
            # vertex missing from a slim frame moved 1.0 -> 0.0.
            if it == 1:
                if n_verts is None:
                    n_verts = verts.count()
                da = a_cur.agg(
                    F.max(F.abs(F.col("auth") - F.lit(1.0))).alias("d"),
                    F.count(F.lit(1)).alias("n"),
                ).collect()[0]
                dh = h_cur.agg(
                    F.max(F.abs(F.col("hub") - F.lit(1.0))).alias("d"),
                    F.count(F.lit(1)).alias("n"),
                ).collect()[0]
                delta = max(
                    da["d"] or 0.0,
                    dh["d"] or 0.0,
                    1.0 if (da["n"] < n_verts or dh["n"] < n_verts) else 0.0,
                )
            else:
                da = (
                    a_prev.withColumnRenamed("auth", "_pa")
                    .join(a_cur, "dst")
                    .agg(F.max(F.abs(F.col("auth") - F.col("_pa"))).alias("d"))
                    .collect()[0]["d"]
                )
                dh = (
                    h.withColumnRenamed("hub", "_ph")
                    .join(h_cur, "src")
                    .agg(F.max(F.abs(F.col("hub") - F.col("_ph"))).alias("d"))
                    .collect()[0]["d"]
                )
                delta = max(da or 0.0, dh or 0.0)
            if delta <= tol:
                converged = True

        # free the previous sweep's slim frames only after the new ones are
        # materialized and the delta read them (the superstep engine's
        # snapshot/diff idiom)
        free_rdd_ids(spark, h_ids)
        free_rdd_ids(spark, a_prev_ids)
        h, h_ids = h_cur, h_cur_ids
        a_prev, a_prev_ids = a_cur, a_ids
        if converged:
            break

    st = assemble(a_prev, h)
    free_rdd_ids(spark, a_prev_ids)
    free_rdd_ids(spark, h_ids)
    # the prepartitioned edge caches are now dead weight — free them so
    # back-to-back run_hits calls don't accumulate E-row block sets (ADVICE r3)
    free_rdd_ids(spark, edge_ids)
    return HitsResult(st, it, converged or iters is not None)
