"""Web-graph bow-tie decomposition (Broder et al., WWW 2000).

The classic structural census of a crawl graph: the giant SCC (CORE), the
pages that can reach it (IN) and the pages it reaches (OUT), the TENDRILs
hanging off IN or leading into OUT, the TUBEs that bypass the core on a
direct IN->OUT path, and the DISConnected remainder. The reference ships
only undirected WCC (SURVEY.md §2.4, wcc_vc_batch.cpp); this is the
directed completion built on this engine's run_scc/condensation.

Region semantics (per component c of the condensation DAG, in precedence
order — each vertex inherits its component's region):

    CORE    c is the largest SCC (ties broken by smallest scc_id)
    IN      c reaches CORE
    OUT     CORE reaches c
    TUBE    c is reachable from IN and reaches OUT (never via CORE: a
            CORE-crossing path would have put c in OUT or IN already)
    TENDRIL c is reachable from IN, or reaches OUT, but not both
    DISC    everything else (other weak components)

Scale shape: one run_scc + condensation (see plans/scc.py for their
shapes), then FOUR multi-source frontier closures on the CONDENSATION
graph — each round is one frontier join + one anti-join dedup against the
reached set, all component-level rows (orders of magnitude below V on web
graphs: the giant SCC is one row here). Rounds are bounded by condensation
depth, shallow on bow-tie-shaped graphs. Per-round state is
localCheckpoint'ed with previous-round block freeing (the run_scc idiom),
and the component->vertex mapping at the end is two V-row joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.superstep import free_rdd_ids, persistent_rdd_ids
from .scc import condensation, run_scc


def _closure(
    spark, dag: DataFrame, seeds: DataFrame, max_rounds: int
) -> DataFrame:
    """All component ids reachable from ``seeds`` (cid) along ``dag``
    (src, dst) edges, seeds included. Frontier fixpoint: each round joins
    the frontier against the edge table and anti-joins the reached set, so
    work is proportional to newly-reached rows, not the full closure."""
    before = persistent_rdd_ids(spark)
    reached = seeds.select("cid").distinct().localCheckpoint(eager=True)
    reached_ids = persistent_rdd_ids(spark) - before
    frontier = reached
    frontier_ids: set = set()
    for _ in range(max_rounds):
        before = persistent_rdd_ids(spark)
        nxt = (
            dag.join(frontier.select(F.col("cid").alias("src")), "src")
            .select(F.col("dst").alias("cid"))
            .distinct()
            .join(reached, "cid", "left_anti")
            .localCheckpoint(eager=True)
        )
        nxt_ids = persistent_rdd_ids(spark) - before
        free_rdd_ids(spark, frontier_ids)
        if nxt.limit(1).count() == 0:
            free_rdd_ids(spark, nxt_ids)
            return reached
        before = persistent_rdd_ids(spark)
        new_reached = reached.unionAll(nxt).localCheckpoint(eager=True)
        new_reached_ids = persistent_rdd_ids(spark) - before
        free_rdd_ids(spark, reached_ids)
        reached, reached_ids = new_reached, new_reached_ids
        frontier, frontier_ids = nxt, nxt_ids
    raise RuntimeError(
        f"bowtie closure did not converge within {max_rounds} rounds"
    )


def run_bowtie(
    edges: DataFrame,
    scc: DataFrame | None = None,
    max_rounds: int = 10_000,
) -> DataFrame:
    """(vid, region) for every endpoint vertex of ``edges``; region is one
    of CORE / IN / OUT / TUBE / TENDRIL / DISC (see module docstring).

    Pass a precomputed ``scc`` (vid, scc_id) table to amortize run_scc
    across consumers (the engine-reuse idiom). On a graph with no cycle
    the "giant SCC" is a deterministic singleton (smallest vid among the
    largest SCCs) and the decomposition degenerates gracefully.
    ``max_rounds`` bounds each closure at condensation depth (a chain
    graph's condensation is V long, hence the high default)."""
    spark = edges.sparkSession
    _pre = persistent_rdd_ids(spark)
    comp = scc if scc is not None else run_scc(edges, max_rounds=50)
    sizes = comp.groupBy("scc_id").agg(F.count(F.lit(1)).alias("n"))
    head = sizes.orderBy(F.desc("n"), F.asc("scc_id")).limit(1).collect()
    if not head:
        free_rdd_ids(spark, persistent_rdd_ids(spark) - _pre)
        return spark.createDataFrame([], "vid long, region string")
    core_id = head[0]["scc_id"]

    dag = (
        condensation(edges, scc=comp)
        .select(
            F.col("src_scc").alias("src"), F.col("dst_scc").alias("dst")
        )
        .persist()
    )
    rdag = dag.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    seed = spark.createDataFrame([(core_id,)], "cid long")

    out_c = _closure(spark, dag, seed, max_rounds)   # CORE + OUT comps
    in_c = _closure(spark, rdag, seed, max_rounds)   # CORE + IN comps
    fwd_in = _closure(spark, dag, in_c, max_rounds)
    bwd_out = _closure(spark, rdag, out_c, max_rounds)
    dag.unpersist()

    is_core = F.col("scc_id") == F.lit(core_id)
    region = (
        F.when(is_core, F.lit("CORE"))
        .when(F.col("_in").isNotNull(), F.lit("IN"))
        .when(F.col("_out").isNotNull(), F.lit("OUT"))
        .when(
            F.col("_fi").isNotNull() & F.col("_bo").isNotNull(), F.lit("TUBE")
        )
        .when(
            F.col("_fi").isNotNull() | F.col("_bo").isNotNull(),
            F.lit("TENDRIL"),
        )
        .otherwise(F.lit("DISC"))
    )

    def tag(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.col("cid").alias("scc_id"), F.lit(1).alias(name)
        )

    minted = persistent_rdd_ids(spark) - _pre
    out = (
        comp.join(tag(in_c, "_in"), "scc_id", "left")
        .join(tag(out_c, "_out"), "scc_id", "left")
        .join(tag(fwd_in, "_fi"), "scc_id", "left")
        .join(tag(bwd_out, "_bo"), "scc_id", "left")
        .select("vid", region.alias("region"))
        .localCheckpoint(eager=True)
    )
    # out's blocks back the returned DataFrame (run_scc contract); every
    # block minted before the final checkpoint — the scc table if computed
    # here, and the four closure checkpoints — is freed now that out is
    # materialized. A caller-passed scc table predates _pre, so it is
    # left untouched.
    free_rdd_ids(spark, minted)
    return out
