"""BFS / unit-weight SSSP — frontier-driven min-distance propagation.

Reference: apps/cpp/sssp_vc_stream.cpp:25-64 — write_min(dist[dst],
dist[src]+1) with hardcoded unit weights (:27), root dist=0 (:116-119),
frontier loop until empty. Weighted SSSP is the same plan with msg =
dist + weight once the edge table carries a weight column (the reference
declares but does not support weighted input, csr_io_adapter.h:47-49).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.superstep import SuperstepEngine, SuperstepResult


def run_bfs(
    edges: DataFrame,
    root: int,
    max_iter: int = 10_000,
    weight_col: str | None = None,
    checkpoint_dir: str | None = None,
    engine_kwargs: dict | None = None,
    engine: SuperstepEngine | None = None,
) -> SuperstepResult:
    """Returns state (vid, value=distance); unreachable vertices have NULL.

    Pass ``engine`` to amortize the one-time prepartition across runs on
    the same graph (same contract as run_pagerank); it must carry the
    weight column when weight_col is set."""
    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    eng = engine or SuperstepEngine(edges.select(*cols), checkpoint_dir=checkpoint_dir,
                                    **(engine_kwargs or {}))
    init = eng.vertices().select(
        "vid",
        F.when(F.col("vid") == root, F.lit(0).cast("long")).alias("value"),
        (F.col("vid") == root).alias("active"),
    )

    def scatter(e: DataFrame, state: DataFrame, ctx: dict) -> DataFrame:
        step = F.col(weight_col) if weight_col else F.lit(1)
        return e.join(
            state.select(F.col("vid").alias("src"), "value"), "src"
        ).select("dst", (F.col("value") + step).alias("msg"))

    def apply_fn(state: DataFrame, agg: DataFrame, ctx: dict) -> DataFrame:
        joined = state.join(agg.withColumnRenamed("dst", "vid"), "vid", "left")
        improved = F.col("agg").isNotNull() & (
            F.col("value").isNull() | (F.col("agg") < F.col("value"))
        )
        return joined.select(
            "vid",
            F.when(improved, F.col("agg")).otherwise(F.col("value")).alias("value"),
            improved.alias("active"),
        )

    res = eng.run(
        init, scatter=scatter, combiner="min", apply_fn=apply_fn,
        frontier=True, max_iter=max_iter, algo="bfs",
    )
    if engine is None:
        eng.close()  # free owned edge blocks; caller-passed engines live on
    return res


def run_bfs_incremental(
    edges: DataFrame,
    delta_edges: DataFrame,
    prev_state: DataFrame,
    root: int,
    max_iter: int = 10_000,
    weight_col: str | None = None,
    checkpoint_dir: str | None = None,
    engine_kwargs: dict | None = None,
    engine: SuperstepEngine | None = None,
) -> SuperstepResult:
    """IncEval for BFS/SSSP under edge ADDITIONS (see
    plans/wcc.py::run_wcc_incremental for the PEval/IncEval framing):
    re-converge distances from a previous converged state, activating only
    delta endpoints and unseen vertices. Exact because min-distance is
    monotone under additions (new edges can only shorten paths); deletions
    can lengthen paths and require a fresh run_bfs.

    prev_state is (vid, value) with NULL for unreachable — run_bfs().state
    or a checkpoint snapshot. The output covers the union graph's vertices.
    """
    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    union_edges = edges.select(*cols).unionAll(delta_edges.select(*cols))
    # engine, if passed, must hold the UNION edge table (incl. weight_col)
    eng = engine or SuperstepEngine(union_edges, checkpoint_dir=checkpoint_dir,
                                    **(engine_kwargs or {}))
    touched = (
        delta_edges.select(F.col("src").alias("vid"))
        .unionAll(delta_edges.select(F.col("dst").alias("vid")))
        .distinct()
        .withColumn("_touched", F.lit(True))
    )
    init = (
        eng.vertices()
        .join(prev_state.select("vid", F.col("value").alias("_prev")), "vid", "left")
        .join(touched, "vid", "left")
        .select(
            "vid",
            F.when(F.col("vid") == root, F.lit(0).cast("long"))
            .otherwise(F.col("_prev"))
            .alias("value"),
            # only finite-distance touched vertices can improve a neighbor;
            # the root re-activates in case it is new to the graph
            (
                (F.col("_touched").isNotNull() & F.col("_prev").isNotNull())
                | (F.col("vid") == root)
            ).alias("active"),
        )
    )

    def scatter(e: DataFrame, state: DataFrame, ctx: dict) -> DataFrame:
        step = F.col(weight_col) if weight_col else F.lit(1)
        return e.join(
            state.select(F.col("vid").alias("src"), "value"), "src"
        ).select("dst", (F.col("value") + step).alias("msg"))

    def apply_fn(state: DataFrame, agg: DataFrame, ctx: dict) -> DataFrame:
        joined = state.join(agg.withColumnRenamed("dst", "vid"), "vid", "left")
        improved = F.col("agg").isNotNull() & (
            F.col("value").isNull() | (F.col("agg") < F.col("value"))
        )
        return joined.select(
            "vid",
            F.when(improved, F.col("agg")).otherwise(F.col("value")).alias("value"),
            improved.alias("active"),
        )

    res = eng.run(
        init, scatter=scatter, combiner="min", apply_fn=apply_fn,
        frontier=True, max_iter=max_iter, algo="bfs_incremental",
    )
    if engine is None:
        eng.close()
    return res


def run_bfs_decremental(
    edges: DataFrame,
    deleted_edges: DataFrame,
    prev_state: DataFrame,
    root: int,
    max_iter: int = 10_000,
    weight_col: str | None = None,
    checkpoint_dir: str | None = None,
    engine_kwargs: dict | None = None,
) -> SuperstepResult:
    """IncEval for BFS/SSSP under edge DELETIONS — the non-monotone
    direction (deletions can only LENGTHEN paths; see run_wcc_decremental
    for the WCC analog; the reference's IncEval is additions-only).
    Deletions match on the directed (src, dst) pair; parallel arcs between
    a deleted pair are all removed.

    Three localized phases, each ∝ the damage, not |E| (the
    Ramalingam-Reps shape as joins):
    1. support-loss seeds — dst vertices of deleted edges that were TIGHT
       (prev[src] + w == prev[dst]): only their distances can be stale;
    2. affected closure — forward reachability of the seeds over the
       REMAINING graph (conservative: a vertex whose old shortest path ran
       through any stale vertex is downstream of it by definition). One
       semi-join + anti-join per round, rounds = affected-region depth;
    3. re-convergence — unaffected distances are provably still exact (any
       path of theirs using a deleted edge would put them in the closure;
       deletions cannot shorten paths), so min-plus re-runs with the
       frontier seeded ONLY at the unaffected boundary (vertices with an
       edge into the affected region) plus the root; affected vertices
       restart from NULL and receive correct distances, or stay NULL if
       now unreachable.

    Exactly equals run_bfs(remaining).state — batch semantics throughout,
    including vertex existence (a vertex losing its last edge has no row).
    """
    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    dele_keys = deleted_edges.select("src", "dst").distinct()
    # persist: the closure loop below semi-joins against `remaining` every
    # round — without this the E-row anti-join recomputes per round (the
    # same reason run_wcc_decremental persists its canonical base table)
    remaining = (
        edges.select(*cols)
        .join(dele_keys, ["src", "dst"], "left_anti")
        .persist()
    )
    prev = prev_state.select("vid", "value")
    w = F.col(weight_col) if weight_col else F.lit(1)

    # 1. tight deleted edges -> stale dst seeds
    dele_full = edges.select(*cols).join(dele_keys, ["src", "dst"], "left_semi")
    seeds = (
        dele_full.join(
            prev.select(F.col("vid").alias("src"), F.col("value").alias("_du")), "src"
        )
        .join(
            prev.select(F.col("vid").alias("dst"), F.col("value").alias("_dv")), "dst"
        )
        .filter(
            F.col("_du").isNotNull()
            & F.col("_dv").isNotNull()
            & ((F.col("_du") + w) == F.col("_dv"))
        )
        .select(F.col("dst").alias("vid"))
        .distinct()
    )

    # 2. forward closure over the remaining graph
    visited = seeds.persist()
    visited.count()
    frontier = visited
    for _ in range(max_iter):
        nxt = (
            remaining.join(
                frontier.withColumnRenamed("vid", "src"), "src", "left_semi"
            )
            .select(F.col("dst").alias("vid"))
            .distinct()
            .join(visited, "vid", "left_anti")
            .persist()
        )
        if nxt.count() == 0:
            nxt.unpersist()
            break
        grown = visited.unionAll(nxt).persist()
        grown.count()
        if frontier is not visited:  # round 1's frontier IS visited
            frontier.unpersist()
        visited.unpersist()
        visited, frontier = grown, nxt

    eng = SuperstepEngine(remaining, checkpoint_dir=checkpoint_dir,
                          **(engine_kwargs or {}))
    affected = visited.withColumn("_aff", F.lit(True))
    boundary = (
        eng.edges.join(
            visited.withColumnRenamed("vid", "dst"), "dst", "left_semi"
        )
        .select(F.col("src").alias("vid"))
        .distinct()
        .withColumn("_b", F.lit(True))
    )
    init = (
        eng.vertices()
        .join(prev.withColumnRenamed("value", "_prev"), "vid", "left")
        .join(affected, "vid", "left")
        .join(boundary, "vid", "left")
        .select(
            "vid",
            F.when(F.col("vid") == root, F.lit(0).cast("long"))
            .otherwise(
                F.when(F.col("_aff").isNotNull(), F.lit(None).cast("long"))
                .otherwise(F.col("_prev"))
            )
            .alias("value"),
            (
                (F.col("vid") == root)
                | (
                    F.col("_b").isNotNull()
                    & F.col("_aff").isNull()
                    & F.col("_prev").isNotNull()
                )
            ).alias("active"),
        )
    )

    def scatter(e: DataFrame, state: DataFrame, ctx: dict) -> DataFrame:
        step = F.col(weight_col) if weight_col else F.lit(1)
        return e.join(
            state.select(F.col("vid").alias("src"), "value"), "src"
        ).select("dst", (F.col("value") + step).alias("msg"))

    def apply_fn(state: DataFrame, agg: DataFrame, ctx: dict) -> DataFrame:
        joined = state.join(agg.withColumnRenamed("dst", "vid"), "vid", "left")
        improved = F.col("agg").isNotNull() & (
            F.col("value").isNull() | (F.col("agg") < F.col("value"))
        )
        return joined.select(
            "vid",
            F.when(improved, F.col("agg")).otherwise(F.col("value")).alias("value"),
            improved.alias("active"),
        )

    res = eng.run(
        init, scatter=scatter, combiner="min", apply_fn=apply_fn,
        frontier=True, max_iter=max_iter, algo="bfs_decremental",
    )
    if frontier is not visited:
        frontier.unpersist()
    visited.unpersist()
    remaining.unpersist()
    eng.close()
    return res
