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
