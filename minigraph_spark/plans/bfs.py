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
) -> SuperstepResult:
    """Returns state (vid, value=distance); unreachable vertices have NULL."""
    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    eng = SuperstepEngine(edges.select(*cols), checkpoint_dir=checkpoint_dir,
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
    eng.close()
    return res
