"""PageRank — two variants (SURVEY.md §2.4 semantics note).

variant="standard": classic damped PageRank — alpha=0.85, out-degree
normalized contributions, teleport, dangling mass redistributed uniformly,
synchronous power iteration to max|Δ| <= tol.

variant="minigraph": the reference's literal float-space rule
(apps/cpp/pr_vc.cpp:33-63): next(v) = gamma * mean(rank of in-neighbors),
update only when (rank-next)^2 > epsilon, init rank=1. (The reference
additionally truncates to unsigned on write — pr_vc.cpp:52; we keep floats
per the survey's resolution, since the truncation is an artifact of its
32-bit vdata storage, not query semantics.)

Both are synchronous Jacobi sweeps: every superstep recomputes from the full
state (frontier=False), ONE sum-shuffle per iteration, hub dst keys salted.
The dangling-mass scalar (standard variant) piggybacks on the engine's
per-iteration counts action via extra_agg — the Aggregate-hook analog
(auto_app_base.h:56-63) at zero extra Spark jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.superstep import SuperstepEngine, SuperstepResult


def run_pagerank(
    edges: DataFrame,
    variant: str = "standard",
    alpha: float = 0.85,
    gamma: float = 0.01,
    epsilon: float = 0.001,
    tol: float = 1e-6,
    max_iter: int = 200,
    fuse: int = 1,
    checkpoint_dir: str | None = None,
    engine_kwargs: dict | None = None,
    engine: SuperstepEngine | None = None,
    init_ranks: DataFrame | None = None,
    personalize: list[int] | None = None,
    weight_col: str | None = None,
) -> SuperstepResult:
    """Returns state (vid, value=rank). standard ranks sum to 1.

    Pass ``personalize`` (a small seed-vertex list, embedded as a literal
    IN-list — the random-walk-with-restart face used for link-graph
    relevance around known-good pages): teleport and dangling mass then
    flow to the seeds uniformly instead of to all vertices, and the walk
    starts at the seeds. Standard variant only.

    Pass ``engine`` to reuse an already-partitioned SuperstepEngine across
    runs — the one-time prepartition/heavy-hitter cost (the analog of the
    reference's graph_partition_exec step, tools/graph_partition.cpp:98-134)
    then amortizes over every run on the same graph.

    Pass ``init_ranks`` (vid, value — e.g. a previous run's state or a
    checkpoint snapshot) to warm-start the standard variant across graph
    versions — the IncEval-style face for PageRank (the power iteration
    converges to the same damped fixpoint from ANY positive start, so a
    near-fixpoint start just needs far fewer sweeps; new vertices seed at
    1/n and the vector is renormalized to sum 1 in-plan).
    """
    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    eng = engine or SuperstepEngine(
        edges.select(*cols), checkpoint_dir=checkpoint_dir, **(engine_kwargs or {})
    )
    if weight_col is not None and variant != "standard":
        raise ValueError("weight_col applies to the standard variant only")
    verts = eng.vertices()

    if personalize is not None and (
        variant != "standard"
        or not personalize
        or len(set(personalize)) != len(personalize)
    ):
        raise ValueError(
            "personalize requires the standard variant and a non-empty, "
            "duplicate-free seed list (p normalizes by len(seeds))"
        )

    if variant == "standard":
        # weighted mode: contributions split by edge weight / total
        # out-weight instead of 1 / out-degree (weighted PageRank, the
        # natural rule when transcript links carry multiplicities); the
        # dangling test (outdeg NULL) is unchanged
        if weight_col is not None:
            # a source whose weights sum to <= 0 cannot split rank mass
            # (value / outdeg would be Inf/NaN and propagate silently) —
            # treat it as dangling (outdeg NULL), the same rule an
            # out-degree-0 vertex gets in unweighted mode (ADVICE r3)
            _w_tot = F.sum(F.col(weight_col).cast("double"))
            outdeg = eng.edges.groupBy("src").agg(
                F.when(_w_tot > 0.0, _w_tot).alias("outdeg")
            )
        else:
            outdeg = eng.edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
        # clamp: an empty edge table has zero vertices; the loop then
        # converges immediately on the empty state instead of dividing by 0
        n = max(verts.count(), 1)
        # teleport distribution: uniform 1/n, or concentrated on the seeds.
        # p is an expression over vid (literal IN-list), re-evaluated inside
        # apply each sweep — WSCG-side, no extra join or state column.
        if personalize is not None:
            p_of = lambda vid_col: F.when(  # noqa: E731
                vid_col.isin(personalize), F.lit(1.0 / len(personalize))
            ).otherwise(F.lit(0.0))
        else:
            p_of = lambda vid_col: F.lit(1.0 / n)  # noqa: E731
        if init_ranks is not None:
            seeded = verts.join(
                init_ranks.select("vid", F.col("value").alias("_prev")), "vid", "left"
            ).select("vid", F.coalesce("_prev", F.lit(1.0 / n)).alias("_r"))
            # renormalize in-plan (1-row broadcast, same device as the
            # dangling-mass scalar): vertex churn across graph versions
            # leaves the carried-over mass summing to != 1
            total = seeded.agg(F.sum("_r").alias("_t"))
            start_val = F.col("_r") / F.col("_t")
            seeded = seeded.crossJoin(F.broadcast(total))
        else:
            seeded = verts.select("vid", p_of(F.col("vid")).alias("_r"))
            start_val = F.col("_r")
        init = (
            seeded.join(outdeg.withColumnRenamed("src", "vid"), "vid", "left")
            .select(
                "vid",
                start_val.alias("value"),
                F.lit(True).alias("active"),
                F.col("outdeg").cast("double").alias("outdeg"),
            )
        )

        def scatter(e: DataFrame, state: DataFrame, ctx: dict) -> DataFrame:
            contrib = state.filter(F.col("outdeg").isNotNull()).select(
                F.col("vid").alias("src"), (F.col("value") / F.col("outdeg")).alias("c")
            )
            joined = e.join(contrib, "src")
            if weight_col is not None:
                return joined.select(
                    "dst",
                    (F.col("c") * F.col(weight_col).cast("double")).alias("msg"),
                )
            return joined.select("dst", F.col("c").alias("msg"))

        def apply_fn(state: DataFrame, agg: DataFrame, ctx: dict) -> DataFrame:
            # dangling mass IN-PLAN: sum of rank over out-degree-0 vertices,
            # read from the (cached, V-row) state — NOT 1 - sum(messages),
            # which would re-evaluate the whole E-row scatter+combine subtree
            # a second time per superstep (Catalyst's exchange reuse does not
            # fire across the salted two-phase agg). A 1-row broadcast cross
            # join keeps the scalar inside the plan: no driver collect per
            # superstep, which is what makes iteration fusion possible.
            total = state.filter(F.col("outdeg").isNull()).agg(
                F.sum("value").alias("_dangling")
            )
            dangling = F.coalesce(F.col("_dangling"), F.lit(0.0))
            if personalize is not None:
                p = p_of(F.col("vid"))
                new_val = (
                    F.lit(1 - alpha) * p
                    + F.lit(alpha)
                    * (F.coalesce(F.col("agg"), F.lit(0.0)) + dangling * p)
                )
            else:
                # keep the uniform-teleport arithmetic EXACTLY as before
                # ((1-alpha)/n folded driver-side): the 6-dp oracles are
                # bit-sensitive to re-associating these float ops
                new_val = (
                    F.lit((1 - alpha) / n)
                    + F.lit(alpha)
                    * (F.coalesce(F.col("agg"), F.lit(0.0)) + dangling / n)
                )
            return (
                state.join(agg.withColumnRenamed("dst", "vid"), "vid", "left")
                .crossJoin(F.broadcast(total))
                .select(
                    "vid",
                    new_val.alias("value"),
                    (F.abs(new_val - F.col("value")) > tol).alias("active"),
                    "outdeg",
                )
            )

        res = eng.run(
            init, scatter=scatter, combiner="sum", apply_fn=apply_fn,
            frontier=False, max_iter=max_iter, fuse=fuse, algo="pagerank",
        )
        if engine is None:
            eng.close()  # free owned edge blocks; caller-passed engines live on
        return res

    if variant == "minigraph":
        if init_ranks is not None:
            raise ValueError(
                "init_ranks warm start applies to the standard variant only "
                "(the minigraph rule's epsilon-gate freezes near-fixpoint "
                "states rather than refining them)"
            )
        indeg = eng.edges.groupBy("dst").agg(F.count(F.lit(1)).alias("indeg"))
        init = (
            verts.join(indeg.withColumnRenamed("dst", "vid"), "vid", "left")
            .select(
                "vid",
                F.lit(1.0).alias("value"),
                F.lit(True).alias("active"),
                F.col("indeg").cast("double").alias("indeg"),
            )
        )

        def scatter_mg(e: DataFrame, state: DataFrame, ctx: dict) -> DataFrame:
            return e.join(
                state.select(F.col("vid").alias("src"), "value"), "src"
            ).select("dst", F.col("value").alias("msg"))

        def apply_mg(state: DataFrame, agg: DataFrame, ctx: dict) -> DataFrame:
            nxt = F.when(
                F.col("indeg").isNotNull(),
                F.lit(gamma) * F.col("agg") / F.col("indeg"),
            ).otherwise(F.col("value"))
            changed = (F.col("value") - nxt) * (F.col("value") - nxt) > F.lit(epsilon)
            return (
                state.join(agg.withColumnRenamed("dst", "vid"), "vid", "left")
                .select(
                    "vid",
                    F.when(changed, nxt).otherwise(F.col("value")).alias("value"),
                    changed.alias("active"),
                    "indeg",
                )
            )

        res = eng.run(
            init, scatter=scatter_mg, combiner="sum", apply_fn=apply_mg,
            frontier=False, max_iter=max_iter, fuse=fuse,
            algo="pagerank_minigraph",
        )
        if engine is None:
            eng.close()
        return res

    raise ValueError(f"unknown variant {variant!r}")
