"""DAG longest-path layering (beyond the reference's app suite; no
MiniGraph analog — the scheduling/critical-path primitive over acyclic
link structure: condensation bowties, conversation-flow DAGs, build
graphs).

layer(v) = length of the longest directed path ENDING at v (sources sit at
layer 0) — simultaneously a valid topological level assignment (every edge
goes strictly upward) and the per-vertex critical-path depth; max(layer)
is the DAG's longest path. Synchronous max-propagation: one hop per round,
converging in exactly depth(DAG) rounds, which on the transcript-shaped
inputs this engine targets (conversation chains, SCC condensations of web
bowties) is tens, not thousands. A non-DAG input never converges — the
``max_rounds`` guard raises rather than silently looping, making the
function double as a cycle detector.

Scale shape: per round one co-located scatter join (edges prepartitioned
by src once, the PageRank idiom) + one max-combine shuffle that collapses
map-side, + the V-row state merge; the changed-flag column rides the merge
so the stop check is a limit(1) probe of the already-materialized state,
not a recomputation. Round state is localCheckpoint'ed with
previous-round block freeing (ADVICE-r3 rule).

Cited reference shape: like pagerank_vc.cpp's sweep structure, but with a
monotone max payload and convergence-by-quiescence instead of fixed iters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.superstep import (
    free_rdd_ids,
    persistent_rdd_ids,
    tracked_local_checkpoint as ckpt,
)


def longest_path_layers(edges: DataFrame, max_rounds: int = 1000) -> DataFrame:
    """(vid, layer) for every endpoint of the edge table, which MUST be a
    DAG (self-loops rejected as trivial cycles). Raises RuntimeError when
    ``max_rounds`` sync rounds do not reach quiescence — for a true DAG
    that means max_rounds < depth; otherwise the input has a cycle."""
    from ..operators.partition import prepartition_edges
    from ..session import iterative_confs

    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    _pre = persistent_rdd_ids(spark)
    with iterative_confs(spark):
        e = prepartition_edges(edges.select("src", "dst"), n_part, by="src")
    edge_ids = persistent_rdd_ids(spark) - _pre

    verts = (
        e.select(F.col("src").alias("vid"))
        .union(e.select(F.col("dst").alias("vid")))
        .distinct()
    )
    st, st_ids = ckpt(verts.select("vid", F.lit(0).cast("long").alias("layer")))
    try:
        for _ in range(max_rounds):
            msg = (
                e.join(st.select(F.col("vid").alias("src"), "layer"), "src")
                .groupBy(F.col("dst").alias("vid"))
                .agg((F.max("layer") + 1).alias("_in"))
            )
            nxt, nxt_ids = ckpt(
                st.join(msg, "vid", "left").select(
                    "vid",
                    F.greatest(
                        "layer", F.coalesce("_in", F.lit(0))
                    ).alias("layer"),
                    (F.coalesce("_in", F.lit(0)) > F.col("layer")).alias("_chg"),
                )
            )
            changed = nxt.filter("_chg").limit(1).count()
            nxt = nxt.drop("_chg")
            free_rdd_ids(spark, st_ids)
            st, st_ids = nxt, nxt_ids
            if changed == 0:
                break
        else:
            # free BEFORE raising: a cycle-detect call must not pin the
            # prepartitioned edge copy + final round state for the session
            free_rdd_ids(spark, st_ids)
            st_ids = set()
            raise RuntimeError(
                f"no quiescence within {max_rounds} rounds — input has a "
                "cycle or max_rounds < DAG depth"
            )
    finally:
        free_rdd_ids(spark, edge_ids)
    # st stays pinned: its blocks back the returned DataFrame (same
    # contract as run_ktruss/run_scc)
    return st.select("vid", "layer")
