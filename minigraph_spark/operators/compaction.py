"""Dense vertex-id compaction (J12).

Reference: tools/compacted_graph.cpp:75-119 — remap arbitrary ids to dense
0..n-1 preserving topology (there: mutex-guarded first-seen numbering; here:
deterministic rank order, which the reference's ordering is not — ours is
reproducible by design).

Two strategies:
- `compact_ids_window`: dense_rank over a global order — correct and simple,
  but the window has no partition key, so Catalyst plans a single-partition
  sort: fine for dimension-sized id sets, wrong at 10^12 ids.
- `compact_ids_scalable`: distributed sort + zipWithIndex — one total-order
  range shuffle, then per-partition offset arithmetic; no single-task
  bottleneck. This is the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distinct_vertices(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("vid"))
        .unionAll(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )


def compact_ids_window(vids: DataFrame, id_col: str = "vid") -> DataFrame:
    """(vid, dense_id) with dense_id = 0-based rank by vid order."""
    w = Window.orderBy(id_col)
    return vids.select(
        F.col(id_col), (F.row_number().over(w) - 1).cast("long").alias("dense_id")
    )


def compact_ids_scalable(vids: DataFrame, id_col: str = "vid") -> DataFrame:
    """Same output as compact_ids_window without a single-partition sort:
    sortWithinPartitions after a range repartition, then zipWithIndex."""
    sorted_df = vids.select(id_col).repartitionByRange(F.col(id_col)).sortWithinPartitions(id_col)
    schema = "vid long, dense_id long"
    rdd = sorted_df.rdd.map(lambda r: r[0]).zipWithIndex()
    return sorted_df.sparkSession.createDataFrame(rdd, schema=schema)


def rewrite_edges_dense(edges: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite (src, dst) through the dense mapping — two dimension joins
    (the reference does two hash-map lookups per edge)."""
    m_src = mapping.select(F.col("vid").alias("src"), F.col("dense_id").alias("new_src"))
    m_dst = mapping.select(F.col("vid").alias("dst"), F.col("dense_id").alias("new_dst"))
    return (
        edges.join(m_src, "src")
        .join(m_dst, "dst")
        .select(F.col("new_src").alias("src"), F.col("new_dst").alias("dst"))
    )
