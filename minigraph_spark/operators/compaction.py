"""Dense vertex-id compaction (J12).

Reference: tools/compacted_graph.cpp:75-119 — remap arbitrary ids to dense
0..n-1 preserving topology (there: mutex-guarded first-seen numbering; here:
deterministic rank order, which the reference's ordering is not — ours is
reproducible by design).

Two strategies:
- `compact_ids_window`: dense_rank over a global order — correct and simple,
  but the window has no partition key, so Catalyst plans a single-partition
  sort: fine for dimension-sized id sets, wrong at 10^12 ids.
- `compact_ids_scalable`: the 100 TB path — one range shuffle + an
  Arrow-batched per-partition pass. No single-task sort, no RDD API, no
  per-row Python: (1) range-repartition + sort within partitions, (2) count
  rows per partition (a tiny P-row aggregate collected once), (3) assign
  dense ids inside mapInPandas from the broadcast prefix-sum offsets plus a
  running intra-partition counter. Range partition ids are ordered by key
  range, so offsets[pid] + local position IS the global rank.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def compact_ids_scalable(
    vids: DataFrame, id_col: str = "vid", num_partitions: int | None = None
) -> DataFrame:
    """Same output as compact_ids_window without a single-partition sort —
    PROVIDED ids are distinct (pass distinct_vertices output, as every
    caller here does). On duplicate ids the two differ: the window variant
    dense_ranks (duplicates share one dense_id) while this positional path
    gives each row its own id and emits the duplicates; dedup first if your
    id set can repeat.

    Two passes over a persisted range-partitioned sort: pass 1 counts rows
    per partition (P rows to the driver — the only collect, O(partitions)
    not O(rows)); pass 2 emits (vid, dense_id) via a vectorized Arrow batch
    pass that adds the partition's prefix-sum offset to a running counter.
    The intermediate is persisted so both passes see the SAME range
    boundaries (RangePartitioner samples), then freed after the result is
    materialized. Result comes back persisted (V rows).
    """
    spark = vids.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = (
        vids.select(F.col(id_col).alias("vid"))
        .repartitionByRange(p, "vid")
        .sortWithinPartitions("vid")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["_pid"]: r["n"]
        for r in part.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    def assign(batches):
        running = 0
        for pdf in batches:
            if not len(pdf):
                continue
            base = offsets[int(pdf["_pid"].iloc[0])]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "vid": pdf["vid"].to_numpy(np.int64),
                    "dense_id": np.arange(base + running, base + running + n, dtype=np.int64),
                }
            )
            running += n

    out = part.mapInPandas(assign, schema="vid long, dense_id long").persist()
    out.count()
    part.unpersist()
    return out.select(F.col("vid").alias(id_col), "dense_id")


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
