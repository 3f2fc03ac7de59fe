"""Neighbor feature aggregation — the GraphSAGE-style mean aggregator
(training-pipeline x graph bridging op; no reference app. The builder's
brief mandates the operations a large-scale training-data pipeline runs:
GNN feature propagation — average your neighbors' embedding vectors — is
the canonical one that needs BOTH the edge table and the embedding
column).

Scale shape: one E-row join (features side is V-row, broadcast-able when
the feature table is a dimension; otherwise a co-partitioned shuffle) +
one combine whose per-dimension AVG aggregates collapse map-side. The
vector is statically unrolled into `dim` scalar aggregates — WSCG-friendly
JVM expressions, no UDF, no explode shuffle of E x dim rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def neighbor_feature_mean(
    edges: DataFrame,
    features: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(vid, m00..m{dim-1}): per-dimension mean of the feature vectors of
    each vertex's IN-neighbors (edges src -> dst aggregate src features at
    dst — the message-passing direction). Vertices whose in-neighbors have
    no feature rows are absent (inner join semantics)."""
    if dim is None:
        row = features.select(F.size(vec_col).alias("d")).first()
        dim = int(row["d"]) if row else 0
    joined = edges.select("src", "dst").join(
        features.select(
            F.col(id_col).alias("src"), F.col(vec_col).alias("_v")
        ),
        "src",
    )
    aggs = [
        F.avg(F.element_at(F.col("_v"), i + 1)).alias(f"m{i:02d}")
        for i in range(dim)
    ]
    return (
        joined.groupBy("dst")
        .agg(*aggs)
        .withColumnRenamed("dst", "vid")
    )
