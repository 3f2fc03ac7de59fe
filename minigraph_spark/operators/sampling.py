"""Graph sampling for training-data pipelines (no reference analog; the
GraphSAGE/node2vec-style neighbor-sampling face a 100 TB link graph needs
to emit GNN training examples).

Walks are DETERMINISTIC pseudo-random: the next hop from vertex v at step t
is the out-neighbor minimizing md5_int63(v || ':' || nbr || ':' || t) —
statistically uniform over neighbors per (v, t), yet exactly reproducible
across engines (functions/hashing.py's cross-checkable hash), so the
driver's DuckDB oracle can state every hop. A seeded true-random sampler
would be neither resumable nor oracle-checkable; determinism is the point
in a production pipeline (reruns emit identical training data).

Scale shape: the frontier is |seeds| rows — broadcast against the E-row
edge table every step, so each step is one broadcast join + a tiny argmin
aggregation; `steps` is small and bounded. No collect, no per-row driver
work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int63


def deterministic_walks(edges: DataFrame, seeds: list[int], steps: int) -> DataFrame:
    """(seed, step, vid) rows: one walk per seed, hops 0..steps.

    A walk reaching a sink (no out-edges) simply stops — no rows for later
    steps. Seeds are embedded as a literal frame (driver-provided query
    points, like ANN's query ids).
    """
    spark = edges.sparkSession
    w = spark.createDataFrame(
        [(int(s), int(s)) for s in seeds], "seed long, vid long"
    )
    out = w.select("seed", F.lit(0).alias("step"), "vid")
    e = edges.select("src", "dst")
    for t in range(1, steps + 1):
        hop = (
            F.broadcast(w)
            .join(e, w["vid"] == e["src"])
            .select(
                "seed",
                "dst",
                md5_int63(
                    F.concat_ws(":", F.col("vid"), F.col("dst"), F.lit(t))
                ).alias("h"),
            )
        )
        w = (
            hop.groupBy("seed")
            .agg(F.min(F.struct("h", "dst")).alias("_m"))
            .select("seed", F.col("_m.dst").alias("vid"))
        )
        out = out.unionAll(w.select("seed", F.lit(t).alias("step"), "vid"))
    return out


STRAT_SALT = "strat:"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    k: int,
    salt: str = STRAT_SALT,
) -> DataFrame:
    """(id, stratum, rank): deterministic per-stratum sample — the k rows
    of each stratum with the smallest md5_int63(salt || id), rank 1..k in
    hash order. The training-pipeline downsampling primitive: reproducible
    across runs/engines (no RNG state), stable under input reordering, and
    per-class balanced (each language/source/quality bucket contributes at
    most k rows regardless of its share of the corpus).

    Scale shape: one hash projection (JVM-side md5) + one per-stratum
    window. The window sort is per-stratum; a mega-stratum is the skew
    hazard, but the sort key is the 60-bit hash so AQE's skew splitting
    applies, and rank<=k lets Spark push a per-partition top-k limit when
    the stratum count is low. Ties on the hash (2^-60) break by id."""
    h = md5_int63(
        F.concat(F.lit(salt), F.col(id_col).cast("string"))
    ).alias("_h")
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy("_h", id_col)
    return (
        df.select(F.col(id_col), F.col(strata_col), h)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("_h")
    )
