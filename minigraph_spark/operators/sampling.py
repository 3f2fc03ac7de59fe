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
from .superstep import free_rdd_ids, persistent_rdd_ids


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


NEG_SALT = "neg:"


def negative_edge_samples(
    edges: DataFrame, k: int, num_candidates: int | None = None
) -> DataFrame:
    """(vid, neg_vid, rank): up to k deterministic NON-neighbor samples per
    vertex — the contrastive-training counterpart of deterministic_walks
    (positive pairs from walks, negatives from here; both reproducible
    across runs AND engines via the md5 idiom, so a training set can be
    regenerated bit-identically from the raw graph).

    Candidate j of vertex v targets the vertex whose compaction-dense id is
    md5_int63('neg:' || v || ':' || j) % |V|; self-targets and true
    neighbors (either direction) are rejected, surviving targets dedupe to
    their smallest j, and the k smallest-j survivors win (rank 1..k, j
    order). Vertices whose ``num_candidates`` (default 4k) candidates all
    collide/reject yield fewer than k rows — deterministically.

    Scale shape: dense ids come from compaction.compact_ids_scalable (one
    range shuffle + an Arrow prefix-sum pass — the same rank-by-vid mapping
    as the vertex_compaction plan WITHOUT its single-partition window sort,
    ADVICE-r4); candidates are V x m rows built in-row (explode of a
    literal range), then one join onto the dense map, one edge anti-join
    (both hash-partitioned), and a per-vertex top-k window. No RNG state,
    no driver-side loops."""
    from pyspark.sql import Window

    from .compaction import compact_ids_scalable

    m = num_candidates or 4 * k
    verts = (
        edges.select(F.col("src").alias("vid"))
        .unionAll(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
    verts = verts.persist()
    n_verts = verts.count()
    # compact_ids_scalable returns its mapping persisted; track the block
    # ids so they can be freed once the samples are materialized below
    before = persistent_rdd_ids(edges.sparkSession)
    dense = compact_ids_scalable(verts).withColumnRenamed("dense_id", "_dense")
    dense_blocks = persistent_rdd_ids(edges.sparkSession) - before
    cand = (
        verts.select("vid", F.explode(F.array(*[F.lit(j) for j in range(1, m + 1)])).alias("j"))
        .select(
            "vid", "j",
            F.pmod(
                md5_int63(
                    F.concat_ws(
                        "", F.lit(NEG_SALT), F.col("vid").cast("string"),
                        F.lit(":"), F.col("j").cast("string"),
                    )
                ),
                F.lit(n_verts),
            ).alias("_dense"),
        )
        .join(dense.withColumnRenamed("vid", "neg_vid"), "_dense")
        .filter(F.col("neg_vid") != F.col("vid"))
    )
    # reject true neighbors in either direction
    canon = edges.select(
        F.least("src", "dst").alias("_a"), F.greatest("src", "dst").alias("_b")
    ).distinct()
    keyed = cand.select(
        "vid", "j", "neg_vid",
        F.least("vid", "neg_vid").alias("_a"),
        F.greatest("vid", "neg_vid").alias("_b"),
    )
    non_edges = keyed.join(canon, ["_a", "_b"], "left_anti")
    best = (
        non_edges.groupBy("vid", "neg_vid")
        .agg(F.min("j").alias("_jmin"))
    )
    w = Window.partitionBy("vid").orderBy("_jmin")
    out = (
        best.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vid", "neg_vid", "rank")
    )
    out = out.persist()
    out.count()
    verts.unpersist()
    free_rdd_ids(edges.sparkSession, dense_blocks)
    return out
