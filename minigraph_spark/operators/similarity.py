"""Similarity search over an embedding column (vec_id, embedding:array<float>).

Brute-force cosine top-k is the exact baseline (SQL-oracle-checkable);
the LSH-bucketed variant (random hyperplane signs) is the scale path —
candidates are generated only within matching buckets, turning O(n*m) into
O(n*m/2^planes) expected. Embedding dot products stay JVM-side via
zip_with/aggregate on double arrays (no per-row Python).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_sim(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, sim, rank) — exact brute-force top-k cosine.

    `queries` is broadcast (it is the small side by construction); the
    corpus streams. rank is dense by (sim desc, neighbor_id asc) —
    deterministic under ties.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine_sim(F.col("qv"), F.col("cv")).alias("sim"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def cosine_topk_matmul(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k cosine, vectorized: the SCALE path of
    cosine_topk. Same contract and output schema ((query_id, neighbor_id,
    sim, rank), rank dense by (sim desc, neighbor_id asc)), but the scoring
    runs as one BLAS matmul per Arrow batch instead of a per-row-pair
    zip_with/aggregate chain — measured ~2 orders of magnitude faster at a
    10^7-vector corpus (the HOF path evaluates O(n*q) interpreted
    higher-order calls; this path does the same flops as (n x d)@(d x q)
    inside NumPy).

    Queries are collected to the driver (the same small-side contract as
    cosine_topk's broadcast: q rows, q*d doubles) and shipped to every
    partition inside the mapInPandas closure; each corpus partition emits
    only its LOCAL top-k per query (<= partitions*q*k rows), and one final
    q-partitioned window takes the global top-k — the classic
    partial-topk/merge shape, no q*n shuffle ever materializes."""
    q_rows = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).collect()
    if not q_rows:
        schema = "query_id long, neighbor_id long, sim double, rank int"
        return embeddings.sparkSession.createDataFrame([], schema)
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    qm = np.array([r["qv"] for r in q_rows], dtype=np.float64)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    kk = int(k)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["neighbor_id"].to_numpy(np.int64)
            v = np.array(list(pdf["cv"]), dtype=np.float64)
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            sims = v @ qn.T  # (n_batch, q)
            n, q = sims.shape
            take = min(kk + 1, n)  # +1 absorbs a possible self-match
            # argpartition per query column, then exact order within the slice
            part = np.argpartition(-sims, take - 1, axis=0)[:take]
            out_q, out_id, out_sim = [], [], []
            for j in range(q):
                rows = part[:, j]
                order = rows[np.lexsort((ids[rows], -sims[rows, j]))]
                out_q.append(np.full(len(order), q_ids[j], dtype=np.int64))
                out_id.append(ids[order])
                out_sim.append(sims[order, j])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_id),
                    "sim": np.concatenate(out_sim),
                }
            )

    partial = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).mapInPandas(score, schema="query_id long, neighbor_id long, sim double")
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        partial.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kk)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def hyperplane_buckets(
    embeddings: DataFrame,
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 1,
) -> DataFrame:
    """(vec_id, table, bucket) — sign-bit LSH buckets from seeded random
    hyperplanes, one bucket per hash table (band-OR multi-table LSH: a
    candidate pair needs to collide in ANY table, boosting recall the same
    way MinHash banding does).

    Planes are generated driver-side (seeded, deterministic) and embedded as
    array literals — they are tiny (num_tables x num_planes x dim doubles),
    so the dot products run inside whole-stage codegen, no UDF, no join.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim))
    v = _as_double(F.col(vec_col))
    per_table = []
    for t in range(num_tables):
        bucket = F.lit(0)
        for i in range(num_planes):
            plane = F.array(*[F.lit(float(x)) for x in planes[t, i]])
            dot = F.aggregate(
                F.zip_with(v, plane, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
        per_table.append(F.struct(F.lit(t).alias("table"), bucket.alias("bucket")))
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.explode(F.array(*per_table)).alias("tb"),
    ).select("vec_id", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates are corpus vectors colliding with the
    query in ANY of `num_tables` hyperplane hash tables (band-OR), deduped,
    then exactly scored. Expected candidate fraction per table is
    1/2^num_planes; recall grows with num_tables. Same output schema as
    cosine_topk; recall is tested on fixtures, not assumed."""
    eb = hyperplane_buckets(embeddings, num_planes, dim, seed, id_col, vec_col, num_tables)
    qb = hyperplane_buckets(queries, num_planes, dim, seed, id_col, vec_col, num_tables)
    cand = (
        eb.withColumnRenamed("vec_id", "neighbor_id")
        .join(F.broadcast(qb.withColumnRenamed("vec_id", "query_id")), ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", cosine_sim(F.col("qv"), F.col("cv")).alias("sim"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def embedding_cosine_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    num_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_a, vec_b, sim) — embedding-cosine near-duplicate pairs, the
    scale path: candidates are pairs colliding in ANY hyperplane hash table
    (band-OR LSH via hyperplane_buckets — bucketed, no quadratic stage),
    then exactly scored and thresholded. Recall follows the standard LSH
    curve (1 - (1 - p^planes)^tables with p = 1 - angle/pi); tune
    num_planes/num_tables per threshold. Deterministic given the seed."""
    b = hyperplane_buckets(embeddings, num_planes, dim, seed, id_col, vec_col, num_tables)
    cand = (
        b.select(F.col("vec_id").alias("vec_a"), "table", "bucket")
        .join(b.select(F.col("vec_id").alias("vec_b"), "table", "bucket"), ["table", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    a = embeddings.select(F.col(id_col).alias("vec_a"), _as_double(F.col(vec_col)).alias("va"))
    c = embeddings.select(F.col(id_col).alias("vec_b"), _as_double(F.col(vec_col)).alias("vb"))
    return (
        cand.join(a, "vec_a")
        .join(c, "vec_b")
        .select("vec_a", "vec_b", cosine_sim(F.col("va"), F.col("vb")).alias("sim"))
        .filter(F.col("sim") >= threshold)
        .select("vec_a", "vec_b", F.round("sim", 6).alias("sim"))
    )


def _l2_sq(v, cent_lit):
    return F.aggregate(
        F.zip_with(v, cent_lit, lambda x, w: (x - w) * (x - w)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_centroids(
    embeddings: DataFrame,
    num_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """[(cid, [w...])] — deterministic IVF coarse quantizer: initial
    centroids are the `num_centroids` rows with smallest id (reproducible in
    any engine, no RNG), refined by `iters` Lloyd rounds whose updated
    centroids are ROUNDed to 6 decimals. The quantization makes the
    centroids — and therefore every assignment — bit-stable across engines
    (Spark vs the DuckDB oracle), the same trick the LSH oracles use for
    plane literals. Empty clusters are dropped (both engines agree: a
    cluster with no members produces no AVG row).

    Each Lloyd round is one map-side-combinable groupBy(cid) with columnar
    per-dimension sums (no row explosion) — an O(N*dim) scan whose
    num_centroids*dim result is collected to the driver
    (tiny, like the 1-row extra_agg scalars). At 100 TB you train on a
    sample (embeddings.sample) and raise num_centroids toward sqrt(N); the
    assignment pass below stays literal math inside whole-stage codegen.
    """
    v = _as_double(F.col(vec_col))
    cents = [
        (i, [float(x) for x in row["cv"]])
        for i, row in enumerate(
            embeddings.select(F.col(id_col).alias("id"), v.alias("cv"))
            .orderBy("id")
            .limit(num_centroids)
            .collect()
        )
    ]
    dim = len(cents[0][1])
    for _ in range(iters):
        assign = _ivf_assign_expr(cents, v)
        # columnar per-dimension means (one map-side-combinable groupBy, no
        # posexplode row blowup); ROUND(sum/count, 6) == the oracle's
        # ROUND(AVG, 6) and both engines tie-round away from zero
        new_rows = (
            embeddings.select(assign.alias("cid"), v.alias("_v"))
            .groupBy("cid")
            .agg(*[
                F.round(F.sum(F.col("_v")[j]) / F.count(F.lit(1)), 6).alias(f"w{j}")
                for j in range(dim)
            ])
            .collect()
        )
        cents = sorted(
            (r["cid"], [r[f"w{j}"] for j in range(dim)]) for r in new_rows
        )
    return cents


def _ivf_assign_expr(cents, v):
    """argmin_{cid} ||v - centroid_cid||^2 as a literal sort_array pick —
    ties break toward the smaller cid (struct lexicographic order)."""
    scored = [
        F.named_struct(
            F.lit("d"), _l2_sq(v, F.array(*[F.lit(w) for w in ws])),
            F.lit("cid"), F.lit(cid),
        )
        for cid, ws in cents
    ]
    return F.sort_array(F.array(*scored))[0]["cid"]


def cosine_topk_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_centroids: int = 8,
    iters: int = 2,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_fraction: float | None = None,
) -> DataFrame:
    """IVF-bucketed approximate top-k cosine — the partition-pruned scale
    path alongside cosine_topk_lsh. The corpus is assigned to
    `num_centroids` Voronoi cells (literal-centroid argmin, no join, no
    UDF); each query probes its `nprobe` nearest cells and exactly scores
    only those candidates, reading an expected nprobe/num_centroids
    fraction of the corpus. nprobe = num_centroids degrades to exact
    brute force (tested, not assumed). Same output schema as cosine_topk.

    train_fraction: sample this (seeded, deterministic) fraction of the
    corpus for the Lloyd centroid-training scans only — the 100-TB knob the
    ivf_centroids docstring prescribes (training is O(iters*N*d); quantizer
    quality needs only a representative sample). None (the oracle face)
    trains on the full corpus. Assignment/probing always covers ALL rows.
    """
    train = (
        embeddings
        if train_fraction is None
        else embeddings.sample(fraction=train_fraction, seed=7)
    )
    cents = ivf_centroids(train, num_centroids, iters, id_col, vec_col)
    cv = _as_double(F.col(vec_col))
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        cv.alias("cv"),
        _ivf_assign_expr(cents, cv).alias("cid"),
    )
    probes = [
        F.named_struct(
            F.lit("d"), _l2_sq(F.col("qv"), F.array(*[F.lit(w) for w in ws])),
            F.lit("cid"), F.lit(cid),
        )
        for cid, ws in cents
    ]
    q = queries.select(F.col(id_col).alias("query_id"), cv.alias("qv")).select(
        "query_id",
        "qv",
        F.explode(
            F.slice(F.sort_array(F.array(*probes)), 1, nprobe)
        ).alias("probe"),
    ).select("query_id", "qv", F.col("probe.cid").alias("cid"))
    scored = (
        corpus.join(F.broadcast(q), "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_sim(F.col("qv"), F.col("cv")).alias("sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def embedding_cosine_dup_pairs_exact(
    embeddings: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs verifier for embedding_cosine_dup_pairs — O(n^2)
    by construction, for sampled/bucketed validation use only."""
    a = embeddings.select(F.col(id_col).alias("vec_a"), _as_double(F.col(vec_col)).alias("va"))
    b = embeddings.select(F.col(id_col).alias("vec_b"), _as_double(F.col(vec_col)).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine_sim(F.col("va"), F.col("vb")).alias("sim"))
        .filter(F.col("sim") >= threshold)
        .select("vec_a", "vec_b", F.round("sim", 6).alias("sim"))
    )
