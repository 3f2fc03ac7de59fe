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


def _unit_rows(m: "np.ndarray") -> "np.ndarray":
    """Row-normalize, guarding all-zero rows (norm clamped to 1e-12): a
    zero vector scores sim 0.0 against everything instead of propagating
    0/0 = NaN — which Spark's descending sort would rank FIRST (NaN
    compares greatest). Note the guarantee's limit (ADVICE r5): a 0.0 sim
    never outranks a non-negative-sim neighbor, but when a query has fewer
    than k neighbors with sim >= 0, a zero corpus row CAN still enter its
    top-k (0.0 outranks negative sims). The HOF face (cosine_sim) keeps
    the raw IEEE semantics for oracle parity; at 100-TB corpus scale
    broken/empty embedding rows are a when, not an if, so the vectorized
    serving paths take the defensive branch."""
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


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
    qn = _unit_rows(qm)
    kk = int(k)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["neighbor_id"].to_numpy(np.int64)
            v = np.array(list(pdf["cv"]), dtype=np.float64)
            v = _unit_rows(v)
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
    vectorized: bool = False,
) -> DataFrame:
    """(vec_id, table, bucket) — sign-bit LSH buckets from seeded random
    hyperplanes, one bucket per hash table (band-OR multi-table LSH: a
    candidate pair needs to collide in ANY table, boosting recall the same
    way MinHash banding does).

    Default path: planes are generated driver-side (seeded, deterministic)
    and embedded as array literals, dots evaluated JVM-side — the
    SQL-oracle-reproducible face. That evaluation is an interpreted
    higher-order-function chain per (row, table, plane), measured ~7 us per
    dot: fine at fixture scale, ~50 min for 16 tables x 10 planes over 10^7
    vectors. vectorized=True computes ALL table/plane dots as ONE BLAS
    matmul per Arrow batch (measured ~40x faster at 10^6 vectors) — same
    planes, same semantics; only summation order differs, so a dot within
    float ulp of 0 could land in the sibling bucket (irrelevant for ANN
    recall, but keep the default for bit-exact oracle comparison)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim))
    if vectorized:
        import pandas as pd

        pm = planes.reshape(num_tables * num_planes, dim).T.copy()  # (d, T*p)
        weights = (1 << np.arange(num_planes, dtype=np.int64))

        def bucketize(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                ids = pdf["vec_id"].to_numpy(np.int64)
                v = np.array(list(pdf["cv"]), dtype=np.float64)
                bits = (v @ pm) > 0  # (n, T*p)
                b = bits.reshape(len(ids), num_tables, num_planes) @ weights
                yield pd.DataFrame(
                    {
                        "vec_id": np.repeat(ids, num_tables),
                        "table": np.tile(
                            np.arange(num_tables, dtype=np.int32), len(ids)
                        ),
                        "bucket": b.reshape(-1).astype(np.int64),
                    }
                )

        return embeddings.select(
            F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("cv")
        ).mapInPandas(bucketize, schema="vec_id long, table int, bucket long")
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
    vectorized: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates are corpus vectors colliding with the
    query in ANY of `num_tables` hyperplane hash tables (band-OR), deduped,
    then exactly scored. Expected candidate fraction per table is
    1/2^num_planes; recall grows with num_tables. Same output schema as
    cosine_topk; recall is tested on fixtures, not assumed. vectorized=True
    selects the BLAS bucketing path (see hyperplane_buckets) — the 10^7+
    corpus setting; the default stays SQL-oracle-reproducible."""
    eb = hyperplane_buckets(embeddings, num_planes, dim, seed, id_col, vec_col,
                            num_tables, vectorized=vectorized)
    qb = hyperplane_buckets(queries, num_planes, dim, seed, id_col, vec_col,
                            num_tables, vectorized=vectorized)
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
    vectorized: bool = False,
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

    vectorized: assign corpus cells via one BLAS distance matmul per Arrow
    batch instead of the num_centroids-literal argmin expression — the
    literal path is an interpreted HOF chain costing O(centroids*dim) per
    row (the 10^7-corpus wall); same argmin-with-smaller-cid tie rule, only
    float summation order differs (default stays oracle-reproducible)."""
    train = (
        embeddings
        if train_fraction is None
        else embeddings.sample(fraction=train_fraction, seed=7)
    )
    cents = ivf_centroids(train, num_centroids, iters, id_col, vec_col)
    cv = _as_double(F.col(vec_col))
    if vectorized:
        import pandas as pd

        cm = np.array([ws for _, ws in cents], dtype=np.float64)  # (C, d)
        cids = np.array([cid for cid, _ in cents], dtype=np.int64)
        cn2 = (cm * cm).sum(axis=1)

        def assign(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                v = np.array(list(pdf["cv"]), dtype=np.float64)
                # ||v-c||^2 = |v|^2 - 2 v.c + |c|^2; |v|^2 constant per row
                d2 = cn2[None, :] - 2.0 * (v @ cm.T)
                pick = cids[np.argmin(d2, axis=1)]  # np.argmin: first
                # (= smallest cid, cents sorted) wins ties, matching the
                # literal struct-lexicographic rule
                out = pdf[["neighbor_id", "cv"]].copy()
                out["cid"] = pick
                yield out

        corpus = (
            embeddings.select(
                F.col(id_col).alias("neighbor_id"), cv.alias("cv")
            ).mapInPandas(
                assign,
                schema="neighbor_id long, cv array<double>, cid long",
            )
        )
    else:
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


def ivf_build(
    embeddings: DataFrame,
    index_path: str,
    num_centroids: int = 1024,
    train_fraction: float | None = 0.01,
    iters: int = 5,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Build a partitioned IVF index: train a coarse quantizer, assign every
    corpus vector to its nearest cell via one BLAS matmul per Arrow batch,
    and write the corpus parquet PARTITIONED BY cell id. Returns the
    (num_centroids x dim) float64 centroid matrix (persist it however you
    like; ivf_search takes it as an argument).

    This is the Spark-native IVF shape: the expensive part of ANN serving is
    *reading* the corpus, and a `partitionBy("cid")` layout turns nprobe
    cell probes into parquet PARTITION PRUNING — a search at nprobe/C = 1%
    physically scans ~1% of the bytes (verify with .explain: the cid filter
    lands in PartitionFilters, not PushedFilters). cosine_topk_ivf keeps
    the literal-expression face for SQL-oracle parity at fixture scale;
    this pair is the 10^7-and-up path.

    Training is driver-side Lloyd on a seeded `train_fraction` sample
    (collected: fraction*N*dim doubles — the standard bounded-sample
    training contract; pass None to collect ALL rows, small corpora only).
    Driver-memory formula: the collected sample costs about
    ``train_fraction * N * dim * 8`` bytes of driver heap (e.g. 10^9
    vectors x 64 dims at the 1% default is ~5 GB) — at large N set
    train_fraction from a budget, ``train_fraction <=
    driver_heap_bytes_available / (N * dim * 8)``, not from the default;
    a few hundred vectors per centroid is plenty for a coarse quantizer.
    k-means++-free deterministic init: num_centroids rows EVENLY SPACED in
    the id-sorted sample (smallest-first init degenerates when ids
    correlate with cluster structure — all seeds land in one cluster and
    cells come up empty). Empty cells keep their previous centroid."""
    samp = (
        embeddings
        if train_fraction is None
        else embeddings.sample(fraction=train_fraction, seed=seed)
    )
    rows = samp.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).orderBy("id").collect()
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    if len(x) < num_centroids:
        raise ValueError(
            f"training sample ({len(x)}) smaller than num_centroids "
            f"({num_centroids}); raise train_fraction"
        )
    cm = x[np.linspace(0, len(x) - 1, num_centroids).astype(int)].copy()
    for _ in range(iters):
        d2 = (cm * cm).sum(1)[None, :] - 2.0 * (x @ cm.T)
        a = np.argmin(d2, axis=1)
        for c in range(num_centroids):
            m = a == c
            if m.any():
                cm[c] = x[m].mean(axis=0)
    cm = cm.round(6)  # same bit-stability trick as ivf_centroids

    cn2 = (cm * cm).sum(axis=1)

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array(list(pdf["cv"]), dtype=np.float64)
            d2 = cn2[None, :] - 2.0 * (v @ cm.T)
            out = pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(np.int64),
                    "embedding": pdf["cv"],
                    "cid": np.argmin(d2, axis=1).astype(np.int64),
                }
            )
            yield out

    (
        embeddings.select(
            F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("cv")
        )
        .mapInPandas(assign, schema="vec_id long, embedding array<double>, cid long")
        # one shuffle so each cell is ONE file under its partition dir —
        # without it every write task emits a file per cell it touches
        # (tasks x cells small files, the classic partitionBy mistake)
        .repartition("cid")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(index_path)
    )
    return cm


def ivf_search(
    spark,
    index_path: str,
    centroids: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search an ivf_build index: each query probes its `nprobe` nearest
    cells; the scan reads ONLY those parquet partitions (cid IN (...) is a
    partition filter — pruning, not just pushdown), and scoring runs as one
    masked BLAS matmul per Arrow batch with per-partition partial top-k +
    one tiny window merge (the cosine_topk_matmul shape restricted to
    probed cells). Output schema matches cosine_topk."""
    q_rows = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).collect()
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    qm = np.array([r["qv"] for r in q_rows], dtype=np.float64)
    qn = _unit_rows(qm)
    d2 = (centroids * centroids).sum(1)[None, :] - 2.0 * (qm @ centroids.T)
    probe = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]  # (Q, nprobe)
    num_c = centroids.shape[0]
    # allowed[c, j] = query j probes cell c
    allowed = np.zeros((num_c, len(q_ids)), dtype=bool)
    for j in range(len(q_ids)):
        allowed[probe[j], j] = True
    cells = sorted({int(c) for row in probe for c in row})
    kk = int(k)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(np.int64)
            cid = pdf["cid"].to_numpy(np.int64)
            v = np.array(list(pdf["embedding"]), dtype=np.float64)
            v = _unit_rows(v)
            sims = v @ qn.T
            sims[~allowed[cid]] = -np.inf  # mask un-probed (row, query) pairs
            n, q = sims.shape
            take = min(kk + 1, n)
            part = np.argpartition(-sims, take - 1, axis=0)[:take]
            out_q, out_id, out_sim = [], [], []
            for j in range(q):
                rows = part[:, j]
                rows = rows[np.isfinite(sims[rows, j])]
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

    idx = spark.read.parquet(index_path).filter(F.col("cid").isin(cells))
    partial = idx.mapInPandas(
        score, schema="query_id long, neighbor_id long, sim double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        partial.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kk)
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
