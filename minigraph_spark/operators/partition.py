"""Partitioning, skew detection, and salted two-phase aggregation.

Maps the reference's partitioner family onto Spark:

- hash partition on src  = vertex-cut (reference:
  utility/paritioner/vertex_cut_partitioner.h:79-117) — Spark's hash shuffle.
- range partition on vid = edge-cut (edge_cut_partitioner.h:251-254).
- 2D (src,dst) grid      = 2DVC partitioner (2DVC_partitioner.h:84-202).
- split-the-heaviest-bucket skew handling (hybrid_cut_partitioner.h:162-260,
  edge_cut_partitioner.h:280-391) = explicit salting of hub keys in the
  combine: AQE's skew-join splitting covers joins but NOT aggregations, so
  the two-phase salted groupBy here is the custom piece the north rule calls
  "explicit skew splitting of hub vertices".

At 100 TB: heavy-hitter detection is one pass over the edge table (cheap,
done once, broadcast of the tiny hot-key set); the salted partial agg bounds
any single reducer's input to |edges(hot key)| / num_salts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (spark_agg_partial, spark_agg_final) per combiner name — partial runs on
# (key, salt) groups, final re-aggregates over key. All three reference
# combiners write_min/write_max/write_add (utility/atomic.h:30-55) map to
# algebraic Spark aggs, so two-phase is exact.
_COMBINERS = {
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
}


def heavy_hitters(
    edges: DataFrame, key: str = "dst", min_count: int | None = None, top_n: int = 64
) -> list[int]:
    """Find hub vertices: keys whose in-degree exceeds ``min_count``
    (default: 8x the mean degree), capped at ``top_n`` hottest.

    One aggregation pass; the result is tiny and meant to be embedded as a
    literal IN-list / broadcast. Mirrors the reference's
    GetBucketWithMaxSumOfDegree scan (edge_cut_partitioner.h:283-295) but per
    key instead of per bucket.
    """
    counts = edges.groupBy(key).count()
    if min_count is None:
        stats = counts.agg(
            F.avg("count").alias("avg"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        if stats["n"] == 0:
            return []
        min_count = max(int(stats["avg"] * 8), 1000)
    rows = (
        counts.filter(F.col("count") >= min_count)
        .orderBy(F.desc("count"))
        .limit(top_n)
        .collect()
    )
    return [r[key] for r in rows]


def make_salted_agg(
    key: str,
    value: str,
    combiner: str,
    hot_keys: list[int] | None,
    num_salts: int = 32,
    out: str = "agg",
):
    """Closure form of salted_agg with every Column expression prebuilt —
    for per-superstep use, where rebuilding the (loop-invariant) trees
    costs a py4j roundtrip per node every iteration. Identical plans."""
    partial, final = _COMBINERS[combiner]
    if not hot_keys:
        agg_col = partial(value).alias(out)
        return lambda df: df.groupBy(key).agg(agg_col)
    salt = F.when(
        F.col(key).isin(hot_keys),
        F.pmod(F.xxhash64(F.col(value).cast("string"), F.lit(17)), F.lit(num_salts)),
    ).otherwise(F.lit(0))
    partial_col = partial(value).alias("_partial")
    final_col = final("_partial").alias(out)

    def _agg(df: DataFrame) -> DataFrame:
        phase1 = (
            df.withColumn("_salt", salt)
            .groupBy(key, "_salt")
            .agg(partial_col)
        )
        return phase1.groupBy(key).agg(final_col)

    return _agg


def salted_agg(
    df: DataFrame,
    key: str,
    value: str,
    combiner: str,
    hot_keys: list[int] | None,
    num_salts: int = 32,
    out: str = "agg",
) -> DataFrame:
    """Two-phase aggregation with salting restricted to hub keys.

    Phase 1 groups by (key, salt) where salt spreads only hot keys (others
    get salt 0 — no extra fan-out for the long tail); phase 2 merges the
    per-salt partials. Exact for algebraic combiners; semantics identical to
    a plain ``groupBy(key).agg``.
    """
    return make_salted_agg(key, value, combiner, hot_keys, num_salts, out)(df)


def make_mode_agg(
    key: str,
    value: str,
    hot_keys: list[int] | None = None,
    num_salts: int = 32,
    out: str = "agg",
):
    """Closure form of mode_agg with prebuilt Column trees (same rationale
    as make_salted_agg). Identical plans."""
    # count per (key, value); salt spreads hot groups' MERGE work — counting
    # is algebraic so two-phase is exact over any salt. Unlike salted_agg's
    # value-hash (useless here: value is part of the phase-1 group key, so
    # hashing it can't split a hot (key, value) pair), the salt must vary
    # WITHIN the pair; hashing the map partition id does, costs one xxhash64
    # per row (same idiom as salted_agg:86), and caps phase-1 output at one
    # row per partition per pair — the per-row monotonically_increasing_id
    # salt emitted up to num_salts rows per partition per pair.
    if hot_keys:
        salt = F.when(
            F.col(key).isin(hot_keys),
            F.pmod(F.xxhash64(F.spark_partition_id(), F.lit(17)), F.lit(num_salts)),
        ).otherwise(F.lit(0))
        c_col = F.count(F.lit(1)).alias("_c")
        cnt_col = F.sum("_c").alias("cnt")
    else:
        cnt_col = F.count(F.lit(1)).alias("cnt")
    best_col = F.max(
        F.struct(F.col("cnt"), (-F.col(value)).alias("neg"))
    ).alias("_b")
    key_col = F.col(key)
    out_col = (-F.col("_b.neg")).alias(out)

    def _agg(df: DataFrame) -> DataFrame:
        base = df.select(key, value)
        if hot_keys:
            p1 = (
                base.withColumn("_salt", salt)
                .groupBy(key, value, "_salt")
                .agg(c_col)
            )
            counts = p1.groupBy(key, value).agg(cnt_col)
        else:
            counts = base.groupBy(key, value).agg(cnt_col)
        best = counts.groupBy(key).agg(best_col)
        return best.select(key_col, out_col)

    return _agg


def mode_agg(
    df: DataFrame,
    key: str,
    value: str,
    hot_keys: list[int] | None = None,
    num_salts: int = 32,
    out: str = "agg",
) -> DataFrame:
    """Most-frequent-value combiner (for classic LPA), ties broken by the
    smallest value — deterministic, matching the oracle.

    Not a Spark builtin with deterministic ties; built as salted
    count-by-(key,value) followed by a windowless argmax:
    max(struct(cnt, -value)) picks highest count then smallest value.
    The reference has no mode combiner (its LPA-analog uses write_min);
    SURVEY.md §2.4 derives LPA from the same skeleton.
    """
    return make_mode_agg(key, value, hot_keys, num_salts, out)(df)


def edge_cut_pid(vid: Column, num_vertices: int, k: int) -> Column:
    """Contiguous-range partition id, parity with the reference edge-cut
    assign rule gid = floor(vid / ceil(nv/k)) % k
    (edge_cut_partitioner.h:251-254)."""
    chunk = -(-num_vertices // k)  # ceil
    return F.pmod(F.floor(vid / F.lit(chunk)), F.lit(k)).cast("int")


def grid_pid_2d(src: Column, dst: Column, k1: int, k2: int) -> Column:
    """2D (src,dst) grid partition id (2DVC_partitioner.h:84-202)."""
    return (
        F.pmod(F.xxhash64(src), F.lit(k1)) * k2 + F.pmod(F.xxhash64(dst), F.lit(k2))
    ).cast("int")


def prepartition_edges(
    edges: DataFrame,
    num_partitions: int,
    by: str = "src",
    persist: bool = True,
    dedup: bool = False,
    count_obs=None,
) -> DataFrame:
    """Hash-repartition the edge table by ``by`` once and persist — the
    DataFrame analog of the reference's one-time graph_partition_exec step
    (tools/graph_partition.cpp:98-134). Amortizes the edge-side shuffle
    across all supersteps: the scatter join then reuses this partitioning.
    On a real cluster this is a bucketed table write instead.

    dedup=True folds an exact (src, dst) deduplication into the SAME
    exchange (guide §2.4 — two operations keyed compatibly share one
    shuffle): the table is hash-partitioned by ``by`` and sorted by
    (``by``, other) — equal edges land adjacent — and a zero-exchange
    lag-window filter keeps the first of each run. vs `.distinct()` +
    repartition this removes one full E-scale Exchange and stage barrier
    (the distinct's (src,dst)-hash shuffle), at the cost of sorting by one
    extra column the engine's scatter join doesn't need. (src, dst)-only
    tables, for consumers that dedup anyway (undirected closures, simple
    digraphs); the output rows are exactly ``edges.distinct()``.

    count_obs: an optional pyspark Observation; when given (requires
    persist=True), the output row count is attached as an observed metric
    (``count_obs.get["n"]``) and delivered by the checkpoint's own
    materialization job — saving the caller a separate full scan of the
    cached E rows (the SuperstepEngine size-aware-width count). The
    CollectMetrics node preserves the child's partitioning AND ordering,
    so the checkpoint still records both (verified: the scatter SMJ stays
    exchange-free and edge-side sort-free)."""
    if dedup:
        if set(edges.columns) != {"src", "dst"}:
            raise ValueError(
                f"dedup=True requires a (src, dst) table, got {edges.columns}"
            )
        from pyspark.sql import Window

        other = "dst" if by == "src" else "src"
        w = Window.partitionBy(by).orderBy(other)
        out = (
            edges.repartition(num_partitions, by)
            .sortWithinPartitions(by, other)
            .withColumn("_prev", F.lag(other).over(w))
            .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(other)))
            .select("src", "dst")
        )
    else:
        out = edges.repartition(num_partitions, by).sortWithinPartitions(by)
    if count_obs is not None:
        if not persist:
            raise ValueError("count_obs requires persist=True (needs the "
                             "checkpoint's materialization job)")
        out = out.observe(count_obs, F.count(F.lit(1)).alias("n"))
    if persist:
        # eager localCheckpoint rather than persist: it caches the blocks
        # AND replaces the logical subtree with a compact LogicalRDD leaf
        # (driver-side createDataFrame edges otherwise embed a LocalRelation
        # that every per-iteration analysis pass re-walks), while keeping
        # the hash partitioning + ordering visible to the scatter join.
        # MUST run with AQE off: under AdaptiveSparkPlanExec the checkpoint
        # records UnknownPartitioning and every later scatter join re-shuffles
        # the full edge table per superstep. The in-partition sort by `by`
        # makes the per-iteration sort-merge scatter join exchange-free AND
        # sort-free on the (big) edge side — only the (small) vertex-state
        # side is sorted each superstep.
        from pyspark import StorageLevel

        from ..session import iterative_confs

        with iterative_confs(edges.sparkSession):
            # Storage level is SIZE-ADAPTIVE, decided once at partition time
            # (the same decide-at-partition-time rule as the engine's
            # size-aware width). Deserialized blocks skip the per-superstep
            # deserialization of every E row — measured interleaved on the
            # 16M-edge bench graph: PageRank loop 21.8/17.4 -> 16.8/14.1 s,
            # setup 10.9/10.3 -> 7.8/8.4 s — but deserialized UnsafeRow
            # objects cost ~60-70 B/row and OOMed the 48g sandbox JVM at
            # 512M symmetrized edges (serialized packs ~3x denser), so big
            # graphs must stay serialized. The decision reads the
            # optimizer's pre-shuffle size estimate: parquet-backed edge
            # plans estimate from file bytes (accurate where it matters —
            # the at-scale graphs are parquet), and an unknown/huge
            # estimate fails SAFE to serialized. Budget default 2 GiB of
            # estimated input ≈ <=16 GB deserialized cache (~8x parquet
            # blowup); production sets MG_EDGE_DESER_MAX_BYTES from
            # executor_heap * safe_fraction / blowup, or pins
            # MG_EDGE_STORAGE=ser|deser explicitly.
            import os as _os

            _mode = _os.environ.get("MG_EDGE_STORAGE", "auto")
            if _mode == "deser":
                _lvl = StorageLevel.MEMORY_AND_DISK_DESER
            elif _mode == "ser":
                _lvl = StorageLevel.MEMORY_AND_DISK
            else:
                try:
                    _est = int(
                        out._jdf.queryExecution()
                        .optimizedPlan()
                        .stats()
                        .sizeInBytes()
                    )
                except Exception:
                    _est = 1 << 62  # unknown -> serialized (safe)
                _budget = int(
                    _os.environ.get("MG_EDGE_DESER_MAX_BYTES", str(2 << 30))
                )
                _lvl = (
                    StorageLevel.MEMORY_AND_DISK_DESER
                    if _est <= _budget
                    else StorageLevel.MEMORY_AND_DISK
                )
            out = out.localCheckpoint(eager=True, storageLevel=_lvl)
    return out


def border_vertices(edges: DataFrame, pid: Column) -> DataFrame:
    """Vertices present in >= 2 partitions under a pid assignment — the
    reference's border-vertex bitmap (immutable_csr.h:335-368) as a group-by
    over distinct (vertex, pid) pairs. Returns (vid, num_partitions)."""
    v_pid = (
        edges.select(F.col("src").alias("vid"), pid.alias("pid"))
        .unionAll(edges.select(F.col("dst").alias("vid"), pid.alias("pid")))
        .distinct()
    )
    return (
        v_pid.groupBy("vid")
        .agg(F.count(F.lit(1)).alias("num_partitions"))
        .filter(F.col("num_partitions") >= 2)
    )


def communication_matrix(edges: DataFrame, src_pid: Column, dst_pid: Column) -> DataFrame:
    """Partition-level dependency edges: distinct (pid_src, pid_dst) —
    the reference's k x k boolean communication matrix
    (edge_cut_partitioner.h:440-453), used there to shortcut loads."""
    return edges.select(src_pid.alias("pid_src"), dst_pid.alias("pid_dst")).distinct()
