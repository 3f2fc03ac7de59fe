"""Edge-list sources & sinks (SURVEY.md §2.1 S1-S11 parity).

The reference hand-rolls chunked CSV parsers and binary blob formats
(utility/io/edge_list_io_adapter.h:113-560, csr_io_adapter.h:232-489);
Spark's readers replace all of them — what remains worth owning is the
schema contract, the self-loop/dedup policy, and the catalog layout.

Format mapping:
- CSV src,dst (S1-S3)        -> read_edge_csv (schema-pinned, parallel by split)
- binary COO pairs (S4)      -> parquet edge table read/write
- CSR bin blob (S5-S6)       -> parquet vertices/edges; per-partition CSR is
                                rebuilt inside Arrow UDFs, never stored
- workspace catalog (S9-S10) -> the checkpoint dir layout (checkpoint.py)
- Ligra AdjacencyGraph text (S11) -> write_adjacency_text
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_SCHEMA = "src LONG, dst LONG"


def read_edge_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    header: bool = False,
    drop_self_loops: bool = True,
) -> DataFrame:
    """CSV edge-list scan (S1-S3: the single/parallel/batch readers collapse
    into one — Spark parallelizes by file split natively). Self-loop policy
    matches the reference partitioner (edge_cut_partitioner.h:103)."""
    df = (
        spark.read.option("sep", sep)
        .option("header", str(header).lower())
        .schema(EDGE_SCHEMA)
        .csv(path)
    )
    return df.filter(F.col("src") != F.col("dst")) if drop_self_loops else df


def write_edges_parquet(edges: DataFrame, path: str, buckets: int | None = None) -> None:
    """Edge sink (S4 analog). With `buckets`, pre-hash the src column into a
    pid partition column so re-reads start co-located for the scatter join —
    the durable analog of prepartition_edges (on a real catalog this is a
    bucketed/Iceberg write)."""
    if buckets:
        (
            edges.withColumn("pid", F.pmod(F.xxhash64("src"), F.lit(buckets)).cast("int"))
            .repartition(buckets, "pid")
            .write.mode("overwrite")
            .partitionBy("pid")
            .parquet(path)
        )
    else:
        edges.write.mode("overwrite").parquet(path)


def read_edges_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).select("src", "dst")


def write_adjacency_text(edges: DataFrame, path: str) -> None:
    """Ligra-style AdjacencyGraph text sink (S11 parity:
    tools/graph_convert.cpp:169-201): per-src sorted adjacency as
    'src: n1 n2 ...' lines."""
    adj = (
        edges.groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
        .select(
            F.concat_ws(
                " ",
                F.concat(F.col("src").cast("string"), F.lit(":")),
                F.concat_ws(" ", F.transform("nbrs", lambda x: x.cast("string"))),
            ).alias("value")
        )
    )
    adj.write.mode("overwrite").text(path)


# --- ETL projections (P8-P10 parity: tools/types_convert.cpp,
# tools/python/{replace_sep,sampling}.py) --------------------------------
def retype_ids(edges: DataFrame, dtype: str = "long") -> DataFrame:
    """Vid re-type projection (P8)."""
    return edges.select(
        F.col("src").cast(dtype).alias("src"), F.col("dst").cast(dtype).alias("dst")
    )


def sample_edges(edges: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Edge sampling (P10 analog) — the scale-path default: df.sample is
    fully distributed (per-partition Bernoulli, no count job, no single-task
    funnel). Row count is approximate (~fraction*n)."""
    return edges.sample(fraction=fraction, seed=seed)


def sample_head_fraction(edges: DataFrame, fraction: float) -> DataFrame:
    """Literal head-fraction sampling (P10 parity: tools/python/sampling.py
    keeps the FIRST r*n rows). Driver-count + limit — `limit` funnels
    through one task at scale, so this is the literal-parity shim only;
    sample_edges is the default for anything big."""
    n = edges.count()
    return edges.limit(int(fraction * n))


def batch_convert_edgelists(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    in_format: str = "csv",
    out_format: str = "parquet",
    sep: str = ",",
    out_sep: str = ",",
    drop_self_loops: bool = True,
    buckets: int | None = None,
) -> DataFrame:
    """Batch-over-directory conversion driver (parity:
    tools/batch_graph_convert.cpp:16-33 BatchEdgeList2EdgeList — parallel
    read of every edge-list file under src_pt, one merged binary write).

    Spark's readers already parallelize over all files in a directory/glob,
    so the whole batch driver collapses to one read + one write; what this
    owns is the format dispatch and the policy knobs (separator, self-loop
    drop, bucketed binary layout). Returns the converted edge DataFrame.

    in_format:  'csv' (src<sep>dst lines) | 'parquet'
    out_format: 'parquet' (binary-edge analog, optionally bucketed S4 layout)
                | 'csv' | 'adjacency_text' (Ligra S11 sink)
    """
    if in_format == "csv":
        edges = read_edge_csv(spark, src_path, sep=sep, drop_self_loops=drop_self_loops)
    elif in_format == "parquet":
        edges = read_edges_parquet(spark, src_path)
        if drop_self_loops:
            edges = edges.filter(F.col("src") != F.col("dst"))
    else:
        raise ValueError(f"unsupported in_format: {in_format!r}")
    if out_format == "parquet":
        write_edges_parquet(edges, dst_path, buckets=buckets)
    elif out_format == "csv":
        edges.write.mode("overwrite").option("sep", out_sep).csv(dst_path)
    elif out_format == "adjacency_text":
        write_adjacency_text(edges, dst_path)
    else:
        raise ValueError(f"unsupported out_format: {out_format!r}")
    return edges


def rewrite_separator(
    spark: SparkSession, in_path: str, out_path: str, in_sep: str, out_sep: str
) -> None:
    """Separator rewrite (P9 parity: tools/python/replace_sep.py) — read with
    one sep, write with another."""
    df = spark.read.option("sep", in_sep).schema(EDGE_SCHEMA).csv(in_path)
    df.write.mode("overwrite").option("sep", out_sep).csv(out_path)
