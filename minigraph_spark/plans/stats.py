"""Graph statistics & degree operators.

Reference parity: J1 degree count (two atomic-add passes,
edge_cut_partitioner.h:94-117), A6 statistics aggregation
(tools/get_statistics.cpp:19-163), A8 distinct-vertex count via bitmap
popcount (get_statistics.cpp:71-90, bitmap.h:135-148). All are single
groupBy/agg plans — Catalyst's partial aggregation is the atomic-add.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("src").alias("vid")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )


def in_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("dst").alias("vid")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )


def degrees(edges: DataFrame) -> DataFrame:
    """(vid, in_degree, out_degree) — full outer merge of the two passes."""
    return (
        out_degrees(edges)
        .join(in_degrees(edges), "vid", "full_outer")
        .select(
            "vid",
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
        )
    )


def distinct_vertex_count(edges: DataFrame, approx: bool = False) -> DataFrame:
    v = edges.select(F.col("src").alias("vid")).unionAll(
        edges.select(F.col("dst").alias("vid"))
    )
    if approx:
        return v.agg(F.approx_count_distinct("vid").alias("num_vertices"))
    return v.distinct().agg(F.count(F.lit(1)).alias("num_vertices"))


def reciprocity(edges: DataFrame) -> DataFrame:
    """One row (n_edges, n_reciprocal, reciprocity): the fraction of
    distinct directed links (self-loops excluded) whose reverse link also
    exists — the standard directed-graph reciprocity (nx.reciprocity).
    On a transcript link graph this measures back-and-forth reference
    structure (A cites B and B cites A).

    Scale shape: one distinct (shuffle on (src,dst)) + one left-semi
    self-join against the reversed edge set (both sides hash-partition on
    the same composite key) — two shuffles, no iteration, no explode.
    """
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    n = e.count()
    if n == 0:
        e.unpersist()
        return edges.sparkSession.createDataFrame(
            [(0, 0, 0.0)], "n_edges long, n_reciprocal long, reciprocity double"
        )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    n_rec = e.join(rev, ["src", "dst"], "left_semi").count()
    e.unpersist()
    return edges.sparkSession.createDataFrame(
        [(n, n_rec, n_rec / n)],
        "n_edges long, n_reciprocal long, reciprocity double",
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """One row (assortativity): Pearson correlation of endpoint degrees over
    the symmetrized simple undirected closure — each undirected edge
    contributes both (deg_u, deg_v) and (deg_v, deg_u), the standard
    undirected convention (nx.degree_assortativity_coefficient; correlation
    is scale-invariant so sample vs population denominators cancel).

    Plan shape: one E-row dedup shuffle (closure), one V-row degree agg
    reused on both join sides, a single-pass co-moment aggregate (F.corr) —
    no quadratic stage; the degree table is V rows and broadcasts when
    small, shuffles co-partitioned when not."""
    canon = (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    und = canon.unionAll(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("vid")).agg(F.count(F.lit(1)).alias("deg"))
    joined = und.join(
        deg.select(F.col("vid").alias("src"), F.col("deg").alias("sdeg")), "src"
    ).join(deg.select(F.col("vid").alias("dst"), F.col("deg").alias("ddeg")), "dst")
    return joined.agg(F.corr("sdeg", "ddeg").alias("assortativity"))


def graph_statistics(edges: DataFrame) -> DataFrame:
    """One-row summary matching the reference's .statistic output fields
    (get_statistics.cpp:19-163): edge count, vertex count, max vid,
    max/avg in/out degree."""
    d = degrees(edges)
    deg_stats = d.agg(
        F.count(F.lit(1)).alias("num_vertices"),
        F.max("vid").alias("max_vid"),
        F.max("in_degree").alias("max_in_degree"),
        F.max("out_degree").alias("max_out_degree"),
        F.avg("in_degree").alias("avg_in_degree"),
        F.avg("out_degree").alias("avg_out_degree"),
    )
    num_edges = edges.agg(F.count(F.lit(1)).alias("num_edges"))
    return num_edges.crossJoin(deg_stats)


def degree_histogram(edges: DataFrame, log_base: float = 2.0) -> DataFrame:
    """(bucket, n_vertices, min_degree, max_degree): log-binned histogram
    of undirected degrees over the simple closure — the power-law sanity
    plot every link-graph report opens with. bucket = floor(log_b(deg));
    degree-0 vertices cannot appear (every vertex here has an edge).

    One E-row canonicalize + V-row degree agg + ~log(max_deg)-row result;
    all map-side combinable."""
    from ..operators.project import canonicalize

    canon = canonicalize(edges)
    deg = (
        canon.select(F.explode(F.array("src", "dst")).alias("vid"))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    if log_base == 2.0:
        # exact integer floor(log2): binary-digit count, no float logs —
        # log(8)/log(2) floats can land just under 3.0 and mis-bucket the
        # exact powers of two (and differently per engine)
        bucket = (
            F.length(F.conv(F.col("deg").cast("string"), 10, 2)) - 1
        ).cast("long")
    else:
        bucket = F.floor(
            F.log(F.lit(float(log_base)), F.col("deg").cast("double"))
        ).cast("long")
    return (
        deg.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.min("deg").alias("min_degree"),
            F.max("deg").alias("max_degree"),
        )
    )


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    exact: bool = False,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """(group, q<NN> ...): quantiles of ``value_col`` per group — the
    per-event-type latency/value percentile readout of an events pipeline.

    Default (exact=False) uses `approx_percentile` (Greenwald-Khanna
    sketch, O(accuracy) reducer memory per group regardless of group size)
    — the only default that survives the 100-TB shape of this table: a
    handful of event types over 10^12 rows puts ~10^11 doubles of ONE
    group on one reducer under the exact aggregate, a guaranteed OOM
    (ADVICE/VERDICT r4). approx_accuracy trades memory for error: rank
    error <= n/accuracy rows (10k => p99 of a 10^9-row group lands within
    +-0.01% of true rank).

    exact=True restores Spark's `percentile` aggregate — EXACT linear
    interpolation matching ANSI quantile_cont bit-for-bit on the same
    doubles, which is what a SQL oracle checks; reducer memory is then
    O(group size), so reserve it for bounded groups (the driver face runs
    it at sf scale)."""
    if exact:
        aggs = [
            F.round(
                F.expr(f"percentile({value_col}, {q})"), 6
            ).alias(f"q{int(q * 100):02d}")
            for q in quantiles
        ]
    else:
        aggs = [
            F.round(
                F.expr(
                    f"approx_percentile({value_col}, {q}, {approx_accuracy})"
                ).cast("double"),
                6,
            ).alias(f"q{int(q * 100):02d}")
            for q in quantiles
        ]
    return df.groupBy(group_col).agg(*aggs, F.count(F.lit(1)).alias("n"))


def rich_club(edges: DataFrame, max_k: int | None = None) -> DataFrame:
    """(k, n_nodes, n_edges, phi) for k = 0 .. max_degree-1 over the simple
    undirected closure — the rich-club connectivity curve (Zhou &
    Mondragon 2004): n_nodes = vertices of degree > k, n_edges = closure
    edges with BOTH endpoints of degree > k, phi = 2*n_edges /
    (n_nodes*(n_nodes-1)), NULL when fewer than two qualifying vertices.
    The standard "do hubs preferentially wire to hubs" census of a link
    graph (the un-normalized curve; divide by a degree-preserving random
    baseline to de-bias, which needs graph randomization, not a plan).

    Scale shape: everything aggregates BEFORE the per-k expansion — one
    E-row closure dedup, one V-row degree agg, one E-row min-endpoint-
    degree join, then two tiny histograms (<= distinct-degree rows). The
    per-k sums are theta-joins of the k-grid against those broadcast
    histograms: map-side, no shuffle, O(max_k * distinct_degrees) work.
    Pass ``max_k`` to cap the grid on graphs with mega-degree hubs (the
    curve's tail above the 2nd-highest degree is degenerate anyway:
    n_nodes <= 1)."""
    from ..operators.project import canonicalize

    canon = canonicalize(edges)
    deg = (
        canon.select(F.explode(F.array("src", "dst")).alias("vid"))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    em = (
        canon.join(
            deg.select(F.col("vid").alias("src"), F.col("deg").alias("_sd")),
            "src",
        )
        .join(
            deg.select(F.col("vid").alias("dst"), F.col("deg").alias("_dd")),
            "dst",
        )
        .select(F.least("_sd", "_dd").alias("m"))
    )
    vhist = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("nv"))
    ehist = em.groupBy("m").agg(F.count(F.lit(1)).alias("ne"))
    top = deg.agg(F.max("deg").alias("mx")).collect()[0]["mx"]
    if top is None:
        return edges.sparkSession.createDataFrame(
            [], "k long, n_nodes long, n_edges long, phi double"
        )
    hi = min(top - 1, max_k) if max_k is not None else top - 1
    spark = edges.sparkSession
    ks = spark.range(0, hi + 1).select(F.col("id").alias("k"))
    nk = (
        ks.join(F.broadcast(vhist), vhist.deg > F.col("k"), "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("nv"), F.lit(0)).alias("n_nodes"))
    )
    ek = (
        ks.join(F.broadcast(ehist), ehist.m > F.col("k"), "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("ne"), F.lit(0)).alias("n_edges"))
    )
    phi = F.when(
        F.col("n_nodes") >= 2,
        F.round(
            (F.lit(2) * F.col("n_edges")).cast("double")
            / (F.col("n_nodes") * (F.col("n_nodes") - 1)).cast("double"),
            6,
        ),
    )
    return nk.join(ek, "k").select("k", "n_nodes", "n_edges", phi.alias("phi"))
