"""Link prediction over the undirected simple closure — common-neighbor
counts and Adamic-Adar scoring (link_graph-tier op; no reference app — the
reference stops at structural counts, get_statistics.cpp:19-163, and the
builder's brief mandates the analytics a link-graph user runs on top).

Scale shape: scoring fans each center vertex w out into its deg(w)^2/2
candidate pairs (the classic wedge materialization — exactly what the
triangle counter avoids, but here the PAIRS are the output, so they must
exist as rows). Two knobs bound it at 100 TB:

- ``center_buckets``: hash-chunk the wedge join by center vertex, one
  bucket's join in flight at a time — peak shuffle/spill drops to ~1/B
  while the pair sums stay exact (each pair's contribution from center w
  lands wholly in w's bucket; partials re-aggregate by (u, v)). Same
  pattern as triangles.per_vertex_triangles(src_buckets=...).
- ``max_center_degree``: drop centers above a degree cap. APPROXIMATE when
  set (documented, off by default): a celebrity hub that half the graph
  links to contributes ~1/ln(deg) ~= 0 per pair but deg^2 wedge rows; the
  standard production trade (same reasoning as LSH banding for dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .triangles import oriented_edges


def _center_table(canon: DataFrame, max_center_degree: int | None) -> DataFrame:
    """(w, n, wt): undirected adjacency with the center's Adamic-Adar weight
    1/ln(deg(w)). Centers with deg < 2 close no pair and are dropped (also
    keeps ln(1) = 0 out of the divisor)."""
    und = canon.unionAll(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("w")).agg(F.count(F.lit(1)).alias("deg"))
    keep = deg.filter(F.col("deg") >= 2)
    if max_center_degree is not None:
        keep = keep.filter(F.col("deg") <= max_center_degree)
    return und.select(F.col("src").alias("w"), F.col("dst").alias("n")).join(
        keep.select("w", (1.0 / F.log("deg")).alias("wt")), "w"
    )


def _pair_partials(ctr: DataFrame) -> DataFrame:
    """(u, v, cn, aa) partial sums from one center slice: the wedge self-join
    through w, each unordered pair emitted once (n_low < n_high)."""
    a = ctr.select("w", F.col("n").alias("u"), "wt")
    b = ctr.select("w", F.col("n").alias("v"))
    return (
        a.join(b, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cn"), F.sum("wt").alias("aa"))
    )


def adamic_adar(
    edges: DataFrame,
    top_k: int | None = None,
    center_buckets: int = 1,
    max_center_degree: int | None = None,
) -> DataFrame:
    """(u, v, common_neighbors, aa_score[, rank]) for NON-adjacent unordered
    pairs u < v sharing >= 1 common neighbor in the simple undirected
    closure; aa_score = sum over common neighbors w of 1/ln(deg(w)).

    top_k gives the global best-k predictions with a total deterministic
    order (round(aa, 6) desc, then u, v) and a rank column; without it, all
    scored pairs. Per-source top-k is a window away for callers that want
    recommendation lists instead of a global edge shortlist."""
    canon = oriented_edges(edges, by_degree=False, materialize=True)
    ctr = _center_table(canon, max_center_degree)
    if center_buckets > 1:
        ctr = ctr.persist()
        ctr.count()
        bucket = F.pmod(F.xxhash64("w"), F.lit(center_buckets))
        partials = []
        for bkt in range(center_buckets):
            pb = _pair_partials(ctr.filter(bucket == bkt)).persist()
            pb.count()  # sequential: one bucket's wedge join in flight
            partials.append(pb)
        merged = partials[0]
        for pb in partials[1:]:
            merged = merged.unionAll(pb)
        scored = merged.groupBy("u", "v").agg(
            F.sum("cn").alias("cn"), F.sum("aa").alias("aa")
        )
    else:
        scored = _pair_partials(ctr)
    out = scored.join(canon, (scored["u"] == canon["src"]) & (scored["v"] == canon["dst"]),
                      "left_anti").select(
        "u", "v",
        F.col("cn").cast("long").alias("common_neighbors"),
        F.col("aa").alias("aa_score"),
    )
    if top_k is not None:
        from pyspark.sql import Window

        # orderBy().limit(k) compiles to TakeOrderedAndProject — a
        # distributed per-partition top-k + driver merge, NOT a global sort;
        # the row_number window then ranks only the k survivors.
        out = out.orderBy(F.round("aa_score", 6).desc(), "u", "v").limit(top_k)
        w = Window.orderBy(F.round("aa_score", 6).desc(), "u", "v")
        out = out.withColumn("rank", F.row_number().over(w))
    out = out.persist()
    out.count()
    if center_buckets > 1:
        for pb in partials:
            pb.unpersist()
        ctr.unpersist()
    canon.unpersist()
    return out
