"""Link prediction over the undirected simple closure — common-neighbor
counts, Adamic-Adar, resource-allocation, Jaccard, and preferential-
attachment scoring (link_graph-tier op; no reference app — the reference
stops at structural counts, get_statistics.cpp:19-163, and the builder's
brief mandates the analytics a link-graph user runs on top).

Scale shape: scoring fans each center vertex w out into its deg(w)^2/2
candidate pairs (the classic wedge materialization — exactly what the
triangle counter avoids, but here the PAIRS are the output, so they must
exist as rows). Two knobs bound it at 100 TB:

- ``center_buckets``: hash-chunk the wedge join by center vertex, one
  bucket's join in flight at a time — peak shuffle/spill drops to ~1/B
  while the pair sums stay exact (each pair's contribution from center w
  lands wholly in w's bucket; partials re-aggregate by (u, v)). Same
  pattern as triangles.per_vertex_triangles(src_buckets=...).
- ``max_center_degree``: drop centers above a degree cap — ON BY DEFAULT
  (DEFAULT_MAX_CENTER_DEGREE = 1000; pass None for the exact uncapped
  pass). Unlike triangles, where the quadratic wedge volume rides inside
  row arrays, here each wedge IS a shuffled pair row: one 10^5-degree hub
  center emits ~10^10 rows at web scale, so uncapped defaults are a scale
  hazard (VERDICT r3; the same skew motivation as the reference's
  hybrid-cut split, utility/paritioner/hybrid_cut_partitioner.h:162-260).
  The recall trade is tiny and documented: a center of degree d adds only
  1/ln(d) (AA) / 1/d (RA) per pair — at the cap that is 0.145 / 0.001 per
  common neighbor, and hub-only pairs are the least informative
  predictions (everybody links the hub). Measured on the 20%-hub fixture
  (tests/test_lpa_bfs_triangles.py::test_adamic_adar_hub_cap_default and
  the BASELINE.md linkpred row): the capped pass is wedge-linear while the
  uncapped pass is center-quadratic. Oracles mirror the cap exactly, so
  capped results stay bit-reproducible (not a sampling approximation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .triangles import oriented_edges

# deg^2/2 pair rows per center: 1000 caps any single center at <= ~500k
# rows (a normal task's work) while 1/ln(1000) keeps per-pair score loss
# marginal; see module docstring for the measured A/B.
DEFAULT_MAX_CENTER_DEGREE = 1000


def _center_table(canon: DataFrame, max_center_degree: int | None) -> DataFrame:
    """(w, n, wt, rwt): undirected adjacency with the center's Adamic-Adar
    weight 1/ln(deg(w)) and resource-allocation weight 1/deg(w). Centers
    with deg < 2 close no pair and are dropped (also keeps ln(1) = 0 out of
    the divisor)."""
    und = canon.unionAll(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("w")).agg(F.count(F.lit(1)).alias("deg"))
    keep = deg.filter(F.col("deg") >= 2)
    if max_center_degree is not None:
        keep = keep.filter(F.col("deg") <= max_center_degree)
    return und.select(F.col("src").alias("w"), F.col("dst").alias("n")).join(
        keep.select(
            "w",
            (1.0 / F.log("deg")).alias("wt"),
            (1.0 / F.col("deg")).alias("rwt"),
        ),
        "w",
    )


def _pair_partials(ctr: DataFrame) -> DataFrame:
    """(u, v, cn, aa, ra) partial sums from one center slice: the wedge
    self-join through w, each unordered pair emitted once (n_low < n_high)."""
    a = ctr.select("w", F.col("n").alias("u"), "wt", "rwt")
    b = ctr.select("w", F.col("n").alias("v"))
    return (
        a.join(b, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum("wt").alias("aa"),
            F.sum("rwt").alias("ra"),
        )
    )


def _scored_nonadjacent(
    canon: DataFrame, center_buckets: int, max_center_degree: int | None
) -> tuple[DataFrame, list[DataFrame]]:
    """(scored non-adjacent pairs (u, v, cn, aa, ra), persisted
    intermediates for the caller to unpersist after materializing)."""
    ctr = _center_table(canon, max_center_degree)
    held: list[DataFrame] = []
    if center_buckets > 1:
        ctr = ctr.persist()
        ctr.count()
        held.append(ctr)
        bucket = F.pmod(F.xxhash64("w"), F.lit(center_buckets))
        partials = []
        for bkt in range(center_buckets):
            pb = _pair_partials(ctr.filter(bucket == bkt)).persist()
            pb.count()  # sequential: one bucket's wedge join in flight
            partials.append(pb)
        held.extend(partials)
        merged = partials[0]
        for pb in partials[1:]:
            merged = merged.unionAll(pb)
        scored = merged.groupBy("u", "v").agg(
            F.sum("cn").alias("cn"),
            F.sum("aa").alias("aa"),
            F.sum("ra").alias("ra"),
        )
    else:
        scored = _pair_partials(ctr)
    nonadj = scored.join(
        canon,
        (scored["u"] == canon["src"]) & (scored["v"] == canon["dst"]),
        "left_anti",
    )
    return nonadj, held


def _rank_top_k(out: DataFrame, order_col: str, top_k: int) -> DataFrame:
    from pyspark.sql import Window

    # orderBy().limit(k) compiles to TakeOrderedAndProject — a distributed
    # per-partition top-k + driver merge, NOT a global sort; the row_number
    # window then ranks only the k survivors.
    out = out.orderBy(F.round(order_col, 6).desc(), "u", "v").limit(top_k)
    w = Window.orderBy(F.round(order_col, 6).desc(), "u", "v")
    return out.withColumn("rank", F.row_number().over(w))


def adamic_adar(
    edges: DataFrame,
    top_k: int | None = None,
    center_buckets: int = 1,
    max_center_degree: int | None = DEFAULT_MAX_CENTER_DEGREE,
) -> DataFrame:
    """(u, v, common_neighbors, aa_score[, rank]) for NON-adjacent unordered
    pairs u < v sharing >= 1 common neighbor in the simple undirected
    closure; aa_score = sum over common neighbors w of 1/ln(deg(w)).

    top_k gives the global best-k predictions with a total deterministic
    order (round(aa, 6) desc, then u, v) and a rank column; without it, all
    scored pairs. Per-source top-k is a window away for callers that want
    recommendation lists instead of a global edge shortlist.

    Centers above ``max_center_degree`` (default 1000) are excluded from
    the wedge pass — the skew guard; pass None for the exact uncapped
    semantics (see module docstring for the quadratic-volume rationale)."""
    canon = oriented_edges(edges, by_degree=False, materialize=True)
    nonadj, held = _scored_nonadjacent(canon, center_buckets, max_center_degree)
    out = nonadj.select(
        "u", "v",
        F.col("cn").cast("long").alias("common_neighbors"),
        F.col("aa").alias("aa_score"),
    )
    if top_k is not None:
        out = _rank_top_k(out, "aa_score", top_k)
    out = out.persist()
    out.count()
    for df in held:
        df.unpersist()
    canon.unpersist()
    return out


def link_scores(
    edges: DataFrame,
    top_k: int | None = None,
    center_buckets: int = 1,
    max_center_degree: int | None = DEFAULT_MAX_CENTER_DEGREE,
) -> DataFrame:
    """The full classical link-prediction measure set per non-adjacent pair
    (u < v, >= 1 common neighbor): common_neighbors, aa_score (Adamic-Adar),
    ra_score (resource allocation, sum 1/deg(w)), jaccard
    (cn / |N(u) ∪ N(v)|), pref_attachment (deg(u) * deg(v)).

    One wedge pass covers cn/aa/ra; jaccard and preferential attachment
    need only the two endpoint degrees — a V-row degree table joined twice,
    broadcast-able at any realistic vertex count. top_k ranks by
    (round(jaccard, 6) desc, u, v) — the degree-normalized measure, so hub
    pairs don't monopolize the shortlist.

    Centers above ``max_center_degree`` (default 1000) are excluded from
    the wedge pass (cn/aa/ra); jaccard's union denominator and
    pref_attachment use the TRUE endpoint degrees either way. Pass None
    for the exact uncapped semantics (see module docstring)."""
    canon = oriented_edges(edges, by_degree=False, materialize=True)
    und = canon.unionAll(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("vid")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    nonadj, held = _scored_nonadjacent(canon, center_buckets, max_center_degree)
    out = (
        nonadj.join(deg.select(F.col("vid").alias("u"), F.col("deg").alias("_du")), "u")
        .join(deg.select(F.col("vid").alias("v"), F.col("deg").alias("_dv")), "v")
        .select(
            "u", "v",
            F.col("cn").cast("long").alias("common_neighbors"),
            F.col("aa").alias("aa_score"),
            F.col("ra").alias("ra_score"),
            (F.col("cn") / (F.col("_du") + F.col("_dv") - F.col("cn"))).alias("jaccard"),
            (F.col("_du") * F.col("_dv")).cast("long").alias("pref_attachment"),
        )
    )
    if top_k is not None:
        out = _rank_top_k(out, "jaccard", top_k)
    out = out.persist()
    out.count()
    for df in held:
        df.unpersist()
    canon.unpersist()
    return out
