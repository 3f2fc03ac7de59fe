"""Bipartite projection + butterfly counting (beyond-reference link analysis).

The reference operates on unipartite link graphs only (SURVEY.md §2.4); a
transcript/event corpus is naturally *bipartite* first — (user, day),
(conversation, tool), (doc, shingle) — and the unipartite graphs every
other plan consumes are its one-mode projections. Two operators:

- ``cooccurrence``: the one-mode projection — left-vertex pairs weighted
  by the number of shared right-neighbors. This is the affiliation->link
  step (actors sharing events, users active on the same days).
- ``butterfly_count``: the bipartite clustering primitive — the number of
  (2,2)-bicliques (K_{2,2}, "butterflies"), the bipartite analogue of the
  triangle (Wang et al., VLDB'19 vertex-priority butterfly counting gives
  the side-choice rule used here).

Scale shape (the 100 TB contract):
- The wedge pass is the hazard: a center vertex of degree d emits C(d, 2)
  shuffled pair rows, exactly the quadratic volume plans/linkpred.py caps
  and plans/triangles.py chunks. Three defenses, same idioms:
  1. *Side choice* — wedge cost is sum_c C(deg(c), 2) over the CENTER
     side only; ``butterfly_count(center="auto")`` measures both sides
     with one tiny two-scalar agg and centers on the cheaper one (the
     counts are equal by K_{2,2} symmetry). On a users x days table the
     day side costs ~50x the user side at sf0.1.
  2. *Hub cap* — ``cooccurrence(max_center_degree=...)`` (default 10000)
     drops centers above the cap from the wedge pass, the linkpred skew
     guard; pass None for exact semantics. A 10^6-degree hub day would
     otherwise emit ~5*10^11 pair rows.
  3. *Center bucketing* — ``center_buckets=B`` chunks the self-join by
     hash bucket of the center id, bounding transient shuffle/spill to
     ~1/B at flat total work (the triangles src_buckets knob).
- The pair aggregation (groupBy(a, b).count()) collapses map-side; the
  projection output is |pairs| rows, never re-expanded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Same order of magnitude as linkpred's center cap: a 10^4-degree center
# contributes ~5*10^7 wedge rows — the per-center ceiling a 100 TB run
# can absorb; hubs above it are dropped (documented approximation).
DEFAULT_MAX_CENTER_DEGREE = 10_000


def _dedup(bip: DataFrame, left_col: str, right_col: str) -> DataFrame:
    return bip.select(
        F.col(left_col).alias("l"), F.col(right_col).alias("r")
    ).distinct()


def _wedge_pairs(
    b: DataFrame,
    center: str,
    max_center_degree: int | None,
    center_buckets: int,
    min_shared: int = 1,
) -> DataFrame:
    """(a, b, shared) pairs of NON-center vertices sharing >= min_shared
    center neighbors, a < b. ``b`` must be the deduped (l, r) table;
    ``center`` names which column is the wedge center ("l" or "r").
    min_shared is applied INSIDE the pair aggregation plan (before the
    materializing persist), so sub-threshold pairs are never stored —
    though with buckets > 1 it must wait for the cross-bucket merge."""
    other = "r" if center == "l" else "l"
    w = b.select(F.col(center).alias("c"), F.col(other).alias("o"))
    if max_center_degree is not None:
        deg = w.groupBy("c").agg(F.count(F.lit(1)).alias("_d"))
        w = (
            w.join(deg.filter(F.col("_d") <= max_center_degree), "c")
            .select("c", "o")
        )
    w = w.persist()
    w.count()

    def one_pass(wl: DataFrame) -> DataFrame:
        a = wl.select("c", F.col("o").alias("a"))
        bb = wl.select("c", F.col("o").alias("b"))
        return (
            a.join(bb, "c")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("shared"))
        )

    if center_buckets > 1:
        bucket = F.pmod(F.xxhash64("c"), F.lit(center_buckets))
        parts = []
        for k in range(center_buckets):
            pb = one_pass(w.filter(bucket == k)).persist()
            pb.count()  # sequential: one bucket's wedge join in flight
            parts.append(pb)
        merged = parts[0]
        for pb in parts[1:]:
            merged = merged.unionAll(pb)
        out = merged.groupBy("a", "b").agg(F.sum("shared").alias("shared"))
        if min_shared > 1:
            out = out.filter(F.col("shared") >= min_shared)
        out = out.persist()
        out.count()
        for pb in parts:
            pb.unpersist()
        w.unpersist()
        return out
    out = one_pass(w)
    if min_shared > 1:
        out = out.filter(F.col("shared") >= min_shared)
    out = out.persist()
    out.count()
    w.unpersist()
    return out


def cooccurrence(
    bip: DataFrame,
    left_col: str = "left",
    right_col: str = "right",
    min_shared: int = 1,
    max_center_degree: int | None = DEFAULT_MAX_CENTER_DEGREE,
    center_buckets: int = 1,
    normalize: str = "none",
) -> DataFrame:
    """(a, b, shared[, jaccard]): the one-mode projection of the bipartite
    table onto its LEFT side — unordered left pairs a < b with ``shared`` =
    number of distinct right-vertices adjacent to both; pairs below
    ``min_shared`` are dropped. Wedge centers are the right vertices; see
    the module docstring for the cap/bucket scale knobs.

    HUB-CAP SEMANTICS (read before trusting ``shared`` at scale): with the
    default ``max_center_degree``, every center whose degree exceeds the
    cap is dropped ENTIRELY — all co-occurrence mass flowing through that
    center vanishes from ``shared``, it is not sampled or down-weighted.
    Unlike linkpred (where 1/ln(deg) makes hub contributions ~0), a hub
    center here carries semantically meaningful counts: two users sharing
    one very busy day lose that day from their count. The capped result is
    therefore a LOWER BOUND on true co-occurrence, exact for pairs whose
    shared centers are all sub-cap. Pass ``max_center_degree=None`` for
    exact counts (quadratic wedge cost on the hottest center), and note
    that normalize="jaccard" uses TRUE pre-cap degrees in its denominator,
    so capped jaccard underestimates similarity rather than renormalizing
    the loss away.

    normalize="jaccard" appends jaccard = shared / (deg_a + deg_b - shared)
    over the deduped bipartite degrees — the set-overlap similarity that
    corrects raw co-occurrence's bias toward high-activity vertices. Two
    V-row degree joins on the (already |pairs|-sized) projection output;
    degrees are computed BEFORE the hub cap so the denominator reflects
    true neighborhood sizes."""
    if normalize not in ("none", "jaccard"):
        raise ValueError(f"normalize must be none|jaccard, got {normalize!r}")
    b = _dedup(bip, left_col, right_col)
    if normalize == "jaccard":
        b = b.persist()
        b.count()
    out = _wedge_pairs(
        b, "r", max_center_degree, center_buckets, min_shared=min_shared
    )
    if normalize == "none":
        return out
    deg = b.groupBy("l").agg(F.count(F.lit(1)).alias("_d"))
    res = (
        out.join(
            deg.select(F.col("l").alias("a"), F.col("_d").alias("_da")), "a"
        )
        .join(deg.select(F.col("l").alias("b"), F.col("_d").alias("_db")), "b")
        .select(
            "a", "b", "shared",
            (
                F.col("shared")
                / (F.col("_da") + F.col("_db") - F.col("shared"))
            ).alias("jaccard"),
        )
    )
    # materialize before releasing the raw-pairs persist _wedge_pairs
    # handed back, so neither intermediate stays pinned for the session
    res = res.persist()
    res.count()
    out.unpersist()
    b.unpersist()
    return res


def butterfly_count(
    bip: DataFrame,
    left_col: str = "left",
    right_col: str = "right",
    center: str = "auto",
    max_center_degree: int | None = None,
    center_buckets: int = 1,
) -> DataFrame:
    """One-row DataFrame (num_butterflies): exact K_{2,2} count of the
    deduped bipartite graph — sum over co-occurring pairs of C(shared, 2).

    ``center="auto"`` (default) compares sum_c C(deg(c), 2) of both sides
    with one two-scalar aggregate and centers the wedge pass on the
    cheaper side (counts are equal by symmetry; costs are not — the
    vertex-priority rule of Wang et al. collapsed to a per-side choice).
    Exact by default (``max_center_degree=None``): side choice + bucketing
    are the scale defenses that do not change the answer."""
    if center not in ("auto", "left", "right"):
        raise ValueError(f"center must be auto|left|right, got {center!r}")
    b = _dedup(bip, left_col, right_col).persist()
    b.count()
    if center == "auto":
        # BOTH side scalars in ONE job: the sides may have incompatible id
        # types (BIGINT users x DATE days), so union their keys as strings
        # (cast is injective per type, and the side tag keeps them from
        # mixing) — per-(side, key) counts are identical to the per-side
        # groupBys, and the wedge terms d*(d-1)/2 are exact multiples of
        # 0.5, so the sums are order-independent. Halves the job barriers
        # of the side choice (was one E-row aggregate job per side).
        both = b.select(
            F.col("l").cast("string").alias("k"), F.lit("l").alias("s")
        ).unionAll(
            b.select(F.col("r").cast("string").alias("k"), F.lit("r").alias("s"))
        )
        rows = (
            both.groupBy("s", "k").agg(F.count(F.lit(1)).alias("d"))
            .groupBy("s").agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"))
            .collect()
        )
        wedges = {r["s"]: float(r["w"] or 0.0) for r in rows}
        ctr = "l" if wedges.get("l", 0.0) <= wedges.get("r", 0.0) else "r"
    else:
        ctr = "l" if center == "left" else "r"
    pairs = _wedge_pairs(b, ctr, max_center_degree, center_buckets)
    b.unpersist()  # pairs is materialized; don't hold the dedup copy
    # through the final aggregation (_wedge_pairs' own w copy is already
    # released inside)
    # integer DIV keeps the per-pair term exact past 2^53 (double / would
    # round for mega-degree centers)
    out = pairs.agg(
        F.coalesce(
            F.sum(F.expr("shared * (shared - 1) DIV 2")), F.lit(0)
        ).cast("long").alias("num_butterflies")
    )
    n = out.collect()[0]["num_butterflies"]
    pairs.unpersist()
    return bip.sparkSession.createDataFrame([(int(n),)], "num_butterflies long")
