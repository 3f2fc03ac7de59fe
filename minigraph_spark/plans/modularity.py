"""Newman modularity of a vertex partition (link_graph-tier op; no
reference app — the quality score every community pipeline reports next to
its LPA/Louvain labels).

Q = Σ_c ( e_c / m  -  (deg_c / 2m)^2 )

over the undirected simple closure: m = |undirected edges|, e_c = edges
with both endpoints in community c, deg_c = summed degree of c's members.
Self-loops are dropped with the closure (symmetrize's rule).

Scale shape: one E-row double label join for e_c, one V-row label join for
deg_c, three scalar aggregates — no iteration, everything map-side
combinable. Community count never materializes beyond a groupBy key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.project import canonicalize


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One row (modularity). ``labels`` is (vid, label); vertices missing
    from it fall into no community (their edges count only toward m /
    degrees, the standard treatment of unlabeled periphery)."""
    canon = canonicalize(edges)
    canon = canon.persist()
    m = canon.count()
    if m == 0:
        canon.unpersist()
        return edges.sparkSession.createDataFrame(
            [(0.0,)], "modularity double"
        )
    lab = labels.select("vid", "label")
    e_in = (
        canon.join(lab.withColumnsRenamed({"vid": "src", "label": "_ls"}), "src")
        .join(lab.withColumnsRenamed({"vid": "dst", "label": "_ld"}), "dst")
        .filter(F.col("_ls") == F.col("_ld"))
        .groupBy("_ls")
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    deg = (
        canon.select(F.explode(F.array("src", "dst")).alias("vid"))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    deg_c = (
        deg.join(lab, "vid")
        .groupBy("label")
        .agg(F.sum("deg").alias("deg_c"))
    )
    per_c = deg_c.join(
        e_in.withColumnRenamed("_ls", "label"), "label", "left"
    ).select(
        (
            F.coalesce(F.col("e_c"), F.lit(0)) / F.lit(float(m))
            - F.pow(F.col("deg_c") / F.lit(2.0 * m), F.lit(2.0))
        ).alias("q_c")
    )
    out = per_c.agg(F.sum("q_c").alias("modularity"))
    out = out.select(F.coalesce("modularity", F.lit(0.0)).alias("modularity"))
    out = out.persist()
    out.count()
    canon.unpersist()
    return out


def conductance(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-community conductance over the same canonical undirected simple
    closure modularity uses:

        phi(c) = cut(c) / min(vol(c), 2m - vol(c))

    cut(c) = edges with exactly one endpoint labeled c, vol(c) = summed
    degree of c's members, m = |undirected edges|. Low phi = well-separated
    community; the standard partner score to modularity (which rewards
    density, while conductance penalizes boundary).

    Returns one row per community: (label, cut, vol, conductance), with
    conductance defined as 0.0 when min(vol, 2m - vol) = 0 (a community
    holding every endpoint has no outside to leak to). Assumes ``labels``
    covers every vertex of the closure (LPA/WCC output does); edges with an
    unlabeled endpoint are dropped by the inner joins, matching
    modularity's unlabeled-periphery treatment.

    Scale shape: identical to modularity — one E-row double label join, one
    V-row label join, all aggregates map-side combinable, no iteration.
    """
    canon = canonicalize(edges).persist()
    m = canon.count()
    lab = labels.select("vid", "label")
    both = canon.join(
        lab.withColumnsRenamed({"vid": "src", "label": "_ls"}), "src"
    ).join(lab.withColumnsRenamed({"vid": "dst", "label": "_ld"}), "dst")
    cut = (
        both.filter(F.col("_ls") != F.col("_ld"))
        # a boundary edge is a cut edge for BOTH sides' communities
        .select(F.explode(F.array("_ls", "_ld")).alias("label"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("cut"))
    )
    deg = (
        canon.select(F.explode(F.array("src", "dst")).alias("vid"))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    vol = deg.join(lab, "vid").groupBy("label").agg(F.sum("deg").alias("vol"))
    denom = F.least(F.col("vol"), F.lit(2 * m) - F.col("vol"))
    out = vol.join(cut, "label", "left").select(
        "label",
        F.coalesce("cut", F.lit(0)).alias("cut"),
        "vol",
        F.when(denom > 0, F.coalesce("cut", F.lit(0)) / denom)
        .otherwise(F.lit(0.0))
        .alias("conductance"),
    )
    out = out.persist()
    out.count()
    canon.unpersist()
    return out
