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

from ..operators.project import symmetrize


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One row (modularity). ``labels`` is (vid, label); vertices missing
    from it fall into no community (their edges count only toward m /
    degrees, the standard treatment of unlabeled periphery)."""
    canon = symmetrize(edges).filter(F.col("src") < F.col("dst"))
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
