"""Triangle counting — degree-ordered two-self-join (SURVEY.md §2.4).

No reference app exists (README lists it as future work); this is the
canonical relational formulation, required by the north rule. Degree
ordering (orient every undirected edge from the lower-degree endpoint to the
higher-degree one, ties by id) bounds the fan-out of the wedge join on
power-law graphs: each vertex's oriented out-degree is O(sqrt(|E|)), so the
wedge intermediate stays near-linear — the standard skew defense for this
query at 100 TB. Both joins are plain equi-joins Catalyst can shuffle-hash
or sort-merge; AQE handles residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def oriented_edges(edges: DataFrame, by_degree: bool = True) -> DataFrame:
    """Undirected simple closure, each edge kept once, oriented
    low-rank -> high-rank where rank = (degree, vid) when by_degree."""
    und = (
        edges.select("src", "dst")
        .unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if not by_degree:
        return und.filter(F.col("src") < F.col("dst"))
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).withColumnRenamed("src", "v")
    ranked = (
        und.join(deg.select(F.col("v").alias("src"), F.col("deg").alias("sdeg")), "src")
        .join(deg.select(F.col("v").alias("dst"), F.col("deg").alias("ddeg")), "dst")
    )
    keep = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    return ranked.filter(keep).select("src", "dst")


def triangle_count(edges: DataFrame, by_degree: bool = True) -> DataFrame:
    """One-row DataFrame (num_triangles). Exact on the undirected closure."""
    e = oriented_edges(edges, by_degree).persist()
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    wedges = ab.join(bc, "b")
    tri = wedges.join(ac, ["a", "c"])
    out = tri.agg(F.count(F.lit(1)).alias("num_triangles"))
    return out


def per_vertex_triangles(edges: DataFrame, by_degree: bool = True) -> DataFrame:
    """(vid, triangles) — per-vertex participation count (nx.triangles
    analog); sums to 3x the global count."""
    e = oriented_edges(edges, by_degree).persist()
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    per_corner = (
        tri.select(F.col("a").alias("vid"))
        .unionAll(tri.select(F.col("b").alias("vid")))
        .unionAll(tri.select(F.col("c").alias("vid")))
    )
    return per_corner.groupBy("vid").agg(F.count(F.lit(1)).alias("triangles"))
