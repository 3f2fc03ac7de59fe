"""Full coreness (k-core number) per vertex via the iterative h-index
fixpoint (beyond the reference's app suite — no MiniGraph analog; completes
the k-core family: plans/kcore.py answers "which vertices survive at a FIXED
k", this answers "the maximal k for EVERY vertex" in one run).

Rule (Lu/Zhou/Zhang/Stanley 2016, "The H-index of a network node"):
    c_0(v)   = deg(v)                       (undirected simple closure)
    c_t+1(v) = H({ c_t(u) : u in N(v) })    (H = h-index: the largest h such
                                             that >= h neighbors have value
                                             >= h)
converges monotonically DOWN to the core number of v. Synchronous and
deterministic, so the round count is derivable by the same NumPy simulation
the other to-convergence oracles use (oracle.coreness_hindex_rounds) and
the DuckDB oracle unrolls exactly.

Scale shape: each round is one co-located state join on src (state and the
symmetrized edge table share the src hash partitioning), one exchange to
sort neighbor values per dst (window), and a groupBy dst that reuses the
window's partitioning — ONE shuffle per round, V-row payloads. H-index is
order-statistic (needs the sorted neighbor multiset), so unlike min/sum
plans it cannot collapse map-side; the window sort is the honest price and
it rides inside the dst exchange. Values only decrease, so convergence is
detected by a 1-row SUM action per round (sum unchanged == fixpoint). The
per-round lineage/persist discipline mirrors plans/kcore.py: eager
localCheckpoint + explicit block frees (df.unpersist is a no-op on
localCheckpoint blocks — see operators/superstep.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.project import symmetrize
from ..operators.superstep import free_rdd_ids, persistent_rdd_ids


def run_coreness(edges: DataFrame, max_rounds: int = 400) -> DataFrame:
    """(vid, coreness) for every non-isolated vertex of the undirected
    simple closure of `edges` (self-loops dropped, multi-edges collapsed —
    the same closure as run_kcore, so coreness(v) >= k iff v in k-core)."""
    spark = edges.sparkSession
    before = persistent_rdd_ids(spark)
    sym = symmetrize(edges).repartition(F.col("src")).localCheckpoint(eager=True)
    sym_ids = persistent_rdd_ids(spark) - before

    before = persistent_rdd_ids(spark)
    state = (
        sym.groupBy(F.col("src").alias("vid"))
        .agg(F.count(F.lit(1)).alias("val"))
        .localCheckpoint(eager=True)
    )
    state_ids = persistent_rdd_ids(spark) - before
    prev_sum = state.agg(F.sum("val")).collect()[0][0]

    w = Window.partitionBy("dst").orderBy(F.desc("val"))
    for _ in range(max_rounds):
        # neighbor values: state joined on the src side (co-partitioned —
        # no exchange), then one shuffle to lay each dst's neighbor values
        # out for the h-index order statistic
        nbr = sym.join(state.withColumnRenamed("vid", "src"), "src").select(
            "dst", "val"
        )
        ranked = nbr.withColumn("rn", F.row_number().over(w))
        before = persistent_rdd_ids(spark)
        new_state = (
            ranked.groupBy(F.col("dst").alias("vid"))
            .agg(F.max(F.least(F.col("val"), F.col("rn"))).alias("val"))
            .localCheckpoint(eager=True)
        )
        new_ids = persistent_rdd_ids(spark) - before
        new_sum = new_state.agg(F.sum("val")).collect()[0][0]
        free_rdd_ids(spark, state_ids)
        state, state_ids = new_state, new_ids
        if new_sum == prev_sum:  # values are monotone non-increasing
            break
        prev_sum = new_sum

    out = state.select("vid", F.col("val").cast("long").alias("coreness")).persist()
    out.count()
    free_rdd_ids(spark, state_ids)
    free_rdd_ids(spark, sym_ids)
    return out
