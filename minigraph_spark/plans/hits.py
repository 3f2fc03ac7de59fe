"""HITS (hubs and authorities) — the canonical link-analysis companion to
PageRank (beyond the reference's app suite: no MiniGraph analog; added for
the link-graph mandate, same slot as k-core/k-truss).

Kleinberg's synchronous power iteration with L1 normalization:

    auth'(v) = sum over in-edges (u, v)  of hub(u);  auth = auth' / ||auth'||_1
    hub'(u)  = sum over out-edges (u, v) of auth(v); hub  = hub'  / ||hub'||_1

(hub reads the CURRENT iteration's normalized auth — the standard update
order; L1 rather than L2 so the oracle needs no sqrt and mass stays
interpretable as a distribution.)

Scale shape: inherently TWO shuffles per iteration (one per phase — each
phase is a scatter join + a sum combine, exactly the superstep engine's
per-iteration cost, doubled). The edge table is hash-partitioned once by
src and persists serialized (edge_cache="single", the measured default —
see run_hits), making the auth phase's scatter join exchange-free on the
E-row side; edge_cache="dual" additionally pins a dst-partitioned copy so
the hub phase is exchange-free too, at 2× the resident edge bytes. Normalization totals are
1-row broadcasts inside the plan (the dangling-mass device from
plans/pagerank.py) — no driver collect in the loop. Lineage is truncated
per iteration with an eager localCheckpoint + previous-round block free
(see plans/ktruss.py for why plain persist degenerates).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.partition import prepartition_edges
from ..operators.superstep import free_rdd_ids, persistent_rdd_ids
from ..session import iterative_confs


@dataclass
class HitsResult:
    state: DataFrame  # (vid, auth, hub)
    iterations: int
    converged: bool


def run_hits(
    edges: DataFrame,
    iters: int | None = 3,
    tol: float | None = None,
    max_iter: int = 100,
    num_partitions: int | None = None,
    edge_cache: str = "single",
) -> HitsResult:
    """HITS over the directed simple edge set (duplicate edges are deduped;
    self-loops kept — they are legitimate hub-to-own-authority mass and the
    oracle pins the same rule).

    Fixed-sweep mode (``iters``, the oracle face) runs exactly that many
    iterations; convergence mode (``tol``) runs until
    max(|Δauth|, |Δhub|) <= tol or max_iter.

    ``edge_cache`` trades resident memory against per-sweep shuffle:
    "dual" pins TWO prepartitioned edge copies (by src and by dst) so BOTH
    phase joins are exchange-free on the E-row side — 2× the serialized
    edge bytes; "single" (default) pins only the src-partitioned copy and
    lets the hub phase re-shuffle the E rows on dst every sweep — half the
    resident edge memory. Measured three times at 256M edges / 3 sweeps
    (BASELINE.md round-4 HITS rows): dual 310.9 s/sweep (load 33.9),
    single 275.0 s/sweep (load 31.6), dual re-read 270.3 s/sweep (load
    30.8) — wall parity within this sandbox's co-tenant noise, so the
    halved resident cache decides the default (at 10^9 edges the second
    copy doubles the serialized block set, the round-3 memory concern).
    Pick "dual" when sweeps ≫ setup AND memory headroom is ample.
    """
    if (iters is None) == (tol is None):
        raise ValueError("pass exactly one of iters= or tol=")
    if edge_cache not in ("dual", "single"):
        raise ValueError(f"unknown edge_cache: {edge_cache}")
    spark = edges.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    e = edges.select("src", "dst").distinct()
    _pre = persistent_rdd_ids(spark)
    with iterative_confs(spark):
        fwd = prepartition_edges(e, n_part, by="src")
        bwd = (
            prepartition_edges(e, n_part, by="dst")
            if edge_cache == "dual"
            else fwd
        )
    edge_ids = persistent_rdd_ids(spark) - _pre
    verts = (
        fwd.select(F.col("src").alias("vid"))
        .unionAll(fwd.select(F.col("dst").alias("vid")))
        .distinct()
    )

    before = persistent_rdd_ids(spark)
    st = verts.select(
        "vid", F.lit(1.0).alias("auth"), F.lit(1.0).alias("hub")
    ).localCheckpoint(eager=True)
    st_ids = persistent_rdd_ids(spark) - before
    if fwd.limit(1).count() == 0:  # edgeless: nothing to normalize against
        free_rdd_ids(spark, edge_ids)
        return HitsResult(st, 0, True)

    limit = iters if iters is not None else max_iter
    it, converged = 0, False
    for it in range(1, limit + 1):
        a_raw = (
            fwd.join(st.select(F.col("vid").alias("src"), "hub"), "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("a_raw"))
        )
        a_tot = a_raw.agg(F.sum("a_raw").alias("_ta"))
        auth = (
            verts.join(a_raw.withColumnRenamed("dst", "vid"), "vid", "left")
            .crossJoin(F.broadcast(a_tot))
            .select(
                "vid",
                (F.coalesce(F.col("a_raw"), F.lit(0.0)) / F.col("_ta")).alias(
                    "auth"
                ),
            )
        )
        h_raw = (
            bwd.join(auth.select(F.col("vid").alias("dst"), "auth"), "dst")
            .groupBy("src")
            .agg(F.sum("auth").alias("h_raw"))
        )
        h_tot = h_raw.agg(F.sum("h_raw").alias("_th"))
        before = persistent_rdd_ids(spark)
        nxt = (
            auth.join(h_raw.withColumnRenamed("src", "vid"), "vid", "left")
            .crossJoin(F.broadcast(h_tot))
            .select(
                "vid",
                "auth",
                (F.coalesce(F.col("h_raw"), F.lit(0.0)) / F.col("_th")).alias(
                    "hub"
                ),
            )
        ).localCheckpoint(eager=True)
        nxt_ids = persistent_rdd_ids(spark) - before
        if tol is not None:
            delta = (
                st.withColumnsRenamed({"auth": "_pa", "hub": "_ph"})
                .join(nxt, "vid")
                .agg(
                    F.max(
                        F.greatest(
                            F.abs(F.col("auth") - F.col("_pa")),
                            F.abs(F.col("hub") - F.col("_ph")),
                        )
                    ).alias("d")
                )
                .collect()[0]["d"]
            )
            if delta is not None and delta <= tol:
                converged = True
        free_rdd_ids(spark, st_ids)
        st, st_ids = nxt, nxt_ids
        if converged:
            break
    # the final state is its own eager checkpoint; the two prepartitioned
    # edge caches are now dead weight — free them so back-to-back run_hits
    # calls don't accumulate 2×E-row block sets per call (ADVICE r3)
    free_rdd_ids(spark, edge_ids)
    return HitsResult(st, it, converged or iters is not None)
