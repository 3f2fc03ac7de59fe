"""Strongly connected components — the web-graph bowtie decomposition
(beyond the reference's app suite: MiniGraph ships only the undirected
WCC, wcc_vc_batch.cpp; SCC is the directed completion a link-graph engine
needs for crawl-frontier and spam-farm analysis).

Iterated forward/backward min-label partition refinement:

    F(v) = min vid that can REACH v    (min-label propagated along edges)
    B(v) = min vid REACHABLE FROM v    (min-label along reversed edges)

F(v) == B(v) == r proves v and r mutually reachable, so v ∈ SCC(r) — and r
is then the minimum vid of that SCC (any smaller member would have lowered
F(r)). Vertices with F != B cannot yet be classified, but an SCC never
straddles a (F, B) class (mutually reachable vertices share both labels),
so edges BETWEEN classes can never serve an SCC again and are pruned; the
next round re-propagates within the shrunken class subgraphs. A pure DAG
resolves in ONE round (every vertex gets a distinct (F, B) pair or F == B),
which kills the chain pathology that plagues coloring-based SCC; typical
web graphs (giant SCC + shallow periphery) finish in 2-4 rounds. Worst
case is a CHAIN OF SCCs (a path of 2-cycles: each round resolves only the
chain ends whose F and B agree, so rounds grow linearly with chain depth)
— adversarial, not web-shaped; measured flat phase counts as R-MAT grew
64M -> 256M edges, and bounded by max_rounds (raise it for deliberately
deep condensation chains; the loop raises RuntimeError rather than
returning a partial labeling).

Scale shape: each round is two directed min-label fixpoints — exactly the
superstep engine's WCC machinery with pointer jumping (valid under
directed semantics: ancestors of ancestors are ancestors), so O(log n)
supersteps each, one E-row combine shuffle per superstep — plus one
edge-prune join. Outer state (assigned components, surviving edges) is
localCheckpoint'ed per round with previous-round block freeing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.superstep import free_rdd_ids, persistent_rdd_ids
from .wcc import run_wcc


def run_scc(edges: DataFrame, max_rounds: int = 50) -> DataFrame:
    """(vid, scc_id) for every endpoint vertex of ``edges``; scc_id is the
    minimum vid of the component. Self-loops and duplicate edges are
    ignored (a self-loop never changes SCC membership); a self-loop-only
    vertex still appears, as its own singleton component."""
    spark = edges.sparkSession
    verts = (
        edges.select(F.col("src").alias("vid"))
        .unionAll(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
    before = persistent_rdd_ids(spark)
    alive = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    alive_ids = persistent_rdd_ids(spark) - before

    before = persistent_rdd_ids(spark)
    # unassigned vertex set; assigned rows accumulate in `done`
    un = verts.localCheckpoint(eager=True)
    un_ids = persistent_rdd_ids(spark) - before
    done: DataFrame | None = None
    done_ids: set = set()

    for _ in range(max_rounds):
        if alive.limit(1).count() == 0:
            # no intra-class edges left: every unassigned vertex is a
            # singleton SCC. Materialize BEFORE freeing the blocks the
            # lazy union still references.
            leftovers = un.select("vid", F.col("vid").alias("scc_id"))
            done = (
                leftovers if done is None else done.unionAll(leftovers)
            ).localCheckpoint(eager=True)
            free_rdd_ids(spark, un_ids)
            break
        before = persistent_rdd_ids(spark)
        fwd = run_wcc(alive, directed=True).state.select(
            "vid", F.col("value").alias("_f")
        )
        bwd = run_wcc(
            alive.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            ),
            directed=True,
        ).state.select("vid", F.col("value").alias("_b"))
        # the two wcc final states are pinned eager checkpoints; free them
        # once their last consumer (new_un below) is materialized, else each
        # refinement round leaks two V-row block sets (ADVICE r3)
        wcc_ids = persistent_rdd_ids(spark) - before
        # vertices with no alive edge default to F = B = vid (singleton)
        lab = (
            un.join(fwd, "vid", "left")
            .join(bwd, "vid", "left")
            .select(
                "vid",
                F.coalesce("_f", F.col("vid")).alias("_f"),
                F.coalesce("_b", F.col("vid")).alias("_b"),
            )
        )
        newly = lab.filter(F.col("_f") == F.col("_b")).select(
            "vid", F.col("_f").alias("scc_id")
        )
        rest = lab.filter(F.col("_f") != F.col("_b"))

        before = persistent_rdd_ids(spark)
        done = (
            newly if done is None else done.unionAll(newly)
        ).localCheckpoint(eager=True)
        new_done_ids = persistent_rdd_ids(spark) - before
        free_rdd_ids(spark, done_ids)
        done_ids = new_done_ids

        before = persistent_rdd_ids(spark)
        new_un = rest.select("vid", "_f", "_b").localCheckpoint(eager=True)
        new_un_ids = persistent_rdd_ids(spark) - before
        free_rdd_ids(spark, un_ids)
        free_rdd_ids(spark, wcc_ids)
        un, un_ids = new_un.select("vid"), new_un_ids
        if new_un.limit(1).count() == 0:
            break

        # prune to intra-class edges between still-unassigned endpoints
        cls = new_un
        before = persistent_rdd_ids(spark)
        new_alive = (
            alive.join(
                cls.select(
                    F.col("vid").alias("src"),
                    F.col("_f").alias("_fs"),
                    F.col("_b").alias("_bs"),
                ),
                "src",
            )
            .join(
                cls.select(
                    F.col("vid").alias("dst"),
                    F.col("_f").alias("_fd"),
                    F.col("_b").alias("_bd"),
                ),
                "dst",
            )
            .filter(
                (F.col("_fs") == F.col("_fd")) & (F.col("_bs") == F.col("_bd"))
            )
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        new_alive_ids = persistent_rdd_ids(spark) - before
        free_rdd_ids(spark, alive_ids)
        alive, alive_ids = new_alive, new_alive_ids
    else:
        raise RuntimeError(
            f"SCC refinement did not converge within {max_rounds} rounds"
        )

    # `done` is already checkpointed on every break path; its blocks back
    # the returned DataFrame and stay pinned (same contract as run_ktruss)
    free_rdd_ids(spark, alive_ids)
    return done


def condensation(
    edges: DataFrame, scc: DataFrame | None = None, max_rounds: int = 50
) -> DataFrame:
    """(src_scc, dst_scc) distinct inter-component edges — the condensation
    DAG of the directed graph (the component-level bowtie skeleton: every
    cycle collapses into its SCC, so the result is acyclic by construction).

    Pass a precomputed ``scc`` (vid, scc_id) table to amortize run_scc
    across consumers (the engine-reuse idiom); otherwise it runs here.

    Scale shape: two V-row mapping joins against the E-row edge table
    (broadcast when the component map is small, co-partitioned shuffle
    joins when not — Catalyst/AQE picks per side), then one E-row distinct.
    No iteration beyond run_scc itself; the output is |condensation edges|
    rows, typically orders of magnitude below E on web graphs (giant SCC +
    shallow periphery)."""
    comp = scc if scc is not None else run_scc(edges, max_rounds)
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    out = (
        e.join(
            comp.select(F.col("vid").alias("src"), F.col("scc_id").alias("src_scc")),
            "src",
        )
        .join(
            comp.select(F.col("vid").alias("dst"), F.col("scc_id").alias("dst_scc")),
            "dst",
        )
        .filter(F.col("src_scc") != F.col("dst_scc"))
        .select("src_scc", "dst_scc")
        .distinct()
    )
    return out
