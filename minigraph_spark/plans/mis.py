"""Maximal independent set — deterministic Luby-style sync rounds (beyond
the reference's app suite; no MiniGraph analog. MIS is the classic parallel
symmetry-breaking primitive — scheduling, conflict-free sampling, and the
round structure under greedy coloring, plans/coloring.py's sibling).

Fixed per-vertex priorities p(v) = md5_int63('mis:' || v) instead of
Luby's per-round coin flips: a vertex joins the MIS when its priority is a
strict local minimum among still-undecided neighbors; it and its neighbors
then leave the undecided set. With FIXED priorities the fixpoint equals
the sequential greedy MIS taken in priority order — fully deterministic,
cross-engine reproducible (the md5 idiom of operators/sampling.py), and
expressible as an unrolled SQL oracle with a NumPy-derived round count
(the derived-unroll pattern of the coloring/k-core oracles). Ties on p are
broken by vid in-plan; the NumPy derivation asserts priorities are unique
(60-bit md5 over the vertex set), so the tie-break is never load-bearing.

Self-loop semantics (shared by this plan, oracle.mis_greedy and the
relational _mis_sql oracle): self-loops are DROPPED — independence is a
property of the simple closure, so a self-loop-only vertex is an isolated
vertex and always a member.

Scale shape: each round is one edge join pass restricted to the undecided
subgraph, one min-combine per vertex (map-side partial agg), and two semi
joins; the undecided subgraph shrinks geometrically (each round removes
every local-minimum vertex and its whole neighborhood), so like the k-core
peel the expensive rounds are the first few. Round state is
localCheckpoint'ed with previous-round block freeing; per-round winner
sets are held checkpointed and unioned ONCE at the end (re-checkpointing
the cumulative set every round would copy the early — largest — winner
cohorts O(rounds) times). All pinned blocks are freed on every exit path,
including the non-convergence raise (ADVICE-r3 leak rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int63
from ..operators.project import symmetrize
from ..operators.superstep import (
    free_rdd_ids,
    tracked_local_checkpoint as ckpt,
)

MIS_SALT = "mis:"


def mis_priority(col: Column) -> Column:
    return md5_int63(F.concat(F.lit(MIS_SALT), col.cast("string")))


def run_mis(
    edges: DataFrame, max_rounds: int = 200, state_storage: str = "deser"
) -> DataFrame:
    """(vid) members of the deterministic greedy MIS of the undirected
    simple closure of ``edges``. Self-loop-only vertices are always
    members (see module docstring); the result is maximal: every
    non-member has a member neighbor.

    state_storage="ser" stores the E-scale round state (the shrinking
    undecided-subgraph edge table) serialized — the SuperstepEngine policy
    for graphs whose symmetric closure rivals heap size (a 256M-edge
    deserialized closure OOMs a 48g heap; serialized it fits)."""
    if state_storage not in ("deser", "ser"):
        raise ValueError(
            f"state_storage must be 'deser' or 'ser', got {state_storage!r}"
        )
    ser = state_storage == "ser"
    spark = edges.sparkSession
    verts = (
        edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    u, u_ids = ckpt(verts.select("v", mis_priority(F.col("v")).alias("p")))
    cur, cur_ids = ckpt(symmetrize(edges), serialized=ser)  # undecided-subgraph edges

    wins: list[DataFrame] = []
    win_ids: set = set()
    converged = False
    try:
        for _ in range(max_rounds):
            if u.limit(1).count() == 0:
                converged = True
                break
            # min undecided-neighbor (p, v) per undecided vertex; vertices
            # with no surviving neighbor win unconditionally (left-join NULL)
            nbr = cur.join(
                u.select(
                    F.col("v").alias("dst"), F.struct("p", "v").alias("_pv")
                ),
                "dst",
            )
            nmin = nbr.groupBy("src").agg(F.min("_pv").alias("_nm"))
            win, ids = ckpt(
                u.join(nmin.withColumnRenamed("src", "v"), "v", "left")
                .filter(
                    F.col("_nm").isNull() | (F.struct("p", "v") < F.col("_nm"))
                )
                .select("v")
            )
            wins.append(win)
            win_ids |= ids
            dropped = win.unionAll(
                cur.join(win.withColumnRenamed("v", "src"), "src", "left_semi")
                .select(F.col("dst").alias("v"))
            ).distinct()
            nxt_u, nxt_u_ids = ckpt(u.join(dropped, "v", "left_anti"))
            nxt_cur, nxt_cur_ids = ckpt(
                cur.join(nxt_u.select(F.col("v").alias("src")), "src", "left_semi")
                .join(nxt_u.select(F.col("v").alias("dst")), "dst", "left_semi")
                .select("src", "dst"),
                serialized=ser,
            )
            free_rdd_ids(spark, u_ids | cur_ids)
            u, u_ids = nxt_u, nxt_u_ids
            cur, cur_ids = nxt_cur, nxt_cur_ids
        # the range can end exactly when the last round emptied the set
        converged = converged or u.limit(1).count() == 0
        if not converged:
            raise RuntimeError(
                f"MIS did not converge within {max_rounds} rounds"
            )
        if not wins:
            return spark.createDataFrame([], "vid long")
        members = wins[0]
        for w in wins[1:]:
            members = members.unionAll(w)
        out = members.select(F.col("v").alias("vid")).persist()
        out.count()
        return out
    finally:
        free_rdd_ids(spark, u_ids | cur_ids | win_ids)
