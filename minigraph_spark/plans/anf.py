"""Approximate neighborhood function — HyperBall-style per-vertex
HyperLogLog ball sketches (link_graph-tier op; no reference app. The
neighborhood function |{u : dist(v,u) <= d}| underlies effective-diameter
and centrality estimation on web graphs — Palmer et al.'s ANF and Boldi &
Vigna's HyperBall; exact computation is O(V^2) memory and off the table at
scale, the register-sketch iteration is the production algorithm).

Every vertex carries m = 16 HLL registers. Round d merges (element-wise
max) each vertex's sketch with its out-neighbors' round-(d-1) sketches, so
after D rounds the sketch summarizes {u : dist(v, u) <= D}. Merging is
monotone + idempotent, so frontier delta-propagation is EXACT (same
argument as BFS/WCC): only vertices whose sketch changed rescatter.

Everything is DETERMINISTIC and cross-engine checkable: the item hash is
the repo-wide md5_int63 idiom (functions/hashing.py), register index =
low 4 bits, register value rho = 1 + trailing zeros of the remaining 56
bits (geometric(1/2), and 2^-rho sums are exact powers of two, so the
harmonic-sum arithmetic is bit-identical in Spark and DuckDB). The DuckDB
oracle computes the SAME registers from an exact bounded-depth closure —
no sketch-vs-exact slack in the test, the estimates match to 6 dp.

Scale shape: state is V rows x 16 ints; each round is one E-row scatter
join (co-partitioned, exchange-free on the edge side) + one combine
shuffle whose 16 per-slot max aggregations collapse map-side. Registers
grow only, so the frontier empties by round ~diameter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int63
from ..operators.superstep import SuperstepEngine, SuperstepResult

M = 16          # registers per sketch (b = 4 index bits)
ALPHA_M = 0.673  # HLL bias constant for m = 16
RHO_CAP = 57    # rho when the 56 post-index bits are all zero (~2^-56 odds)


def _vid_registers(vid_col: Column) -> Column:
    """The singleton-{v} sketch: rho(v) at slot j(v), zeros elsewhere."""
    h = md5_int63(vid_col.cast("string"))
    j = h % M
    w = F.shiftright(h, 4)
    lowbit = w.bitwiseAND(-w)
    rho = (
        F.when(w == 0, F.lit(RHO_CAP))
        .otherwise(F.floor(F.log2(lowbit.cast("double"))) + 1)
        .cast("int")
    )
    return F.array(
        *[F.when(j == i, rho).otherwise(F.lit(0)).cast("int") for i in range(M)]
    )


def run_anf(
    edges: DataFrame,
    depth: int = 3,
    engine: SuperstepEngine | None = None,
) -> SuperstepResult:
    """Ball sketches of {u : dist(v, u) <= depth} along OUT-edges. Returns
    state (vid, value = array<int> of 16 registers).

    A caller-passed ``engine`` must be built over the REVERSED edge table
    (messages flow dst -> src: N(v, d+1) = {v} ∪ ⋃_{v->w} N(w, d))."""
    eng = engine or SuperstepEngine(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    init = eng.vertices().select(
        "vid", _vid_registers(F.col("vid")).alias("value"),
        F.lit(True).alias("active"),
    )

    def scatter(e: DataFrame, state: DataFrame, ctx: dict) -> DataFrame:
        return e.join(
            state.select(F.col("vid").alias("src"), "value"), "src"
        ).select("dst", F.col("value").alias("msg"))

    def combine(msgs: DataFrame) -> DataFrame:
        return msgs.groupBy("dst").agg(
            F.array(
                *[F.max(F.element_at(F.col("msg"), i + 1)) for i in range(M)]
            ).alias("agg")
        )

    def apply_fn(state: DataFrame, agg: DataFrame, ctx: dict) -> DataFrame:
        merged = F.zip_with(
            "value", F.coalesce(F.col("agg"), F.col("value")),
            lambda a, b: F.greatest(a, b),
        )
        return (
            state.join(agg.withColumnRenamed("dst", "vid"), "vid", "left")
            .select(
                "vid",
                merged.alias("value"),
                (merged != F.col("value")).alias("active"),
            )
        )

    res = eng.run(
        init, scatter=scatter, combiner=combine, apply_fn=apply_fn,
        frontier=True, max_iter=depth, algo="anf",
    )
    if engine is None:
        eng.close()
    return res


def anf_estimates(state: DataFrame) -> DataFrame:
    """(vid, est): the HLL cardinality estimate of each sketch — raw
    harmonic-mean estimator with the standard small-range linear-counting
    correction (est <= 2.5m with empty registers). All built-in float ops,
    mirrored term-for-term by the SQL oracle."""
    reg = [F.element_at(F.col("value"), i + 1) for i in range(M)]
    s = F.lit(0.0)
    for r in reg:
        s = s + F.pow(F.lit(2.0), -r.cast("double"))
    zeros = F.lit(0)
    for r in reg:
        zeros = zeros + F.when(r == 0, 1).otherwise(0)
    raw = F.lit(ALPHA_M * M * M) / s
    est = F.when(
        (raw <= F.lit(2.5 * M)) & (zeros > 0),
        F.lit(float(M)) * F.log(F.lit(float(M)) / zeros),
    ).otherwise(raw)
    return state.select("vid", est.alias("est"))
