"""Relational faces of the engine's operators over the driver testdata
(FIXTURES.md F6): every entry here powers __spark_entry__.queries() and has
an exact DuckDB oracle in ORACLE_SQL (same column names, same values).
ROWS_ONLY is empty as of round 2 — every query is oracle-checked.

Edge tables derived deterministically from the driver tables:
- seq edges : per-user event chains (window lead over (user_id, ts,
  event_id)) — the transcript->graph projection's relational face.
- mod graph : DISTINCT (event_id % M, (event_id*7 + user_id) % M) — a dense
  deterministic digraph on M=200 vertices for the algorithm suite.
- snr graph : supplier->nation->region keys (5 components, one per region).

To-convergence loops are covered three ways: recursive CTEs where the
fixpoint is reachability-shaped (WCC), deterministic unrolling where the
synchronous update rule is idempotent past its fixpoint (coloring) or the
sweep count is DERIVED at oracle-build time by running the NumPy oracle to
the same stop rule on the same input (PageRank — no measured constants;
the queries assert their own sweep counts against the derivation), and
NumPy-oracle pytest coverage on top. Unrolled generators
emit MATERIALIZED CTEs — each round references the previous one 2-3x, and
DuckDB's default inlining would expand a 50-round chain into an exponential
tree of parquet scans.

Seeded driver-side constants (LSH hyperplanes, fake/real media payloads)
are re-derived at oracle-build time with the same NumPy code and emitted as
SQL literals (VALUES tables), so candidate sets and media features are
exactly checkable without sharing any runtime state with Spark.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.compaction import compact_ids_scalable, distinct_vertices
from .operators.dedup import (
    exact_dedup_keep_min,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    text_fingerprint,
)
from .operators.similarity import cosine_topk, cosine_topk_ivf, cosine_topk_lsh
from .operators.textops import lang_id, quality_score, token_count, token_stats
from .plans.bfs import run_bfs
from .plans.lpa import run_lpa
from .plans.pagerank import run_pagerank
from .plans.linkpred import adamic_adar
from .plans.stats import (
    degree_assortativity,
    degrees,
    distinct_vertex_count,
    graph_statistics,
)
from .plans.triangles import clustering_coefficients, transitivity, triangle_count
from .plans.wcc import component_sizes, run_wcc

MOD = 200  # vertex-space size of the mod graph
_DRIVER_SF_DIR = "/root/testdata/sf0.01"  # the scale the grading driver compares at


# ---------------------------------------------------------------- loaders
def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_seq_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sequential event edges — the §3.3 projection over events."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_id").alias("src"),
            F.lead("event_id").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )


SEQ_SQL = """
  SELECT src, dst FROM (
    SELECT event_id AS src,
           lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
    FROM events
  ) WHERE dst IS NOT NULL
"""


def events_tool_edges(spark: SparkSession, sf_dir: str, max_fanout: int = 4) -> DataFrame:
    """Relational face of operators/project.py::tool_edges (§3.3 axis b):
    each event links to the next max_fanout LATER events of the same
    (user_id, event_type), with events standing in for tool turns on the
    driver testdata. lead(1..k) over the sorted group window — O(g*k)
    output per group, one shuffle, NO self-join (the oracle SQL keeps the
    join+cap formulation, pinning the equivalence). Order is (ts, event_id)
    so ts ties are broken exactly as the oracle's rank does."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    nexts = F.array(
        *[F.lead("event_id", i).over(w) for i in range(1, max_fanout + 1)]
    )
    return (
        ev.select(F.col("event_id").alias("src"), nexts.alias("_next"))
        .select("src", F.explode("_next").alias("dst"))
        .filter(F.col("dst").isNotNull())
    )


TOOL_EDGES_SQL = """
  SELECT src, dst FROM (
    SELECT a.event_id AS src, b.event_id AS dst,
           row_number() OVER (
             PARTITION BY a.user_id, a.event_type, a.event_id
             ORDER BY b.ts, b.event_id
           ) AS rn
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_type = b.event_type
     AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
  ) WHERE rn <= 4
"""


def mod_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    src = (F.col("event_id") % MOD).alias("src")
    dst = ((F.col("event_id") * 7 + F.col("user_id")) % MOD).alias("dst")
    return ev.select(src, dst).filter(F.col("src") != F.col("dst")).distinct()


MOD_SQL = f"""
  SELECT DISTINCT (event_id % {MOD}) AS src,
                  ((event_id * 7 + user_id) % {MOD}) AS dst
  FROM events
  WHERE (event_id % {MOD}) != ((event_id * 7 + user_id) % {MOD})
"""


KC_MOD = 1000  # vertex space of the sparser k-core graph (mod graph's 200
# is too dense to peel: min degree 66 at sf0.01)
KC_K = 14      # peels 2 rounds / 974 survivors at sf0.01; empties at sf0.001
KT_K = 4       # k-truss on the same kc graph: peels 3 rounds to an 18-edge
# near-clique core at sf0.01; empties in 1 round at sf0.001
SCC_MOD = 8000  # vertex space of the sparser SCC graph: at sf0.01 a real
# bowtie (3023-vertex giant SCC + ~4970 components); denser spaces collapse
# to one giant SCC and test nothing


def kc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparser deterministic digraph for the k-core query (mean undirected
    degree ~19 at sf0.01, so k=14 actually peels)."""
    ev = _t(spark, sf_dir, "events")
    src = (F.col("event_id") % KC_MOD).alias("src")
    dst = ((F.col("event_id") * 13 + F.col("user_id")) % KC_MOD).alias("dst")
    return ev.select(src, dst).filter(F.col("src") != F.col("dst")).distinct()


KC_SQL = f"""
  SELECT DISTINCT (event_id % {KC_MOD}) AS src,
                  ((event_id * 13 + user_id) % {KC_MOD}) AS dst
  FROM events
  WHERE (event_id % {KC_MOD}) != ((event_id * 13 + user_id) % {KC_MOD})
"""


def scc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse deterministic digraph for the SCC query (see SCC_MOD)."""
    ev = _t(spark, sf_dir, "events")
    src = (F.col("event_id") % SCC_MOD).alias("src")
    dst = ((F.col("event_id") * 13 + F.col("user_id")) % SCC_MOD).alias("dst")
    return ev.select(src, dst).filter(F.col("src") != F.col("dst")).distinct()


SCC_SQL = f"""
  SELECT DISTINCT (event_id % {SCC_MOD}) AS src,
                  ((event_id * 13 + user_id) % {SCC_MOD}) AS dst
  FROM events
  WHERE (event_id % {SCC_MOD}) != ((event_id * 13 + user_id) % {SCC_MOD})
"""

# SCC oracle: full transitive closure by recursive CTE (identity seeded, so
# MIN over the mutual-reach set includes the vertex itself), then
# scc_id(v) = MIN(u) with reach(v,u) AND reach(u,v) — the same canonical
# min-member id plans/scc.py converges to. ~24 s in DuckDB at sf0.01.
SCC_ORACLE_SQL = f"""
WITH RECURSIVE e AS MATERIALIZED ({SCC_SQL}),
verts AS MATERIALIZED (SELECT src AS v FROM e UNION SELECT dst FROM e),
r AS (SELECT v AS a, v AS b FROM verts
      UNION
      SELECT r.a, e.dst AS b FROM r JOIN e ON e.src = r.b)
SELECT p.a AS vid, MIN(p.b) AS scc_id
FROM r p JOIN r q ON q.a = p.b AND q.b = p.a
GROUP BY p.a
"""


def _q_scc(spark, sf_dir):
    """Strongly connected components (web bowtie decomposition; no
    reference analog — MiniGraph ships undirected WCC only)."""
    from .plans.scc import run_scc

    return run_scc(scc_edges(spark, sf_dir))


def snr_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = _t(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") + 1000).cast("long").alias("src"),
        (F.col("s_nationkey").cast("long") + 100).alias("dst"),
    )
    nat = _t(spark, sf_dir, "nation").select(
        (F.col("n_nationkey").cast("long") + 100).alias("src"),
        F.col("n_regionkey").cast("long").alias("dst"),
    )
    return sup.unionAll(nat)


SNR_SQL = """
  SELECT s_suppkey + 1000 AS src, CAST(s_nationkey AS BIGINT) + 100 AS dst FROM supplier
  UNION ALL
  SELECT CAST(n_nationkey AS BIGINT) + 100 AS src, CAST(n_regionkey AS BIGINT) AS dst FROM nation
"""


# ------------------------------------------------------- SQL generators
def _pagerank3_sql(iters: int = 3, alpha: float = 0.85) -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({MOD_SQL}),",
        "verts AS MATERIALIZED (SELECT src AS v FROM edges UNION SELECT dst FROM edges),",
        "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),",
        "outdeg AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS DOUBLE) AS deg FROM edges GROUP BY src),",
        "r0 AS MATERIALIZED (SELECT v, (SELECT 1.0/n FROM nn) AS r FROM verts),",
    ]
    for k in range(1, iters + 1):
        p = f"r{k-1}"
        parts.append(f"""
dang{k} AS MATERIALIZED (SELECT COALESCE(SUM(p.r), 0.0) AS d FROM {p} p
            LEFT JOIN outdeg od ON od.v = p.v WHERE od.v IS NULL),
inc{k} AS MATERIALIZED (SELECT e.dst AS v, SUM(p.r / od.deg) AS s
           FROM edges e JOIN {p} p ON p.v = e.src JOIN outdeg od ON od.v = e.src
           GROUP BY e.dst),
r{k} AS MATERIALIZED (SELECT v.v,
           (1 - {alpha}) / nn.n + {alpha} * (COALESCE(i.s, 0.0) + dang{k}.d / nn.n) AS r
         FROM verts v CROSS JOIN nn CROSS JOIN dang{k}
         LEFT JOIN inc{k} i ON i.v = v.v),""")
    sql = "\n".join(parts).rstrip(",")
    return sql + f"\nSELECT v AS vid, ROUND(r, 6) AS rank FROM r{iters}"


def _q_pagerank_weighted(spark, sf_dir):
    """Weighted standard PageRank, 3 sweeps: contributions split by edge
    weight / total out-weight (same deterministic weight rule as the
    weighted-SSSP query: w = 1 + (src*31 + dst) % 9)."""
    e = mod_edges(spark, sf_dir).select(
        "src", "dst",
        (1 + (F.col("src") * 31 + F.col("dst")) % 9).alias("w"),
    )
    res = run_pagerank(e, tol=0.0, max_iter=3, weight_col="w",
                       engine_kwargs={"salt_skew": False})
    return res.state.select("vid", F.round("value", 6).alias("rank"))


def _pagerank_weighted_sql(iters: int = 3, alpha: float = 0.85) -> str:
    """Unrolled weighted PageRank: same term order as _pagerank3_sql with
    r/wsum scaled by each edge's weight."""
    parts = [
        f"WITH edges AS MATERIALIZED (SELECT src, dst, 1 + ((src * 31 + dst) % 9) AS w FROM ({MOD_SQL})),",
        "verts AS MATERIALIZED (SELECT src AS v FROM edges UNION SELECT dst FROM edges),",
        "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),",
        "outdeg AS MATERIALIZED (SELECT src AS v, CAST(SUM(w) AS DOUBLE) AS deg FROM edges GROUP BY src),",
        "r0 AS MATERIALIZED (SELECT v, (SELECT 1.0/n FROM nn) AS r FROM verts),",
    ]
    for k in range(1, iters + 1):
        p = f"r{k-1}"
        parts.append(f"""
dang{k} AS MATERIALIZED (SELECT COALESCE(SUM(p.r), 0.0) AS d FROM {p} p
            LEFT JOIN outdeg od ON od.v = p.v WHERE od.v IS NULL),
inc{k} AS MATERIALIZED (SELECT e.dst AS v, SUM(p.r / od.deg * e.w) AS s
           FROM edges e JOIN {p} p ON p.v = e.src JOIN outdeg od ON od.v = e.src
           GROUP BY e.dst),
r{k} AS MATERIALIZED (SELECT v.v,
           (1 - {alpha}) / nn.n + {alpha} * (COALESCE(i.s, 0.0) + dang{k}.d / nn.n) AS r
         FROM verts v CROSS JOIN nn CROSS JOIN dang{k}
         LEFT JOIN inc{k} i ON i.v = v.v),""")
    sql = "\n".join(parts).rstrip(",")
    return sql + f"\nSELECT v AS vid, ROUND(r, 6) AS rank FROM r{iters}"


PPR_SEEDS = [0, 7, 101]  # all present in the mod graph at every driver sf


def _ppr3_sql(seeds: list[int] = PPR_SEEDS, iters: int = 3, alpha: float = 0.85) -> str:
    """Unrolled personalized PageRank (random walk with restart): teleport
    and dangling mass flow to the seed set uniformly; r0 = the seed
    distribution. Mirrors plans/pagerank.py's personalize branch
    term-for-term ((1-alpha)*p + alpha*(inc + dang*p))."""
    in_list = ",".join(str(s) for s in seeds)
    w = 1.0 / len(seeds)
    parts = [
        f"WITH edges AS MATERIALIZED ({MOD_SQL}),",
        "verts AS MATERIALIZED (SELECT src AS v FROM edges UNION SELECT dst FROM edges),",
        "outdeg AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS DOUBLE) AS deg FROM edges GROUP BY src),",
        f"pvec AS MATERIALIZED (SELECT v, CASE WHEN v IN ({in_list}) THEN {w!r} ELSE 0.0 END AS p FROM verts),",
        "r0 AS MATERIALIZED (SELECT v, p AS r FROM pvec),",
    ]
    for k in range(1, iters + 1):
        prev = f"r{k-1}"
        parts.append(f"""
dang{k} AS MATERIALIZED (SELECT COALESCE(SUM(p.r), 0.0) AS d FROM {prev} p
            LEFT JOIN outdeg od ON od.v = p.v WHERE od.v IS NULL),
inc{k} AS MATERIALIZED (SELECT e.dst AS v, SUM(p.r / od.deg) AS s
           FROM edges e JOIN {prev} p ON p.v = e.src JOIN outdeg od ON od.v = e.src
           GROUP BY e.dst),
r{k} AS MATERIALIZED (SELECT pv.v,
           (1 - {alpha}) * pv.p + {alpha} * (COALESCE(i.s, 0.0) + dang{k}.d * pv.p) AS r
         FROM pvec pv CROSS JOIN dang{k}
         LEFT JOIN inc{k} i ON i.v = pv.v),""")
    sql = "\n".join(parts).rstrip(",")
    return sql + f"\nSELECT v AS vid, ROUND(r, 6) AS rank FROM r{iters}"


WALK_SEEDS = [0, 7, 101]
WALK_STEPS = 4


def _walk_sql(seeds: list[int] = WALK_SEEDS, steps: int = WALK_STEPS) -> str:
    """Unrolled deterministic-walk oracle: per step, the argmin-by-
    (md5_int63(v:nbr:t), nbr) out-neighbor — the exact hop rule of
    operators/sampling.deterministic_walks, hash computed by the shared
    cross-engine md5 idiom."""
    from .functions.hashing import md5_int63_sql

    vals = ",".join(f"({s})" for s in seeds)
    parts = [
        f"WITH edges AS MATERIALIZED ({MOD_SQL}),",
        f"w0 AS (SELECT CAST(seed AS BIGINT) AS seed, CAST(seed AS BIGINT) AS v "
        f"FROM (VALUES {vals}) t(seed)),",
    ]
    for t in range(1, steps + 1):
        h = md5_int63_sql(
            f"CAST(w.v AS VARCHAR) || ':' || CAST(e.dst AS VARCHAR) || ':{t}'"
        )
        parts.append(
            f"s{t} AS (SELECT w.seed, e.dst, {h} AS h "
            f"FROM w{t-1} w JOIN edges e ON e.src = w.v),"
        )
        parts.append(
            f"w{t} AS (SELECT seed, dst AS v FROM ("
            f"SELECT seed, dst, row_number() OVER (PARTITION BY seed ORDER BY h, dst) AS rn "
            f"FROM s{t}) t WHERE rn = 1),"
        )
    parts[-1] = parts[-1].rstrip(",")
    final = "\nUNION ALL\n".join(
        f"SELECT seed, {t} AS step, v AS vid FROM w{t}" for t in range(steps + 1)
    )
    return "\n".join(parts) + "\n" + final


def _q_walks(spark, sf_dir):
    """Deterministic pseudo-random walks (GNN neighbor-sampling face)."""
    from .operators.sampling import deterministic_walks

    return deterministic_walks(mod_edges(spark, sf_dir), WALK_SEEDS, WALK_STEPS)


def _hits_sql(iters: int = 3) -> str:
    """Unrolled Kleinberg HITS with L1 normalization, mirroring
    plans/hits.py term-for-term: auth from the PREVIOUS hub, hub from the
    CURRENT normalized auth, both normalized by their L1 totals."""
    parts = [
        f"WITH edges AS MATERIALIZED ({MOD_SQL}),",
        "verts AS MATERIALIZED (SELECT src AS v FROM edges UNION SELECT dst FROM edges),",
        "s0 AS MATERIALIZED (SELECT v, 1.0 AS auth, 1.0 AS hub FROM verts),",
    ]
    for k in range(1, iters + 1):
        parts.append(f"""
ar{k} AS MATERIALIZED (SELECT e.dst AS v, SUM(s.hub) AS a
        FROM edges e JOIN s{k-1} s ON s.v = e.src GROUP BY e.dst),
at{k} AS MATERIALIZED (SELECT SUM(a) AS t FROM ar{k}),
a{k} AS MATERIALIZED (SELECT v.v, COALESCE(ar.a, 0.0) / at{k}.t AS auth
        FROM verts v CROSS JOIN at{k} LEFT JOIN ar{k} ar ON ar.v = v.v),
hr{k} AS MATERIALIZED (SELECT e.src AS v, SUM(a.auth) AS h
        FROM edges e JOIN a{k} a ON a.v = e.dst GROUP BY e.src),
ht{k} AS MATERIALIZED (SELECT SUM(h) AS t FROM hr{k}),
s{k} AS MATERIALIZED (SELECT a.v, a.auth, COALESCE(hr.h, 0.0) / ht{k}.t AS hub
        FROM a{k} a CROSS JOIN ht{k} LEFT JOIN hr{k} hr ON hr.v = a.v),""")
    sql = "\n".join(parts).rstrip(",")
    return (
        sql
        + f"\nSELECT v AS vid, ROUND(auth, 6) AS auth, ROUND(hub, 6) AS hub FROM s{iters}"
    )


def _q_hits3(spark, sf_dir):
    """HITS hubs/authorities, 3 synchronous L1-normalized sweeps (no
    reference analog — the canonical link-analysis companion to PageRank)."""
    from .plans.hits import run_hits

    res = run_hits(mod_edges(spark, sf_dir), iters=3)
    return res.state.select(
        "vid", F.round("auth", 6).alias("auth"), F.round("hub", 6).alias("hub")
    )


def _pagerank_minigraph3_sql(iters: int = 3, gamma: float = 0.01, eps: float = 0.001) -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({MOD_SQL}),",
        "verts AS MATERIALIZED (SELECT src AS v FROM edges UNION SELECT dst FROM edges),",
        "indeg AS MATERIALIZED (SELECT dst AS v, CAST(COUNT(*) AS DOUBLE) AS deg FROM edges GROUP BY dst),",
        "r0 AS MATERIALIZED (SELECT v, 1.0 AS r FROM verts),",
    ]
    for k in range(1, iters + 1):
        p = f"r{k-1}"
        parts.append(f"""
inc{k} AS MATERIALIZED (SELECT e.dst AS v, SUM(p.r) AS s FROM edges e JOIN {p} p ON p.v = e.src GROUP BY e.dst),
r{k} AS MATERIALIZED (SELECT p.v,
           CASE WHEN ind.deg IS NOT NULL
                     AND (p.r - {gamma} * i.s / ind.deg) * (p.r - {gamma} * i.s / ind.deg) > {eps}
                THEN {gamma} * i.s / ind.deg ELSE p.r END AS r
         FROM {p} p
         LEFT JOIN indeg ind ON ind.v = p.v
         LEFT JOIN inc{k} i ON i.v = p.v),""")
    sql = "\n".join(parts).rstrip(",")
    return sql + f"\nSELECT v AS vid, ROUND(r, 6) AS rank FROM r{iters}"


def _pr_rounds(parts, prefix, k, edges, verts, nn, outdeg, prev, alpha):
    """One unrolled standard-PageRank round (same rule as _pagerank3_sql)
    under caller-chosen CTE names — shared by the batch and warm-start
    oracles."""
    parts.append(f"""
{prefix}dang{k} AS MATERIALIZED (SELECT COALESCE(SUM(p.r), 0.0) AS d FROM {prev} p
            LEFT JOIN {outdeg} od ON od.v = p.v WHERE od.v IS NULL),
{prefix}inc{k} AS MATERIALIZED (SELECT e.dst AS v, SUM(p.r / od.deg) AS s
           FROM {edges} e JOIN {prev} p ON p.v = e.src JOIN {outdeg} od ON od.v = e.src
           GROUP BY e.dst),
{prefix}r{k} AS MATERIALIZED (SELECT v.v,
           (1 - {alpha}) / nn.n + {alpha} * (COALESCE(i.s, 0.0) + {prefix}dang{k}.d / nn.n) AS r
         FROM {verts} v CROSS JOIN {nn} nn CROSS JOIN {prefix}dang{k}
         LEFT JOIN {prefix}inc{k} i ON i.v = v.v),""")
    return f"{prefix}r{k}"


def _pagerank_warm_sql(base_iters: int = 2, warm_iters: int = 2,
                       alpha: float = 0.85) -> str:
    """Oracle for the PageRank warm start (run_pagerank(init_ranks=...)):
    phase 1 runs `base_iters` standard rounds on ~4/5 of the mod graph,
    phase 2 seeds the FULL graph's vertices from the phase-1 ranks
    (new vertices at 1/n_full), renormalizes the vector to sum 1 — exactly
    plans/pagerank.py:67-79 — and runs `warm_iters` more rounds."""
    parts = [
        f"WITH alledges AS MATERIALIZED ({MOD_SQL}),",
        "bedges AS MATERIALIZED (SELECT * FROM alledges WHERE (src + dst*3) % 5 <> 0),",
        "bverts AS MATERIALIZED (SELECT src AS v FROM bedges UNION SELECT dst FROM bedges),",
        "bnn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM bverts),",
        "boutdeg AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS DOUBLE) AS deg FROM bedges GROUP BY src),",
        "br0 AS MATERIALIZED (SELECT v, (SELECT 1.0/n FROM bnn) AS r FROM bverts),",
    ]
    prev = "br0"
    for k in range(1, base_iters + 1):
        prev = _pr_rounds(parts, "b", k, "bedges", "bverts", "bnn", "boutdeg", prev, alpha)
    parts += [
        "fverts AS MATERIALIZED (SELECT src AS v FROM alledges UNION SELECT dst FROM alledges),",
        "fnn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM fverts),",
        "foutdeg AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS DOUBLE) AS deg FROM alledges GROUP BY src),",
        f"seeded AS MATERIALIZED (SELECT fv.v, COALESCE(p.r, (SELECT 1.0/n FROM fnn)) AS r "
        f"FROM fverts fv LEFT JOIN {prev} p ON p.v = fv.v),",
        "fr0 AS MATERIALIZED (SELECT v, r / (SELECT SUM(r) FROM seeded) AS r FROM seeded),",
    ]
    prev = "fr0"
    for k in range(1, warm_iters + 1):
        prev = _pr_rounds(parts, "f", k, "alledges", "fverts", "fnn", "foutdeg", prev, alpha)
    sql = "\n".join(parts).rstrip(",")
    return sql + f"\nSELECT v AS vid, ROUND(r, 6) AS rank FROM {prev}"


def _coloring_sql(iters: int) -> str:
    """Unrolled synchronous conflict-repair coloring (plans/coloring.py):
    per round, every canonical edge (src<dst) whose endpoints share a color
    bumps the smaller endpoint's color by its conflict count. The rule is
    deterministic and rounds past the fixpoint are no-ops, so unrolling
    `iters` >= the converged round count reproduces the converged state
    exactly (46 rounds measured on the sf0.01 mod graph; 54 unrolled).

    Every CTE is MATERIALIZED: each round references the previous one three
    times, and DuckDB's default CTE inlining would otherwise expand the
    54-deep chain into an exponential tree of parquet scans (observed as
    'Too many open files' before it even plans)."""
    parts = [
        f"WITH edges AS MATERIALIZED ({MOD_SQL}),",
        "ce AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst FROM edges),",
        "verts AS MATERIALIZED (SELECT src AS v FROM ce UNION SELECT dst FROM ce),",
        "c0 AS MATERIALIZED (SELECT v, CAST(0 AS BIGINT) AS col FROM verts),",
    ]
    for k in range(1, iters + 1):
        p = f"c{k-1}"
        parts.append(f"""
conf{k} AS MATERIALIZED (SELECT e.src AS v, COUNT(*) AS n
            FROM ce e JOIN {p} a ON a.v = e.src JOIN {p} b ON b.v = e.dst
            WHERE a.col = b.col GROUP BY e.src),
c{k} AS MATERIALIZED (SELECT p.v, p.col + COALESCE(n.n, 0) AS col
         FROM {p} p LEFT JOIN conf{k} n ON n.v = p.v),""")
    sql = "\n".join(parts).rstrip(",")
    return sql + f"\nSELECT v AS vid, col AS color FROM c{iters}"


def _lpa2_sql(iters: int = 2) -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({MOD_SQL}),",
        "und AS MATERIALIZED (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),",
        "verts AS MATERIALIZED (SELECT src AS v FROM und UNION SELECT dst FROM und),",
        "l0 AS MATERIALIZED (SELECT v, v AS lab FROM verts),",
    ]
    for k in range(1, iters + 1):
        p = f"l{k-1}"
        parts.append(f"""
cnt{k} AS MATERIALIZED (SELECT e.dst AS v, l.lab, COUNT(*) AS c
           FROM und e JOIN {p} l ON l.v = e.src GROUP BY e.dst, l.lab),
best{k} AS MATERIALIZED (SELECT v, MIN(lab) AS lab FROM (
              SELECT v, lab, c, MAX(c) OVER (PARTITION BY v) AS mx FROM cnt{k}
            ) WHERE c = mx GROUP BY v),
l{k} AS MATERIALIZED (SELECT p.v, COALESCE(b.lab, p.lab) AS lab
         FROM {p} p LEFT JOIN best{k} b ON b.v = p.v),""")
    sql = "\n".join(parts).rstrip(",")
    return sql + f"\nSELECT v AS vid, lab AS label FROM l{iters}"


_WCC_SNR_SQL = f"""
WITH RECURSIVE
e0 AS ({SNR_SQL}),
und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
verts AS (SELECT DISTINCT src AS v FROM und),
reach(v, m) AS (
  SELECT v, v FROM verts
  UNION
  SELECT u.dst, r.m FROM reach r JOIN und u ON u.src = r.v
),
labels AS (SELECT v, MIN(m) AS label FROM reach GROUP BY v)
SELECT label, CAST(COUNT(*) AS BIGINT) AS size FROM labels GROUP BY label
"""

_BFS_MOD_SQL = f"""
WITH RECURSIVE
edges AS ({MOD_SQL}),
verts AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
root AS (SELECT MIN(v) AS rv FROM verts),
walk(v, d) AS (
  SELECT rv, CAST(0 AS BIGINT) FROM root
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.v WHERE w.d < 250
)
SELECT v AS vid, MIN(d) AS dist FROM walk GROUP BY v
"""

_SSSP_W_MOD_SQL = f"""
WITH RECURSIVE
edges AS (SELECT src, dst, 1 + ((src * 31 + dst) % 9) AS w FROM ({MOD_SQL})),
verts AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
root AS (SELECT MIN(v) AS rv FROM verts),
walk(v, d) AS (
  SELECT rv, CAST(0 AS BIGINT) FROM root
  UNION
  SELECT e.dst, wk.d + e.w FROM walk wk JOIN edges e ON e.src = wk.v WHERE wk.d < 2000
)
SELECT v AS vid, MIN(d) AS dist FROM walk GROUP BY v
"""

_TRI_MOD_SQL = f"""
WITH edges AS ({MOD_SQL}),
und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
ord_e AS (SELECT src, dst FROM und WHERE src < dst)
SELECT CAST(COUNT(*) AS BIGINT) AS num_triangles
FROM ord_e ab JOIN ord_e bc ON bc.src = ab.dst
JOIN ord_e ac ON ac.src = ab.src AND ac.dst = bc.dst
"""

_MD5H = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"

_SHINGLE_CTE = """
toks AS (SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents),
positions AS (SELECT doc_id, text, ts,
                unnest(range(1, CASE WHEN len(ts) <= 5 THEN 2 ELSE len(ts) - 3 END)) AS i
              FROM toks),
sh AS (SELECT DISTINCT doc_id,
         CASE WHEN len(ts) <= 5 THEN text
              ELSE array_to_string(ts[i:i+4], ' ') END AS shingle
       FROM positions)
"""

_MINHASH_SQL = (
    "WITH " + _SHINGLE_CTE + ",\nsigs AS (SELECT doc_id, "
    + ", ".join(
        f"MIN({_MD5H.format(expr=repr(str(s)+':') + ' || shingle')}) AS h{s}"
        for s in range(4)
    )
    + " FROM sh GROUP BY doc_id)\nSELECT doc_id, h0, h1, h2, h3 FROM sigs"
)

_LSH_BANDED_CTE = (
    _SHINGLE_CTE + ",\nsigs AS (SELECT doc_id, "
    + ", ".join(
        f"MIN({_MD5H.format(expr=repr(str(s)+':') + ' || shingle')}) AS h{s}"
        for s in range(4)
    )
    + """ FROM sh GROUP BY doc_id),
banded AS (
  SELECT doc_id, 0 AS band, CAST(h0 AS VARCHAR) || '_' || CAST(h1 AS VARCHAR) AS bucket FROM sigs
  UNION ALL
  SELECT doc_id, 1 AS band, CAST(h2 AS VARCHAR) || '_' || CAST(h3 AS VARCHAR) AS bucket FROM sigs)"""
)

_LSH_PAIRS_SQL = (
    "WITH " + _LSH_BANDED_CTE + """
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b USING (band, bucket)
WHERE a.doc_id < b.doc_id
"""
)

# Fuzzy-dedup clustering: the LSH candidate pairs as an undirected graph,
# connected components over it (min-doc_id labels), every unpaired doc its
# own singleton cluster — the composition a 100 TB dedup pipeline actually
# runs (pairs alone don't dedup; transitive closure does).
_DEDUP_CLUSTERS_SQL = (
    "WITH RECURSIVE " + _LSH_BANDED_CTE + """,
pairs AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b USING (band, bucket)
  WHERE a.doc_id < b.doc_id),
und AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
reach(v, m) AS (
  SELECT src, src FROM und
  UNION
  SELECT u.dst, r.m FROM reach r JOIN und u ON u.src = r.v
),
labels AS (SELECT v, MIN(m) AS label FROM reach GROUP BY v)
SELECT d.doc_id, COALESCE(l.label, d.doc_id) AS cluster,
       (COALESCE(l.label, d.doc_id) = d.doc_id) AS is_canonical
FROM documents d LEFT JOIN labels l ON l.v = d.doc_id
"""
)

_NGRAM_JACCARD_SQL = (
    "WITH " + _SHINGLE_CTE + """,
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
           FROM sh a JOIN sh b USING (shingle)
           WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b,
       ROUND(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.6
"""
)

_SIMHASH_SQL = (
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
h AS (SELECT doc_id, """
    + _MD5H.format(expr="t")
    + """ AS h FROM tok),
sums AS (SELECT doc_id, """
    + ", ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}" for i in range(16)
    )
    + " FROM h GROUP BY doc_id)\nSELECT doc_id, CAST("
    + " + ".join(f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16))
    + " AS BIGINT) AS simhash FROM sums"
)

_WCC_SEQ_SQL = f"""
WITH RECURSIVE
e0 AS ({SEQ_SQL}),
und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
verts AS (SELECT DISTINCT src AS v FROM und),
reach(v, m) AS (
  SELECT v, v FROM verts
  UNION
  SELECT u.dst, r.m FROM reach r JOIN und u ON u.src = r.v
),
labels AS (SELECT v, MIN(m) AS label FROM reach GROUP BY v)
SELECT label, CAST(COUNT(*) AS BIGINT) AS size FROM labels GROUP BY label
"""


def _plane_values(num_planes: int, num_tables: int, dim: int, seed: int) -> str:
    """The seeded hyperplanes of operators/similarity.hyperplane_buckets as
    SQL VALUES rows (t, i, j, w) — driver-side literals in both engines, so
    LSH candidate sets are deterministic and SQL-checkable."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim))
    return ",".join(
        f"({t},{i},{j},{planes[t, i, j]:.17e})"
        for t in range(num_tables)
        for i in range(num_planes)
        for j in range(dim)
    )


def _ann_lsh_sql(
    k: int = 5,
    num_planes: int = 4,
    num_tables: int = 6,
    dim: int = 64,
    seed: int = 42,
    max_query: int = 10,
) -> str:
    """Exact oracle for cosine_topk_lsh: sign-bit buckets from the emitted
    plane constants, band-OR across tables, candidates exactly scored."""
    vals = _plane_values(num_planes, num_tables, dim, seed)
    return f"""
WITH planes(t, i, j, w) AS (VALUES {vals}),
ce AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
              generate_subscripts(embedding, 1) AS j
       FROM embeddings),
dots AS (SELECT c.vec_id, p.t, p.i, SUM(c.x * p.w) AS d
         FROM ce c JOIN planes p ON p.j = c.j - 1
         GROUP BY 1, 2, 3),
buckets AS (SELECT vec_id, t,
                   SUM(CASE WHEN d > 0 THEN (1 << i) ELSE 0 END) AS bucket
            FROM dots GROUP BY vec_id, t),
qb AS (SELECT vec_id AS query_id, t, bucket FROM buckets WHERE vec_id < {max_query}),
cand AS (SELECT DISTINCT qb.query_id, b.vec_id AS neighbor_id
         FROM qb JOIN buckets b USING (t, bucket)
         WHERE b.vec_id != qb.query_id),
norms AS (SELECT vec_id, SQRT(SUM(x * x)) AS nr FROM ce GROUP BY vec_id),
pair_dots AS (SELECT cd.query_id, cd.neighbor_id, SUM(q.x * c.x) AS dot
              FROM cand cd
              JOIN ce q ON q.vec_id = cd.query_id
              JOIN ce c ON c.vec_id = cd.neighbor_id AND c.j = q.j
              GROUP BY 1, 2),
sims AS (SELECT d.query_id, d.neighbor_id, d.dot / (nq.nr * nc.nr) AS sim
         FROM pair_dots d
         JOIN norms nq ON nq.vec_id = d.query_id
         JOIN norms nc ON nc.vec_id = d.neighbor_id),
ranked AS (SELECT query_id, neighbor_id, sim,
                  CAST(row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
           FROM sims)
SELECT query_id, neighbor_id, ROUND(sim, 6) AS sim, rank
FROM ranked WHERE rank <= {k}
"""


def _embedding_dup_lsh_sql(
    threshold: float = 0.4,
    num_planes: int = 4,
    num_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> str:
    """Oracle for embedding_cosine_dup_pairs (LSH path): same plane
    literals -> same buckets -> same candidate pairs -> exact scoring."""
    vals = _plane_values(num_planes, num_tables, dim, seed)
    return f"""
WITH planes(t, i, j, w) AS (VALUES {vals}),
ce AS MATERIALIZED (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
              generate_subscripts(embedding, 1) AS j
       FROM embeddings),
dots AS (SELECT c.vec_id, p.t, p.i, SUM(c.x * p.w) AS d
         FROM ce c JOIN planes p ON p.j = c.j - 1
         GROUP BY 1, 2, 3),
buckets AS MATERIALIZED (SELECT vec_id, t,
                   SUM(CASE WHEN d > 0 THEN (1 << i) ELSE 0 END) AS bucket
            FROM dots GROUP BY vec_id, t),
cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         FROM buckets a JOIN buckets b USING (t, bucket)
         WHERE a.vec_id < b.vec_id),
norms AS MATERIALIZED (SELECT vec_id, SQRT(SUM(x * x)) AS nr FROM ce GROUP BY vec_id),
pair_dots AS (SELECT cd.vec_a, cd.vec_b, SUM(qa.x * qb.x) AS dot
              FROM cand cd
              JOIN ce qa ON qa.vec_id = cd.vec_a
              JOIN ce qb ON qb.vec_id = cd.vec_b AND qb.j = qa.j
              GROUP BY 1, 2),
sims AS (SELECT d.vec_a, d.vec_b, d.dot / (na.nr * nb.nr) AS sim
         FROM pair_dots d
         JOIN norms na ON na.vec_id = d.vec_a
         JOIN norms nb ON nb.vec_id = d.vec_b)
SELECT vec_a, vec_b, ROUND(sim, 6) AS sim FROM sims WHERE sim >= {threshold}
"""


def _ann_ivf_sql(
    k: int = 5,
    num_centroids: int = 8,
    iters: int = 2,
    nprobe: int = 3,
    max_query: int = 10,
) -> str:
    """Exact oracle for cosine_topk_ivf: the deterministic coarse quantizer
    (initial centroids = smallest vec_ids, Lloyd rounds with ROUND(AVG,6)
    quantization — the same cross-engine bit-stabilization the operator
    applies) unrolled as one CTE pair per round, then nprobe cell probing
    and exact candidate scoring."""
    rounds = []
    prev = "c0"
    for r in range(1, iters + 1):
        rounds.append(f"""
d{r} AS (SELECT ce.vec_id, c.cid, SUM((ce.x - c.w) * (ce.x - c.w)) AS d
         FROM ce JOIN {prev} c ON c.j = ce.j GROUP BY 1, 2),
a{r} AS (SELECT vec_id, cid FROM (
           SELECT vec_id, cid,
                  row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
           FROM d{r}) WHERE rn = 1),
c{r} AS MATERIALIZED (SELECT a.cid, ce.j, ROUND(AVG(ce.x), 6) AS w
         FROM a{r} a JOIN ce ON ce.vec_id = a.vec_id GROUP BY a.cid, ce.j)""")
        prev = f"c{r}"
    return f"""
WITH ce AS MATERIALIZED (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
              generate_subscripts(embedding, 1) AS j
       FROM embeddings),
ids AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {num_centroids})),
c0 AS (SELECT i.cid, ce.j, ce.x AS w FROM ids i JOIN ce ON ce.vec_id = i.vec_id),
{",".join(rounds)},
df AS (SELECT ce.vec_id, c.cid, SUM((ce.x - c.w) * (ce.x - c.w)) AS d
       FROM ce JOIN {prev} c ON c.j = ce.j GROUP BY 1, 2),
af AS (SELECT vec_id, cid FROM (
         SELECT vec_id, cid,
                row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
         FROM df) WHERE rn = 1),
qp AS (SELECT vec_id AS query_id, cid FROM (
         SELECT vec_id, cid,
                row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
         FROM df WHERE vec_id < {max_query}) WHERE rn <= {nprobe}),
cand AS (SELECT DISTINCT qp.query_id, af.vec_id AS neighbor_id
         FROM qp JOIN af USING (cid) WHERE af.vec_id != qp.query_id),
norms AS (SELECT vec_id, SQRT(SUM(x * x)) AS nr FROM ce GROUP BY vec_id),
pair_dots AS (SELECT cd.query_id, cd.neighbor_id, SUM(q.x * c.x) AS dot
              FROM cand cd
              JOIN ce q ON q.vec_id = cd.query_id
              JOIN ce c ON c.vec_id = cd.neighbor_id AND c.j = q.j
              GROUP BY 1, 2),
sims AS (SELECT d.query_id, d.neighbor_id, d.dot / (nq.nr * nc.nr) AS sim
         FROM pair_dots d
         JOIN norms nq ON nq.vec_id = d.query_id
         JOIN norms nc ON nc.vec_id = d.neighbor_id),
ranked AS (SELECT query_id, neighbor_id, sim,
                  CAST(row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
           FROM sims)
SELECT query_id, neighbor_id, ROUND(sim, 6) AS sim, rank
FROM ranked WHERE rank <= {k}
"""


_SIMHASH_PAIRS_SQL = (
    "WITH s AS MATERIALIZED ("
    + _SIMHASH_SQL
    + """)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
"""
)


def _media_features_sql(n: int, seed: int = 7) -> str:
    """Precomputed VALUES oracle for media_features: the fake-media payloads
    are seeded (operators/multimodal.py fake_media_rows), so the expected
    (byte_len, mean, entropy) rows are derived from the same bytes with the
    same pure NumPy kernel — independent of any Spark execution."""
    import numpy as np

    from .operators.multimodal import fake_media_rows, payload_stats

    rows = []
    for mid, payload, _meta in fake_media_rows(n, seed):
        ln, mean, ent = payload_stats(bytes(payload))
        rows.append(
            f"({mid},{ln},{float(np.round(mean, 6)):.17e},{float(np.round(ent, 6)):.17e})"
        )
    return (
        "SELECT CAST(media_id AS BIGINT) AS media_id, CAST(byte_len AS BIGINT) AS byte_len, "
        "CAST(byte_mean AS DOUBLE) AS byte_mean, CAST(byte_entropy AS DOUBLE) AS byte_entropy "
        "FROM (VALUES " + ",".join(rows) + ") AS t(media_id, byte_len, byte_mean, byte_entropy)"
    )


N_REAL_MEDIA = 18  # real-codec fixture size: 6 ppm + 6 bmp + 6 wav
_REAL_MEDIA_SEED = 11


def _decode_image_real_sql(n: int = N_REAL_MEDIA, seed: int = _REAL_MEDIA_SEED,
                           out_h: int = 8, out_w: int = 8) -> str:
    """Precomputed VALUES oracle for the REAL image decode: payloads are
    seeded PPM/BMP encodings, so the expected pixel digests are derived
    from the same bytes with the pure NumPy codecs — no Spark involved.
    px_md5 is md5 of the canonical comma-joined pixel string (Spark computes
    it JVM-side via F.md5; here via hashlib on identical bytes)."""
    import hashlib

    import numpy as np

    from .operators.multimodal import (
        _resize_nearest,
        decode_bmp,
        decode_ppm,
        real_media_rows,
    )

    rows = []
    for mid, payload, meta in real_media_rows(n, seed):
        fmt = meta[1]
        if fmt == "ppm":
            img = decode_ppm(bytes(payload))
        elif fmt == "bmp":
            img = decode_bmp(bytes(payload))
        else:
            continue
        px = _resize_nearest(img, out_h, out_w).ravel().astype(np.int64)
        s = ",".join(str(int(x)) for x in px)
        rows.append(
            f"({mid},{out_h},{out_w},{int(px.sum())},"
            f"'{hashlib.md5(s.encode()).hexdigest()}')"
        )
    return (
        "SELECT CAST(media_id AS BIGINT) AS media_id, CAST(height AS INTEGER) AS height, "
        "CAST(width AS INTEGER) AS width, CAST(px_sum AS BIGINT) AS px_sum, px_md5 "
        "FROM (VALUES " + ",".join(rows) + ") AS t(media_id, height, width, px_sum, px_md5)"
    )


def _decode_audio_real_sql(n: int = N_REAL_MEDIA, seed: int = _REAL_MEDIA_SEED) -> str:
    """Precomputed VALUES oracle for the REAL WAV decode (same pattern)."""
    import numpy as np

    from .operators.multimodal import decode_wav, real_media_rows

    rows = []
    for mid, payload, meta in real_media_rows(n, seed):
        if meta[1] != "wav":
            continue
        sr, samples = decode_wav(bytes(payload))
        x = samples.astype(np.float64)
        mean_abs = float(np.round(np.abs(x).mean(), 6))
        rms = float(np.round(np.sqrt((x * x).mean()), 6))
        rows.append(f"({mid},{sr},{x.size},{mean_abs:.17e},{rms:.17e})")
    return (
        "SELECT CAST(media_id AS BIGINT) AS media_id, CAST(sample_rate AS INTEGER) AS sample_rate, "
        "CAST(n_samples AS BIGINT) AS n_samples, CAST(mean_abs AS DOUBLE) AS mean_abs, "
        "CAST(rms AS DOUBLE) AS rms "
        "FROM (VALUES " + ",".join(rows) + ") AS t(media_id, sample_rate, n_samples, mean_abs, rms)"
    )


_STREAM_FIXTURE_CONVS = 120
_STREAM_FIXTURE_SEED = 29
_STREAM_FIXTURE_FILES = 3


def _ensure_stream_fixture() -> str:
    """Deterministic 3-file transcript parquet, consumed by both the
    streaming query (Spark file-source stream) and its DuckDB oracle
    (read_parquet of the same files). Lives under the per-user fixture root
    and is validated by content hash before reuse (a stale/foreign/partial
    dir is discarded and rebuilt); publish_dir absorbs concurrent-writer
    races (content is seed-determined, so any winner is correct)."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from .fixtures import (
        fixture_base_dir,
        make_transcripts_pdf,
        publish_dir,
        seal_dir,
        valid_fixture_dir,
    )

    path = (
        f"{fixture_base_dir()}/stream_c{_STREAM_FIXTURE_CONVS}"
        f"_s{_STREAM_FIXTURE_SEED}_f{_STREAM_FIXTURE_FILES}"
    )
    if valid_fixture_dir(path):
        return path
    shutil.rmtree(path, ignore_errors=True)
    pdf = make_transcripts_pdf(_STREAM_FIXTURE_CONVS, seed=_STREAM_FIXTURE_SEED)
    tmp = f"{path}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    rank = pdf.groupby("conv_id")["turn_idx"].rank(method="first") - 1
    size = pdf.groupby("conv_id")["turn_idx"].transform("size")
    slot = (rank * _STREAM_FIXTURE_FILES // size).astype(int)
    for k in range(_STREAM_FIXTURE_FILES):
        part = pdf[slot == k]
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            f"{tmp}/part-{k:03d}.parquet",
        )
    seal_dir(tmp)
    publish_dir(tmp, path)
    return path


def _stream_seq_sql() -> str:
    path = _ensure_stream_fixture()
    return f"""
  SELECT conv_id, src_turn, dst_turn FROM (
    SELECT conv_id, turn_idx AS src_turn,
           lead(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS dst_turn
    FROM read_parquet('{path}/*.parquet')
  ) WHERE dst_turn IS NOT NULL
"""


_ANN_TOPK_SQL = """
WITH ce AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings),
norms AS (SELECT vec_id, SQRT(SUM(x * x)) AS nr FROM ce GROUP BY vec_id),
qe AS (SELECT vec_id AS query_id, x, i FROM ce WHERE vec_id < 10),
dots AS (SELECT q.query_id, c.vec_id AS neighbor_id, SUM(q.x * c.x) AS dot
         FROM qe q JOIN ce c ON q.i = c.i
         WHERE c.vec_id != q.query_id
         GROUP BY 1, 2),
sims AS (SELECT d.query_id, d.neighbor_id, d.dot / (nq.nr * nc.nr) AS sim
         FROM dots d
         JOIN norms nq ON nq.vec_id = d.query_id
         JOIN norms nc ON nc.vec_id = d.neighbor_id),
ranked AS (SELECT query_id, neighbor_id, sim,
                  CAST(row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
           FROM sims)
SELECT query_id, neighbor_id, ROUND(sim, 6) AS sim, rank
FROM ranked WHERE rank <= 5
"""


# ------------------------------------------------------------ queries map
def _q_seq_edges(spark, sf_dir):
    return events_seq_edges(spark, sf_dir)


def _q_degree_out(spark, sf_dir):
    e = events_seq_edges(spark, sf_dir)
    return e.groupBy(F.col("src").alias("vid")).agg(F.count(F.lit(1)).alias("out_degree"))


def _q_degrees(spark, sf_dir):
    return degrees(events_seq_edges(spark, sf_dir))


def _q_distinct_vertex_count(spark, sf_dir):
    return distinct_vertex_count(events_seq_edges(spark, sf_dir))


def _q_graph_stats(spark, sf_dir):
    s = graph_statistics(events_seq_edges(spark, sf_dir))
    return s.select(
        "num_edges", "num_vertices", "max_vid", "max_in_degree", "max_out_degree",
        F.round("avg_in_degree", 6).alias("avg_in_degree"),
        F.round("avg_out_degree", 6).alias("avg_out_degree"),
    )


def _q_vertex_compaction(spark, sf_dir):
    """Exercises the scale path (range shuffle + Arrow offset pass), not the
    single-partition window variant — both produce identical output; the
    window variant is oracle-checked against this one in pytest."""
    return compact_ids_scalable(distinct_vertices(events_seq_edges(spark, sf_dir)))


def _q_triangles(spark, sf_dir):
    return triangle_count(mod_edges(spark, sf_dir))


def _q_triangles_per_vertex(spark, sf_dir):
    from .plans.triangles import per_vertex_triangles

    return per_vertex_triangles(mod_edges(spark, sf_dir))


def _q_clustering(spark, sf_dir):
    cc = clustering_coefficients(mod_edges(spark, sf_dir))
    return cc.select("vid", "deg", "triangles", F.round("lcc", 6).alias("lcc"))


def _q_transitivity(spark, sf_dir):
    t = transitivity(mod_edges(spark, sf_dir))
    return t.select(
        "num_triangles", "num_wedges", F.round("transitivity", 6).alias("transitivity")
    )


HARMONIC_SEEDS = [0, 7, 101]  # present in the kc graph at every driver sf


def _q_harmonic(spark, sf_dir):
    """Landmark harmonic centrality (3-probe estimate) on the kc graph."""
    from .plans.centrality import harmonic_centrality

    h = harmonic_centrality(kc_edges(spark, sf_dir), HARMONIC_SEEDS)
    return h.select("vid", F.round("harmonic", 6).alias("harmonic"))


def _harmonic_sql(seeds: list[int] = HARMONIC_SEEDS, max_d: int = 250) -> str:
    vals = ",".join(f"({s})" for s in seeds)
    return f"""
WITH RECURSIVE
edges AS ({KC_SQL}),
seeds(s) AS (VALUES {vals}),
walk(s, v, d) AS (
  SELECT s, CAST(s AS BIGINT), CAST(0 AS BIGINT) FROM seeds
  UNION
  SELECT w.s, e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.v WHERE w.d < {max_d}
),
dist AS (SELECT s, v, MIN(d) AS dist FROM walk GROUP BY s, v)
SELECT v AS vid, ROUND(SUM(1.0 / dist), 6) AS harmonic
FROM dist WHERE dist > 0 GROUP BY v
"""


def _q_anf(spark, sf_dir):
    """HyperBall-style approximate neighborhood function at depth 3 on the
    kc graph — per-vertex HLL ball-cardinality estimates, register-exact
    vs the closure-derived oracle."""
    from .plans.anf import anf_estimates, run_anf

    res = run_anf(kc_edges(spark, sf_dir), depth=3)
    return anf_estimates(res.state).select(
        "vid", F.round("est", 6).alias("anf3")
    )


def _anf_sql(depth: int = 3) -> str:
    """Exact bounded-depth closure -> the SAME md5-derived HLL registers
    and estimator as plans/anf.py (see its module docstring: 2^-rho sums
    are exact powers of two, so the arithmetic is bit-identical)."""
    from .functions.hashing import md5_int63_sql

    h = md5_int63_sql("CAST(v AS VARCHAR)")
    return f"""
WITH RECURSIVE
edges AS ({KC_SQL}),
verts AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
walk(a, b, d) AS (
  SELECT v, v, 0 FROM verts
  UNION
  SELECT w.a, e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.b WHERE w.d < {depth}
),
hx AS (SELECT v, {h} AS hv FROM verts),
items AS (SELECT r.a AS v, (hx.hv % 16) AS j,
                 CASE WHEN (hx.hv >> 4) = 0 THEN 57
                      ELSE 1 + CAST(floor(log2(CAST((hx.hv >> 4) & (-(hx.hv >> 4)) AS DOUBLE))) AS INT)
                 END AS rho
          FROM (SELECT DISTINCT a, b FROM walk) r JOIN hx ON hx.v = r.b),
regs AS (SELECT v, j, MAX(rho) AS r FROM items GROUP BY v, j),
sums AS (SELECT v, SUM(POWER(2.0, -r)) + (16 - COUNT(*)) AS s,
                16 - COUNT(*) AS zeros
         FROM regs GROUP BY v),
est AS (SELECT v, CASE WHEN (0.673 * 256 / s) <= 40.0 AND zeros > 0
                       THEN 16.0 * LN(16.0 / zeros)
                       ELSE 0.673 * 256 / s END AS e
        FROM sums)
SELECT v AS vid, ROUND(e, 6) AS anf3 FROM est
"""


def _q_degree_hist(spark, sf_dir):
    """Log2-binned undirected degree histogram on the kc closure."""
    from .plans.stats import degree_histogram

    return degree_histogram(kc_edges(spark, sf_dir))


DEGREE_HIST_SQL = f"""
WITH edges AS ({KC_SQL}),
und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
canon AS (SELECT src, dst FROM und WHERE src < dst),
deg AS (SELECT v, COUNT(*) AS deg FROM (
          SELECT src AS v FROM canon UNION ALL SELECT dst FROM canon)
        GROUP BY v)
SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket,
       COUNT(*) AS n_vertices,
       MIN(deg) AS min_degree, MAX(deg) AS max_degree
FROM deg GROUP BY 1
"""


def _q_eigenvector(spark, sf_dir):
    """Eigenvector centrality (Bonacich power iteration, 3 L2-normalized
    sweeps) on the kc graph's undirected closure."""
    from .plans.centrality import run_eigenvector

    ev = run_eigenvector(kc_edges(spark, sf_dir), iters=3)
    return ev.select("vid", F.round("score", 6).alias("score"))


def _eigenvector_sql(iters: int = 3) -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({KC_SQL}),",
        "und AS MATERIALIZED (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM und),",
        "x0 AS (SELECT v, 1.0 AS score FROM verts),",
    ]
    for k in range(1, iters + 1):
        parts.append(f"""
xr{k} AS MATERIALIZED (SELECT e.dst AS v, SUM(p.score) AS s
        FROM und e JOIN x{k-1} p ON p.v = e.src GROUP BY e.dst),
n{k} AS (SELECT SQRT(SUM(s * s)) AS nrm FROM xr{k}),
x{k} AS MATERIALIZED (SELECT v.v, COALESCE(r.s, 0.0) / n{k}.nrm AS score
        FROM verts v CROSS JOIN n{k} LEFT JOIN xr{k} r ON r.v = v.v),""")
    sql = "\n".join(parts).rstrip(",")
    return sql + f"\nSELECT v AS vid, ROUND(score, 6) AS score FROM x{iters}"


def _q_katz(spark, sf_dir):
    """Katz centrality (alpha=0.1, beta=1, 3 truncated sweeps) on the kc
    digraph — directed, unlike eigen3_kc's undirected closure, so in-degree-0
    conversation-opener vertices sit at the beta baseline."""
    from .plans.centrality import run_katz

    kz = run_katz(kc_edges(spark, sf_dir), alpha=0.1, beta=1.0, iters=3)
    return kz.select("vid", F.round("score", 6).alias("score"))


def _katz_sql(alpha: float = 0.1, beta: float = 1.0, iters: int = 3) -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({KC_SQL}),",
        "verts AS MATERIALIZED (SELECT DISTINCT v FROM "
        "(SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges)),",
        f"x0 AS (SELECT v, CAST({beta} AS DOUBLE) AS score FROM verts),",
    ]
    for k in range(1, iters + 1):
        parts.append(f"""
xr{k} AS MATERIALIZED (SELECT e.dst AS v, SUM(p.score) AS s
        FROM edges e JOIN x{k-1} p ON p.v = e.src GROUP BY e.dst),
x{k} AS MATERIALIZED (SELECT v.v, {beta} + {alpha} * COALESCE(r.s, 0.0) AS score
        FROM verts v LEFT JOIN xr{k} r ON r.v = v.v),""")
    sql = "\n".join(parts).rstrip(",")
    return sql + f"\nSELECT v AS vid, ROUND(score, 6) AS score FROM x{iters}"


def _q_closeness(spark, sf_dir):
    """Landmark closeness centrality (3 probes) on the kc graph."""
    from .plans.centrality import closeness_centrality

    c = closeness_centrality(kc_edges(spark, sf_dir), HARMONIC_SEEDS)
    return c.select(
        "vid", "n_probes", F.round("closeness", 6).alias("closeness")
    )


def _closeness_sql(seeds: list[int] = HARMONIC_SEEDS, max_d: int = 250) -> str:
    vals = ",".join(f"({s})" for s in seeds)
    return f"""
WITH RECURSIVE
edges AS ({KC_SQL}),
seeds(s) AS (VALUES {vals}),
walk(s, v, d) AS (
  SELECT s, CAST(s AS BIGINT), CAST(0 AS BIGINT) FROM seeds
  UNION
  SELECT w.s, e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.v WHERE w.d < {max_d}
),
dist AS (SELECT s, v, MIN(d) AS dist FROM walk GROUP BY s, v)
SELECT v AS vid, CAST(COUNT(*) AS BIGINT) AS n_probes,
       ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(dist), 6) AS closeness
FROM dist WHERE dist > 0 GROUP BY v
"""


def _q_betweenness(spark, sf_dir):
    """Landmark betweenness (sampled Brandes, 3 probe sources) on the kc
    graph."""
    from .plans.betweenness import landmark_betweenness

    b = landmark_betweenness(kc_edges(spark, sf_dir), HARMONIC_SEEDS)
    return b.select("vid", F.round("betweenness", 6).alias("betweenness"))


def _betweenness_sql_for(seed_maxd: list[tuple[int, int]]) -> str:
    """Unrolled per-source Brandes: recursive-CTE BFS levels, then
    (derived-depth) layered sigma forward and delta backward sweeps —
    exactly plans/betweenness.py's joins in SQL. seed_maxd carries each
    probe's NumPy-derived eccentricity (the layer count)."""
    parts = [f"WITH RECURSIVE\nedges AS MATERIALIZED ({KC_SQL}),"]
    pieces = []
    for s, maxd in seed_maxd:
        if maxd < 1:
            continue
        parts.append(f"""
walk{s}(v, d) AS (
  SELECT CAST({s} AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT e.dst, w.d + 1 FROM walk{s} w JOIN edges e ON e.src = w.v WHERE w.d < {maxd}),
dist{s} AS MATERIALIZED (SELECT v, MIN(d) AS dist FROM walk{s} GROUP BY v),
sig{s}_0 AS (SELECT CAST({s} AS BIGINT) AS v, CAST(1 AS DOUBLE) AS sigma),""")
        for d in range(1, maxd + 1):
            parts.append(f"""
sig{s}_{d} AS MATERIALIZED (SELECT e.dst AS v, SUM(p.sigma) AS sigma
  FROM sig{s}_{d-1} p JOIN edges e ON e.src = p.v
  JOIN dist{s} dd ON dd.v = e.dst AND dd.dist = {d}
  GROUP BY e.dst),""")
        parts.append(
            f"\ndel{s}_{maxd} AS (SELECT v, 0.0 AS delta FROM sig{s}_{maxd}),"
        )
        for d in range(maxd - 1, 0, -1):
            parts.append(f"""
c{s}_{d} AS (SELECT e.src AS v, SUM(ls.sigma / lw.sigma * (1 + dw.delta)) AS x
  FROM edges e
  JOIN sig{s}_{d} ls ON ls.v = e.src
  JOIN sig{s}_{d+1} lw ON lw.v = e.dst
  JOIN del{s}_{d+1} dw ON dw.v = e.dst
  GROUP BY e.src),
del{s}_{d} AS MATERIALIZED (SELECT l.v, COALESCE(c.x, 0.0) AS delta
  FROM sig{s}_{d} l LEFT JOIN c{s}_{d} c ON c.v = l.v),""")
        pieces.extend(f"SELECT v, delta FROM del{s}_{d}" for d in range(1, maxd + 1))
    body = "".join(parts).rstrip(",")
    union = "\nUNION ALL\n".join(pieces)
    return (
        body
        + f"\nSELECT v AS vid, ROUND(SUM(delta), 6) AS betweenness FROM (\n{union}\n) GROUP BY v"
    )


@functools.cache
def betweenness_oracle_sql(sf_dir: str = _DRIVER_SF_DIR) -> str:
    """Landmark-betweenness oracle with per-source layer counts DERIVED
    from the input (no measured constants — same rule as kcore/ktruss)."""
    from .oracle import bfs_dist

    arr = _kc_edges_np(sf_dir)
    seed_maxd = []
    for s in HARMONIC_SEEDS:
        dd = bfs_dist(arr, s)
        seed_maxd.append((s, max(dd.values()) if dd else 0))
    return _betweenness_sql_for(tuple(seed_maxd))


NF_CURVE_DEPTH = 4


def _q_nf_curve(spark, sf_dir):
    """Neighborhood-function curve NF(d), d = 1..4, on the kc graph —
    the effective-diameter input (HyperBall's deliverable). Per-vertex
    estimates round to 6 dp and sum in DECIMAL, so the totals are
    order-independent and bit-identical to the oracle."""
    from .plans.anf import neighborhood_function

    curve = neighborhood_function(kc_edges(spark, sf_dir), NF_CURVE_DEPTH)
    return spark.createDataFrame(curve, "d int, nf double")


def _nf_curve_sql(max_depth: int = NF_CURVE_DEPTH) -> str:
    from .functions.hashing import md5_int63_sql

    h = md5_int63_sql("CAST(v AS VARCHAR)")
    parts = [f"""
WITH RECURSIVE
edges AS ({KC_SQL}),
verts AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
walk(a, b, d) AS (
  SELECT v, v, 0 FROM verts
  UNION
  SELECT w.a, e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.b WHERE w.d < {max_depth}
),
mind AS (SELECT a, b, MIN(d) AS md FROM walk GROUP BY a, b),
hx AS (SELECT v, {h} AS hv FROM verts),
items AS (SELECT m.a AS v, m.md, (hx.hv % 16) AS j,
                 CASE WHEN (hx.hv >> 4) = 0 THEN 57
                      ELSE 1 + CAST(floor(log2(CAST((hx.hv >> 4) & (-(hx.hv >> 4)) AS DOUBLE))) AS INT)
                 END AS rho
          FROM mind m JOIN hx ON hx.v = m.b),"""]
    for dd in range(1, max_depth + 1):
        parts.append(f"""
regs{dd} AS (SELECT v, j, MAX(rho) AS r FROM items WHERE md <= {dd} GROUP BY v, j),
sums{dd} AS (SELECT v, SUM(POWER(2.0, -r)) + (16 - COUNT(*)) AS s,
                    16 - COUNT(*) AS zeros FROM regs{dd} GROUP BY v),
est{dd} AS (SELECT CASE WHEN (0.673 * 256 / s) <= 40.0 AND zeros > 0
                        THEN 16.0 * LN(16.0 / zeros)
                        ELSE 0.673 * 256 / s END AS e FROM sums{dd}),
tot{dd} AS (SELECT {dd} AS d,
                   ROUND(CAST(SUM(CAST(ROUND(e, 6) AS DECIMAL(18,6))) AS DOUBLE), 6) AS nf
            FROM est{dd}),""")
    body = "".join(parts).rstrip(",")
    union = "\nUNION ALL\n".join(
        f"SELECT d, nf FROM tot{dd}" for dd in range(1, max_depth + 1)
    )
    return body + "\n" + union


def _q_eff_diameter(spark, sf_dir):
    """q=0.9 effective diameter from the depth-4 NF curve on the kc graph
    (HyperBall's headline deliverable). Driver-side interpolation over the
    4-scalar curve — mirrored by the oracle's window interpolation."""
    from .plans.anf import effective_diameter

    d = effective_diameter(
        kc_edges(spark, sf_dir), q=0.9, max_depth=NF_CURVE_DEPTH
    )
    return spark.createDataFrame(
        [(round(d, 6),)], "eff_diameter double"
    )


def _eff_diameter_sql(q: float = 0.9) -> str:
    return f"""
WITH curve AS ({_nf_curve_sql()}),
tgt AS (SELECT {q} * nf AS t FROM curve WHERE d = {NF_CURVE_DEPTH}),
w AS (SELECT d, nf, LAG(d, 1, 0) OVER (ORDER BY d) AS pd,
             LAG(nf, 1, 0.0) OVER (ORDER BY d) AS pnf FROM curve),
sel AS (SELECT w.*, tgt.t FROM w CROSS JOIN tgt WHERE w.nf >= tgt.t
        ORDER BY w.d LIMIT 1)
SELECT ROUND(CASE WHEN nf = pnf THEN CAST(d AS DOUBLE)
             ELSE pd + (t - pnf) / (nf - pnf) END, 6) AS eff_diameter
FROM sel
"""


def _q_link_scores(spark, sf_dir):
    """Full classical link-prediction measure set (cn/AA/RA/Jaccard/PA),
    global top-50 by Jaccard, on the sparser kc graph."""
    from .plans.linkpred import link_scores

    ls = link_scores(kc_edges(spark, sf_dir), top_k=50)
    return ls.select(
        "u", "v", "common_neighbors",
        F.round("aa_score", 6).alias("aa_score"),
        F.round("ra_score", 6).alias("ra_score"),
        F.round("jaccard", 6).alias("jaccard"),
        "pref_attachment", "rank",
    )


def _q_adamic_adar(spark, sf_dir):
    """Global top-50 Adamic-Adar link predictions on the sparser kc graph
    (the mod graph is near-complete at sf0.01 — nearly no non-adjacent
    pairs to predict)."""
    aa = adamic_adar(kc_edges(spark, sf_dir), top_k=50)
    return aa.select(
        "u", "v", "common_neighbors", F.round("aa_score", 6).alias("aa_score"), "rank"
    )


def _q_assortativity(spark, sf_dir):
    r = degree_assortativity(mod_edges(spark, sf_dir))
    return r.select(F.round("assortativity", 6).alias("assortativity"))


def _q_pagerank3(spark, sf_dir):
    res = run_pagerank(mod_edges(spark, sf_dir), tol=0.0, max_iter=3,
                       engine_kwargs={"salt_skew": False})
    return res.state.select("vid", F.round("value", 6).alias("rank"))


def _q_ppr3(spark, sf_dir):
    """Personalized PageRank (random walk with restart from 3 seeds), 3
    synchronous sweeps — teleport and dangling mass flow to the seeds."""
    res = run_pagerank(mod_edges(spark, sf_dir), tol=0.0, max_iter=3,
                       engine_kwargs={"salt_skew": False},
                       personalize=list(PPR_SEEDS))
    return res.state.select("vid", F.round("value", 6).alias("rank"))


def _q_pagerank_warm_mod(spark, sf_dir):
    """PageRank IncEval face: 2 rounds on ~4/5 of the mod graph, then 2
    warm-started rounds on the full graph from the carried-over ranks
    (new vertices at 1/n, renormalized); parameters must mirror
    _pagerank_warm_sql's."""
    e = mod_edges(spark, sf_dir)
    base = e.filter((F.col("src") + F.col("dst") * 3) % 5 != 0)
    prev = run_pagerank(base, tol=0.0, max_iter=2,
                        engine_kwargs={"salt_skew": False})
    res = run_pagerank(e, tol=0.0, max_iter=2, init_ranks=prev.state,
                       engine_kwargs={"salt_skew": False})
    return res.state.select("vid", F.round("value", 6).alias("rank"))


def _q_pagerank_minigraph3(spark, sf_dir):
    res = run_pagerank(mod_edges(spark, sf_dir), variant="minigraph", max_iter=3,
                       engine_kwargs={"salt_skew": False})
    return res.state.select("vid", F.round("value", 6).alias("rank"))


def _q_lpa2(spark, sf_dir):
    res = run_lpa(mod_edges(spark, sf_dir), max_iter=2,
                  engine_kwargs={"salt_skew": False})
    return res.state.select("vid", F.col("value").alias("label"))


def _q_modularity(spark, sf_dir):
    """Newman modularity of the 2-iteration LPA partition on the mod
    graph — the community-quality score next to the labels themselves."""
    from .plans.modularity import modularity

    res = run_lpa(mod_edges(spark, sf_dir), max_iter=2,
                  engine_kwargs={"salt_skew": False})
    labels = res.state.select("vid", F.col("value").alias("label"))
    q = modularity(mod_edges(spark, sf_dir), labels)
    return q.select(F.round("modularity", 6).alias("modularity"))


def _modularity_sql() -> str:
    """Q of the lpa2_mod labels, mirroring plans/modularity.py: e_c/m -
    (deg_c/2m)^2 summed over communities of the canonical undirected
    closure."""
    return f"""
WITH labels AS MATERIALIZED ({_lpa2_sql()}),
edges AS MATERIALIZED ({MOD_SQL}),
canon AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst FROM edges),
m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM canon),
ein AS (SELECT l1.label, COUNT(*) AS e_c
        FROM canon c JOIN labels l1 ON l1.vid = c.src
        JOIN labels l2 ON l2.vid = c.dst AND l2.label = l1.label
        GROUP BY l1.label),
deg AS (SELECT v, COUNT(*) AS deg FROM (
          SELECT src AS v FROM canon UNION ALL SELECT dst FROM canon)
        GROUP BY v),
degc AS (SELECT l.label, SUM(d.deg) AS deg_c
         FROM deg d JOIN labels l ON l.vid = d.v GROUP BY l.label)
SELECT ROUND(SUM(COALESCE(e.e_c, 0) / m.c - POWER(degc.deg_c / (2 * m.c), 2)), 6)
       AS modularity
FROM degc LEFT JOIN ein e ON e.label = degc.label CROSS JOIN m
"""


def _q_conductance(spark, sf_dir):
    """Per-community conductance of the same 2-iteration LPA partition the
    modularity key scores — cut / min(vol, 2m - vol) per label."""
    from .plans.modularity import conductance

    res = run_lpa(mod_edges(spark, sf_dir), max_iter=2,
                  engine_kwargs={"salt_skew": False})
    labels = res.state.select("vid", F.col("value").alias("label"))
    phi = conductance(mod_edges(spark, sf_dir), labels)
    return phi.select("label", "cut", "vol",
                      F.round("conductance", 6).alias("conductance"))


def _conductance_sql() -> str:
    """Mirrors plans/modularity.py::conductance over the lpa2_mod labels:
    a boundary edge counts toward BOTH sides' cuts; vol = summed member
    degree of the canonical undirected closure."""
    return f"""
WITH labels AS MATERIALIZED ({_lpa2_sql()}),
edges AS MATERIALIZED ({MOD_SQL}),
canon AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst FROM edges),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM canon),
lab2 AS (SELECT l1.label AS ls, l2.label AS ld
         FROM canon c JOIN labels l1 ON l1.vid = c.src
         JOIN labels l2 ON l2.vid = c.dst),
cut AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS cut FROM (
          SELECT ls AS label FROM lab2 WHERE ls <> ld
          UNION ALL SELECT ld FROM lab2 WHERE ls <> ld)
        GROUP BY label),
deg AS (SELECT v, COUNT(*) AS deg FROM (
          SELECT src AS v FROM canon UNION ALL SELECT dst FROM canon)
        GROUP BY v),
vol AS (SELECT l.label, CAST(SUM(d.deg) AS BIGINT) AS vol
        FROM deg d JOIN labels l ON l.vid = d.v GROUP BY l.label)
SELECT v.label, COALESCE(c.cut, 0) AS cut, v.vol AS vol,
       ROUND(CASE WHEN LEAST(v.vol, 2 * m.c - v.vol) > 0
             THEN CAST(COALESCE(c.cut, 0) AS DOUBLE)
                  / LEAST(v.vol, 2 * m.c - v.vol)
             ELSE 0.0 END, 6) AS conductance
FROM vol v LEFT JOIN cut c USING (label) CROSS JOIN m
"""


def _q_reciprocity(spark, sf_dir):
    """Directed reciprocity of the mod graph: fraction of distinct
    non-loop links whose reverse link exists."""
    from .plans.stats import reciprocity

    r = reciprocity(mod_edges(spark, sf_dir))
    return r.select("n_edges", "n_reciprocal",
                    F.round("reciprocity", 6).alias("reciprocity"))


_RECIPROCITY_SQL = f"""
WITH edges AS MATERIALIZED ({MOD_SQL}),
d AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
r AS (SELECT CAST(COUNT(*) AS BIGINT) AS c
      FROM d a JOIN d b ON b.src = a.dst AND b.dst = a.src)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_edges,
       r.c AS n_reciprocal,
       ROUND(CAST(r.c AS DOUBLE) / (SELECT COUNT(*) FROM d), 6) AS reciprocity
FROM r
"""


EMB_DIM = 64


def _q_neighbor_emb(spark, sf_dir):
    """GraphSAGE-style mean aggregation of in-neighbor embeddings over a
    deterministic graph on the embedding ids (dst = (vec_id*7+3) mod N,
    self-loops dropped)."""
    from .operators.feature_agg import neighbor_feature_mean

    emb = _t(spark, sf_dir, "embeddings")
    n = emb.count()
    edges = emb.select(
        F.col("vec_id").alias("src"),
        ((F.col("vec_id") * 7 + 3) % n).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    out = neighbor_feature_mean(edges, emb, dim=EMB_DIM)
    return out.select(
        "vid", *[F.round(f"m{i:02d}", 6).alias(f"m{i:02d}") for i in range(EMB_DIM)]
    )


def _neighbor_emb_sql() -> str:
    cols = ",\n       ".join(
        f"ROUND(AVG(e.embedding[{i + 1}]), 6) AS m{i:02d}" for i in range(EMB_DIM)
    )
    return f"""
WITH n AS (SELECT COUNT(*) AS c FROM embeddings),
g AS (SELECT vec_id AS src, (vec_id * 7 + 3) % (SELECT c FROM n) AS dst
      FROM embeddings
      WHERE vec_id != (vec_id * 7 + 3) % (SELECT c FROM n))
SELECT g.dst AS vid,
       {cols}
FROM g JOIN embeddings e ON e.vec_id = g.src
GROUP BY g.dst
"""


def _q_wcc_snr(spark, sf_dir):
    res = run_wcc(snr_edges(spark, sf_dir), engine_kwargs={"salt_skew": False})
    return component_sizes(res.state)


def _q_wcc_csr_snr(spark, sf_dir):
    from .operators.csr import run_wcc_csr

    res = run_wcc_csr(snr_edges(spark, sf_dir), num_partitions=8)
    return component_sizes(res.state)


def _q_bfs_mod(spark, sf_dir):
    e = mod_edges(spark, sf_dir)
    root = e.select(F.least(F.min("src"), F.min("dst")).alias("r")).collect()[0]["r"]
    res = run_bfs(e, root=int(root), engine_kwargs={"salt_skew": False})
    return res.state.filter(F.col("value").isNotNull()).select(
        "vid", F.col("value").alias("dist")
    )


def _q_bfs_csr_mod(spark, sf_dir):
    """BFS through the generalized CSR Arrow fragment path (min-plus kernel
    with local sub-iterations) — same oracle as bfs_mod, so the driver
    verifies kernel generality, not just WCC's min-label instance."""
    from .operators.csr import run_bfs_csr

    e = mod_edges(spark, sf_dir)
    root = e.select(F.least(F.min("src"), F.min("dst")).alias("r")).collect()[0]["r"]
    res = run_bfs_csr(e, root=int(root), num_partitions=8)
    return res.state.filter(F.col("value").isNotNull()).select(
        "vid", F.col("value").alias("dist")
    )


def _q_sssp_weighted_mod(spark, sf_dir):
    """Weighted SSSP over the mod graph — weight is a deterministic
    function of the endpoints so Spark and the DuckDB oracle agree without
    sharing state. The reference declares but never supports weighted
    edges (csr_io_adapter.h:47-49); run_bfs(weight_col=...) does."""
    e = mod_edges(spark, sf_dir).withColumn(
        "w", (F.lit(1) + (F.col("src") * 31 + F.col("dst")) % 9).cast("long")
    )
    root = e.select(F.least(F.min("src"), F.min("dst")).alias("r")).collect()[0]["r"]
    res = run_bfs(e, root=int(root), weight_col="w", engine_kwargs={"salt_skew": False})
    return res.state.filter(F.col("value").isNotNull()).select(
        "vid", F.col("value").alias("dist")
    )


def _q_stream_seq_edges(spark, sf_dir):
    """Structured Streaming face of the seq-edge projection: a deterministic
    transcript fixture is written as 3 arrival-ordered files, drained with
    maxFilesPerTrigger=1 (each conversation spans micro-batches, exercising
    the cross-batch applyInPandasWithState chain). Returns the PRE-HASH edge
    set (conv_id, src_turn, dst_turn) so the DuckDB oracle — a window-lead
    over the same parquet files — checks it exactly (Spark's xxhash64 is not
    reproducible SQL-side; the hashing step is oracle-checked via
    seq_edge_projection). tests/test_streaming.py carries the streamed ==
    batch equality proof including the hashed face."""
    import os

    from .streaming import (
        read_transcript_stream,
        run_available_now,
        stream_seq_edges_raw,
    )

    path = _ensure_stream_fixture()
    stream = read_transcript_stream(spark, path, max_files_per_trigger=1)
    return run_available_now(
        stream_seq_edges_raw(stream), f"stream_seq_edges_{os.getpid()}"
    ).select("conv_id", "src_turn", "dst_turn")


def _q_doc_fingerprint(spark, sf_dir):
    return text_fingerprint(_t(spark, sf_dir, "documents"))


def _q_dedup_keep_min(spark, sf_dir):
    return exact_dedup_keep_min(_t(spark, sf_dir, "documents"))


def _q_minhash(spark, sf_dir):
    return minhash_signatures(_t(spark, sf_dir, "documents"))


def _q_dedup_clusters(spark, sf_dir):
    """Fuzzy-dedup end-to-end: LSH pairs -> WCC -> canonical per cluster."""
    from .operators.dedup import near_dup_clusters

    return near_dup_clusters(_t(spark, sf_dir, "documents"))


def _q_lsh_pairs(spark, sf_dir):
    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"))


def _q_ngram_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"))


def _q_simhash(spark, sf_dir):
    return simhash_fingerprints(_t(spark, sf_dir, "documents"))


def _q_simhash_near_pairs(spark, sf_dir):
    from .operators.dedup import simhash_near_pairs

    return simhash_near_pairs(_t(spark, sf_dir, "documents"), bits=16, max_hamming=2)


def _q_embedding_dup_lsh(spark, sf_dir):
    """Near-duplicate embedding pairs via hyperplane-LSH blocking; the
    testdata embeddings have no true near-dups (max pairwise cosine ~0.51),
    so the threshold is set low to exercise candidate gen + exact scoring."""
    from .operators.similarity import embedding_cosine_dup_pairs

    return embedding_cosine_dup_pairs(
        _t(spark, sf_dir, "embeddings"),
        threshold=0.4, num_planes=4, num_tables=8,
    )


def _q_tfidf(spark, sf_dir):
    from .operators.textops import tfidf_topk

    return tfidf_topk(_t(spark, sf_dir, "documents"), k=3)


_TFIDF_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
scored AS (SELECT t.doc_id, t.term, t.tf, ROUND(t.tf * nd.n / d.df, 6) AS score
           FROM tf t JOIN df d USING (term) CROSS JOIN nd),
ranked AS (SELECT *, CAST(row_number() OVER (
             PARTITION BY doc_id ORDER BY score DESC, tf DESC, term ASC
           ) AS INTEGER) AS rank FROM scored)
SELECT doc_id, term, tf, score, rank FROM ranked WHERE rank <= 3
"""


SESSION_GAP_SECONDS = 43200  # 12h: the driver events' median per-user gap
# is ~7.3h, p90 ~25h — this threshold splits real sessions at every sf


def _q_sessionize(spark, sf_dir):
    from .operators.textops import sessionize

    return sessionize(_t(spark, sf_dir, "events"), gap_seconds=SESSION_GAP_SECONDS)


_SESSIONIZE_SQL = f"""
SELECT event_id, user_id,
       CAST(SUM(new_sess) OVER (
         PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
       ) - 1 AS BIGINT) AS session_seq
FROM (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '{SESSION_GAP_SECONDS}' SECOND
              THEN 1 ELSE 0 END AS new_sess
  FROM events) t
"""


def _q_interarrival(spark, sf_dir):
    """Per-user inter-arrival statistics (whole-second gaps between
    consecutive events) — the tempo profile that calibrated
    SESSION_GAP_SECONDS. Spark cast(ts AS LONG) floors to the second;
    the oracle mirrors it with date_trunc('second') before epoch."""
    from .operators.textops import interarrival_stats

    return interarrival_stats(_t(spark, sf_dir, "events"))


_INTERARRIVAL_SQL = """
SELECT user_id,
       COUNT(*) AS n_events,
       COUNT(gap) AS n_gaps,
       MIN(gap) AS min_gap_s,
       MAX(gap) AS max_gap_s,
       ROUND(AVG(gap), 6) AS avg_gap_s
FROM (
  SELECT user_id,
         sec - lag(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM (SELECT user_id, ts, event_id,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
        FROM events) s) t
GROUP BY user_id
"""


COOC_MIN_SHARED = 25  # 27 pairs at sf0.001, 4382 at sf0.01 — non-trivial
# at every sf (per-user active days ~19-30, so the co-active tail starts ~25)


def _user_day_bip(spark, sf_dir):
    """(user_id, active day) bipartite affiliation table — TIMESTAMP_NTZ +
    UTC session tz, so to_date == DuckDB's CAST(ts AS DATE) exactly."""
    return _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )


def _q_user_day_cooc(spark, sf_dir):
    from .operators.bipartite import cooccurrence

    # max_center_degree=None: the oracle SQL is uncapped, and a day's user
    # degree grows ~10x per sf (1356 at sf0.1) — the production default cap
    # (10k) would silently drop hub days somewhere past sf1 and break
    # engine/oracle parity. Exactness here, the cap stays the library
    # default for uncontrolled inputs.
    return cooccurrence(
        _user_day_bip(spark, sf_dir), "user_id", "day",
        min_shared=COOC_MIN_SHARED, max_center_degree=None,
    ).select(F.col("a").alias("u1"), F.col("b").alias("u2"), "shared")


_COOC_BIP_SQL = (
    "SELECT DISTINCT user_id AS l, CAST(ts AS DATE) AS r FROM events"
)

_USER_DAY_COOC_SQL = f"""
WITH b AS MATERIALIZED ({_COOC_BIP_SQL})
SELECT b1.l AS u1, b2.l AS u2, COUNT(*) AS shared
FROM b b1 JOIN b b2 ON b1.r = b2.r AND b1.l < b2.l
GROUP BY b1.l, b2.l
HAVING COUNT(*) >= {COOC_MIN_SHARED}
"""


def _q_cooc_jaccard(spark, sf_dir):
    """Jaccard-normalized co-occurrence: the raw shared-day projection
    rescaled by each pair's union of active days — the similarity form
    that de-biases hyper-active users (round 6dp for float parity)."""
    from .operators.bipartite import cooccurrence

    return cooccurrence(
        _user_day_bip(spark, sf_dir), "user_id", "day",
        min_shared=COOC_MIN_SHARED, max_center_degree=None,
        normalize="jaccard",
    ).select(
        F.col("a").alias("u1"), F.col("b").alias("u2"), "shared",
        F.round("jaccard", 6).alias("jaccard"),
    )


_COOC_JACCARD_SQL = f"""
WITH b AS MATERIALIZED ({_COOC_BIP_SQL}),
deg AS (SELECT l, COUNT(*) AS d FROM b GROUP BY l),
p AS (SELECT b1.l AS u1, b2.l AS u2, COUNT(*) AS shared
      FROM b b1 JOIN b b2 ON b1.r = b2.r AND b1.l < b2.l
      GROUP BY b1.l, b2.l
      HAVING COUNT(*) >= {COOC_MIN_SHARED})
SELECT p.u1, p.u2, p.shared,
       ROUND(CAST(p.shared AS DOUBLE) / (d1.d + d2.d - p.shared), 6) AS jaccard
FROM p JOIN deg d1 ON p.u1 = d1.l JOIN deg d2 ON p.u2 = d2.l
"""


def _q_butterflies(spark, sf_dir):
    from .operators.bipartite import butterfly_count

    return butterfly_count(_user_day_bip(spark, sf_dir), "user_id", "day")


_BUTTERFLY_SQL = f"""
WITH b AS MATERIALIZED ({_COOC_BIP_SQL}),
p AS (SELECT COUNT(*) AS shared
      FROM b b1 JOIN b b2 ON b1.r = b2.r AND b1.l < b2.l
      GROUP BY b1.l, b2.l)
SELECT CAST(COALESCE(SUM(shared * (shared - 1) // 2), 0) AS BIGINT)
       AS num_butterflies FROM p
"""


def _q_scc_condensation(spark, sf_dir):
    """Condensation DAG of the SCC graph — component-level bowtie edges."""
    from .plans.scc import condensation

    return condensation(scc_edges(spark, sf_dir))


_SCC_CONDENSATION_SQL = f"""
WITH comp AS MATERIALIZED ({SCC_ORACLE_SQL}), ed AS ({SCC_SQL})
SELECT DISTINCT cs.scc_id AS src_scc, cd.scc_id AS dst_scc
FROM ed JOIN comp cs ON cs.vid = ed.src JOIN comp cd ON cd.vid = ed.dst
WHERE cs.scc_id != cd.scc_id
"""


def _q_rich_club(spark, sf_dir):
    """Rich-club connectivity curve phi(k) on the kc graph — do hubs
    preferentially wire to hubs."""
    from .plans.stats import rich_club

    return rich_club(kc_edges(spark, sf_dir))


_RICH_CLUB_SQL = f"""
WITH canon AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS s, GREATEST(src, dst) AS d
  FROM ({KC_SQL}) WHERE src != dst),
deg AS MATERIALIZED (
  SELECT v, COUNT(*) AS deg FROM (
    SELECT s AS v FROM canon UNION ALL SELECT d FROM canon) GROUP BY v),
em AS MATERIALIZED (
  SELECT LEAST(a.deg, b.deg) AS m
  FROM canon JOIN deg a ON a.v = canon.s JOIN deg b ON b.v = canon.d),
ks AS (SELECT UNNEST(range(0, (SELECT MAX(deg) FROM deg))) AS k)
SELECT k,
       (SELECT COUNT(*) FROM deg WHERE deg > k) AS n_nodes,
       (SELECT COUNT(*) FROM em WHERE m > k) AS n_edges,
       CASE WHEN (SELECT COUNT(*) FROM deg WHERE deg > k) >= 2 THEN ROUND(
         CAST(2 * (SELECT COUNT(*) FROM em WHERE m > k) AS DOUBLE)
         / CAST((SELECT COUNT(*) FROM deg WHERE deg > k)
                * ((SELECT COUNT(*) FROM deg WHERE deg > k) - 1) AS DOUBLE),
         6) END AS phi
FROM ks
"""


def _q_bowtie(spark, sf_dir):
    """Broder bow-tie decomposition of the scc graph (CORE/IN/OUT/TUBE/
    TENDRIL/DISC per vertex) — the structural census the SCC machinery
    exists for."""
    from .plans.bowtie import run_bowtie

    return run_bowtie(scc_edges(spark, sf_dir))


_BOWTIE_SQL = f"""
WITH RECURSIVE e AS MATERIALIZED ({SCC_SQL}),
verts AS MATERIALIZED (SELECT src AS v FROM e UNION SELECT dst FROM e),
r AS (SELECT v AS a, v AS b FROM verts
      UNION
      SELECT r.a, e.dst AS b FROM r JOIN e ON e.src = r.b),
comp AS MATERIALIZED (SELECT p.a AS vid, MIN(p.b) AS scc_id
      FROM r p JOIN r q ON q.a = p.b AND q.b = p.a GROUP BY p.a),
core AS (SELECT scc_id AS c FROM comp GROUP BY scc_id
         ORDER BY COUNT(*) DESC, scc_id ASC LIMIT 1),
cr AS MATERIALIZED (SELECT DISTINCT ca.scc_id AS a, cb.scc_id AS b
      FROM r JOIN comp ca ON ca.vid = r.a JOIN comp cb ON cb.vid = r.b),
outc AS MATERIALIZED (
      SELECT DISTINCT b AS c FROM cr WHERE a IN (SELECT c FROM core)),
inc AS MATERIALIZED (
      SELECT DISTINCT a AS c FROM cr WHERE b IN (SELECT c FROM core)),
fin AS MATERIALIZED (
      SELECT DISTINCT cr.b AS c FROM cr JOIN inc ON inc.c = cr.a),
bout AS MATERIALIZED (
      SELECT DISTINCT cr.a AS c FROM cr JOIN outc ON outc.c = cr.b)
SELECT comp.vid,
       CASE WHEN comp.scc_id IN (SELECT c FROM core) THEN 'CORE'
            WHEN comp.scc_id IN (SELECT c FROM inc) THEN 'IN'
            WHEN comp.scc_id IN (SELECT c FROM outc) THEN 'OUT'
            WHEN comp.scc_id IN (SELECT c FROM fin)
             AND comp.scc_id IN (SELECT c FROM bout) THEN 'TUBE'
            WHEN comp.scc_id IN (SELECT c FROM fin)
              OR comp.scc_id IN (SELECT c FROM bout) THEN 'TENDRIL'
            ELSE 'DISC' END AS region
FROM comp
"""


def _q_mis(spark, sf_dir):
    """Deterministic greedy MIS (fixed md5 priorities) on the kc closure."""
    from .plans.mis import run_mis

    return run_mis(kc_edges(spark, sf_dir))


def _mis_sql(rounds: int) -> str:
    """Unrolled synchronous local-minimum MIS rounds; ``rounds`` is derived
    by oracle.mis_greedy (+1 no-op insurance round — past the fixpoint the
    undecided set is empty, so extra rounds contribute nothing). The src !=
    dst guards are insurance only (KC_SQL already excludes self-loops, and
    the kc graph has no self-loop-only vertices for the universe to miss);
    the plan's self-loop semantics live in plans/mis.py's docstring."""
    from .functions.hashing import md5_int63_sql

    h = md5_int63_sql("'mis:' || CAST(v AS VARCHAR)")
    parts = [
        f"WITH und AS MATERIALIZED (SELECT src, dst FROM ({KC_SQL}) "
        "WHERE src != dst",
        "  UNION SELECT dst, src FROM (" + KC_SQL + ") WHERE src != dst),",
        f"u0 AS MATERIALIZED (SELECT v, {h} AS p FROM "
        "(SELECT DISTINCT src AS v FROM und)),",
    ]
    for k in range(rounds):
        parts.append(f"""
ee{k} AS MATERIALIZED (SELECT e.src, e.dst FROM und e
        JOIN u{k} a ON a.v = e.src JOIN u{k} b ON b.v = e.dst),
nm{k} AS (SELECT e.src AS v, MIN(b.p) AS np
          FROM ee{k} e JOIN u{k} b ON b.v = e.dst GROUP BY e.src),
w{k} AS MATERIALIZED (SELECT u.v FROM u{k} u LEFT JOIN nm{k} n ON n.v = u.v
        WHERE n.np IS NULL OR u.p < n.np),
u{k + 1} AS MATERIALIZED (SELECT u.v, u.p FROM u{k} u
        WHERE u.v NOT IN (SELECT v FROM w{k})
          AND u.v NOT IN (SELECT e.dst FROM ee{k} e JOIN w{k} w ON w.v = e.src)),""")
    sql = "\n".join(parts).rstrip(",")
    union = " UNION ALL ".join(f"SELECT v FROM w{k}" for k in range(rounds))
    return sql + f"\nSELECT v AS vid FROM ({union})"


@functools.cache
def mis_oracle_sql(sf_dir: str = _DRIVER_SF_DIR) -> str:
    """MIS oracle: unroll (derived sync rounds + 1); the derivation also
    asserts priority uniqueness and sync == sequential-greedy equality."""
    from .oracle import mis_greedy

    _, rounds = mis_greedy(_kc_edges_np(sf_dir))
    return _mis_sql(rounds + 1)


STRAT_K = 10  # per-language sample size: every driver sf has >= 60 docs
# per language, so each stratum fills completely and the result is 5*K rows


def _q_stratified_sample(spark, sf_dir):
    from .operators.sampling import stratified_sample

    return stratified_sample(
        _t(spark, sf_dir, "documents"), "lang", "doc_id", k=STRAT_K
    )


def _stratified_sample_sql() -> str:
    from .functions.hashing import md5_int63_sql

    h = md5_int63_sql("'strat:' || CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id, lang, rank FROM (
  SELECT doc_id, lang,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY {h}, doc_id)
              AS INTEGER) AS rank
  FROM documents) t WHERE rank <= {STRAT_K}
"""


def _q_bigram_top20(spark, sf_dir):
    from .operators.textops import bigram_topk

    return bigram_topk(_t(spark, sf_dir, "documents"), k=20)


_BIGRAM_SQL = """
WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents),
bg AS (SELECT ts[i] || ' ' || ts[i + 1] AS bigram
       FROM toks, UNNEST(range(1, len(ts))) AS t(i)),
c AS (SELECT bigram, COUNT(*) AS cnt FROM bg GROUP BY bigram),
r AS (SELECT bigram, cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, bigram)
                  AS INTEGER) AS rank FROM c)
SELECT bigram, cnt, rank FROM r WHERE rank <= 20
"""


DAG_KC_SQL = f"""
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM ({KC_SQL})
"""


def dagkc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic DAG: the kc graph oriented low-vid -> high-vid (any
    comparison orientation is acyclic), the layering query's input."""
    e = kc_edges(spark, sf_dir)
    return e.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()


def _q_dag_layers(spark, sf_dir):
    """Longest-path (critical-path) layering of the kc DAG."""
    from .plans.dag import longest_path_layers

    return longest_path_layers(dagkc_edges(spark, sf_dir))


def _dag_layers_sql(rounds: int) -> str:
    parts = [
        f"WITH e AS MATERIALIZED ({DAG_KC_SQL}),",
        "verts AS MATERIALIZED (SELECT DISTINCT v FROM "
        "(SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),",
        "l0 AS (SELECT v, CAST(0 AS BIGINT) AS l FROM verts),",
    ]
    for k in range(1, rounds + 1):
        parts.append(f"""
m{k} AS (SELECT e.dst AS v, MAX(p.l) + 1 AS li
         FROM e JOIN l{k - 1} p ON p.v = e.src GROUP BY e.dst),
l{k} AS MATERIALIZED (SELECT p.v, GREATEST(p.l, COALESCE(m.li, 0)) AS l
         FROM l{k - 1} p LEFT JOIN m{k} m ON m.v = p.v),""")
    sql = "\n".join(parts).rstrip(",")
    return sql + f"\nSELECT v AS vid, l AS layer FROM l{rounds}"


@functools.cache
def dag_layers_oracle_sql(sf_dir: str = _DRIVER_SF_DIR) -> str:
    """Layering oracle: unroll (derived DAG depth + 1 quiescence round);
    the derivation topologically sorts (asserting acyclicity) and computes
    the exact depth on the same canonicalized edge set."""
    import numpy as np

    from .oracle import dag_layers

    e = _kc_edges_np(sf_dir)
    a = np.minimum(e[:, 0], e[:, 1])
    b = np.maximum(e[:, 0], e[:, 1])
    m = a != b
    _, depth = dag_layers(np.stack([a[m], b[m]], axis=1))
    return _dag_layers_sql(depth + 1)


def _q_event_quantiles(spark, sf_dir):
    """Exact per-event-type value percentiles (p50/p90/p99) — exact=True
    is the oracle face (quantile_cont parity); the operator's DEFAULT is
    the scale-safe approx_percentile sketch (see group_quantiles)."""
    from .plans.stats import group_quantiles

    return group_quantiles(
        _t(spark, sf_dir, "events"), "event_type", "value", exact=True
    )


_EVENT_QUANTILES_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS q50,
       ROUND(quantile_cont(value, 0.9), 6) AS q90,
       ROUND(quantile_cont(value, 0.99), 6) AS q99,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


NEG_K = 3  # negatives per vertex for the driver key (m = 4k candidates)


def _q_negative_samples(spark, sf_dir):
    """Deterministic contrastive negatives on the kc graph (pairs with
    walk4_mod's positives)."""
    from .operators.sampling import negative_edge_samples

    return negative_edge_samples(kc_edges(spark, sf_dir), k=NEG_K)


def _negative_samples_sql(k: int = NEG_K) -> str:
    from .functions.hashing import md5_int63_sql

    m = 4 * k
    h = md5_int63_sql(
        "'neg:' || CAST(v.v AS VARCHAR) || ':' || CAST(t.j AS VARCHAR)"
    )
    return f"""
WITH e AS MATERIALIZED ({KC_SQL}),
verts AS MATERIALIZED (SELECT DISTINCT v FROM
  (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
nv AS (SELECT COUNT(*) AS n FROM verts),
dense AS (SELECT v, CAST(row_number() OVER (ORDER BY v) - 1 AS BIGINT) AS d
          FROM verts),
cand AS (SELECT v.v AS vid, t.j, {h} % nv.n AS dd
         FROM verts v CROSS JOIN nv
         CROSS JOIN (SELECT unnest(range(1, {m + 1})) AS j) t),
tgt AS (SELECT c.vid, c.j, d.v AS neg_vid
        FROM cand c JOIN dense d ON d.d = c.dd WHERE d.v != c.vid),
canon AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM e),
ne AS (SELECT t.vid, t.j, t.neg_vid FROM tgt t ANTI JOIN canon c
       ON c.a = LEAST(t.vid, t.neg_vid) AND c.b = GREATEST(t.vid, t.neg_vid)),
best AS (SELECT vid, neg_vid, MIN(j) AS jmin FROM ne GROUP BY vid, neg_vid),
r AS (SELECT vid, neg_vid, CAST(row_number() OVER (
        PARTITION BY vid ORDER BY jmin) AS INTEGER) AS rank FROM best)
SELECT vid, neg_vid, rank FROM r WHERE rank <= {k}
"""


def _q_token_count(spark, sf_dir):
    return token_count(_t(spark, sf_dir, "documents"))


def _q_token_stats(spark, sf_dir):
    return token_stats(_t(spark, sf_dir, "documents"))


def _q_quality(spark, sf_dir):
    return quality_score(_t(spark, sf_dir, "documents"))


def _q_lang_id(spark, sf_dir):
    return lang_id(_t(spark, sf_dir, "documents"))


def _q_ann_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


def _q_ann_topk_mm(spark, sf_dir):
    """The vectorized exact scorer (operators/similarity.cosine_topk_matmul)
    against the SAME brute-force SQL oracle as ann_cosine_topk — proves the
    BLAS partial-topk/merge path is the identical operator, not an
    approximation."""
    from .operators.similarity import cosine_topk_matmul

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk_matmul(emb, emb.filter(F.col("vec_id") < 10), k=5)


def _q_ann_topk_lsh(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk_lsh(
        emb, emb.filter(F.col("vec_id") < 10), k=5, num_planes=4, num_tables=6
    )


def _q_ann_topk_ivf(spark, sf_dir):
    """IVF cell-probed ANN (the third search path: exact / LSH / IVF);
    parameters must mirror _ann_ivf_sql's defaults."""
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk_ivf(
        emb, emb.filter(F.col("vec_id") < 10),
        k=5, num_centroids=8, iters=2, nprobe=3,
    )


N_MEDIA = 24  # fixed fake-media fixture size for the multimodal queries


def _q_media_features(spark, sf_dir):
    from .operators.multimodal import make_fake_media, media_features

    return media_features(make_fake_media(spark, N_MEDIA, seed=7))


def _q_decode_image_real(spark, sf_dir):
    from .operators.multimodal import (
        decode_image,
        image_pixel_digest,
        make_real_media,
    )

    media = make_real_media(spark, N_REAL_MEDIA, seed=_REAL_MEDIA_SEED)
    decoded = decode_image(
        media.filter(F.col("meta.media_type") == "image"),
        out_h=8, out_w=8, fake=False,
    )
    return image_pixel_digest(decoded)


def _q_decode_audio_real(spark, sf_dir):
    from .operators.multimodal import decode_audio, make_real_media

    return decode_audio(make_real_media(spark, N_REAL_MEDIA, seed=_REAL_MEDIA_SEED))


def _q_frame_sample(spark, sf_dir):
    from .operators.multimodal import frame_sample, make_fake_media

    return frame_sample(make_fake_media(spark, N_MEDIA, seed=7), every_n=5, fake=True)


FRAME_SAMPLE_SQL = f"""
  WITH vids AS (
    SELECT i AS media_id, (i % 30) + 1 AS n_frames
    FROM range(0, {N_MEDIA}) t(i) WHERE i % 4 = 3)
  SELECT media_id, CAST(unnest(range(0, n_frames, 5)) AS INTEGER) AS frame_idx
  FROM vids
"""


N_REAL_VIDEO = 9  # real-y4m fixture: 3 each of C444/C422/C420jpeg
_REAL_VIDEO_SEED = 13

N_REAL_PNG = 12  # real-png fixture: 3 each of RGB/gray/palette/RGBA
_REAL_PNG_SEED = 17


def _q_decode_png_real(spark, sf_dir):
    """REAL PNG decode end-to-end (stdlib zlib + NumPy codec — chunk walk,
    CRC validation, inflate, all five unfilter paths, channel expansion),
    digested per image exactly like decode_image_real."""
    from .operators.multimodal import (
        decode_image,
        image_pixel_digest,
        make_real_png,
    )

    pngs = make_real_png(spark, N_REAL_PNG, seed=_REAL_PNG_SEED)
    return image_pixel_digest(decode_image(pngs, out_h=8, out_w=8, fake=False))


def _image_digest_values_sql(rows_fn, decode_fn, n: int, seed: int,
                             out_h: int = 8, out_w: int = 8) -> str:
    """Precomputed VALUES oracle shared by every REAL still-image decode
    key: run the SAME NumPy decode the Spark tasks run (no Spark involved),
    resize, and emit the (media_id, h, w, px_sum, px_md5) digest rows —
    the _decode_image_real_sql pattern, parameterized so the PNG and JPEG
    oracles cannot drift apart."""
    import hashlib

    import numpy as np

    from .operators.multimodal import _resize_nearest

    rows = []
    for mid, payload, _meta in rows_fn(n, seed):
        px = (
            _resize_nearest(decode_fn(bytes(payload)), out_h, out_w)
            .ravel()
            .astype(np.int64)
        )
        s = ",".join(str(int(x)) for x in px)
        rows.append(
            f"({mid},{out_h},{out_w},{int(px.sum())},"
            f"'{hashlib.md5(s.encode()).hexdigest()}')"
        )
    return (
        "SELECT CAST(media_id AS BIGINT) AS media_id, CAST(height AS INTEGER) AS height, "
        "CAST(width AS INTEGER) AS width, CAST(px_sum AS BIGINT) AS px_sum, px_md5 "
        "FROM (VALUES " + ",".join(rows) + ") AS t(media_id, height, width, px_sum, px_md5)"
    )


def _decode_png_real_sql(n: int = N_REAL_PNG, seed: int = _REAL_PNG_SEED,
                         out_h: int = 8, out_w: int = 8) -> str:
    from .operators.multimodal import decode_png, real_png_rows

    return _image_digest_values_sql(real_png_rows, decode_png, n, seed,
                                    out_h, out_w)


N_REAL_JPEG = 12  # real-jpeg fixture: 3 each of RGB444/gray/RGB420/q4+RST
_REAL_JPEG_SEED = 23


def _q_decode_jpeg_real(spark, sf_dir):
    """REAL baseline-JPEG decode end-to-end (pure-NumPy T.81 codec —
    marker walk, in-stream Huffman tables, 4:4:4 + 4:2:0 sampling grids,
    restart-marker predictor resets, dequant + IDCT + YCbCr->RGB),
    digested per image exactly like decode_png_real."""
    from .operators.multimodal import (
        decode_image,
        image_pixel_digest,
        make_real_jpeg,
    )

    jpgs = make_real_jpeg(spark, N_REAL_JPEG, seed=_REAL_JPEG_SEED)
    return image_pixel_digest(decode_image(jpgs, out_h=8, out_w=8, fake=False))


def _decode_jpeg_real_sql(n: int = N_REAL_JPEG, seed: int = _REAL_JPEG_SEED,
                          out_h: int = 8, out_w: int = 8) -> str:
    from .operators.multimodal import decode_jpeg, real_jpeg_rows

    return _image_digest_values_sql(real_jpeg_rows, decode_jpeg, n, seed,
                                    out_h, out_w)


def _q_decode_video_real(spark, sf_dir):
    """REAL video decode end-to-end: Y4M container parse + chroma upsample
    per frame, digested per video (all frames, every_n=1)."""
    from .operators.multimodal import frame_sample, make_real_video, video_digest

    vids = make_real_video(spark, N_REAL_VIDEO, seed=_REAL_VIDEO_SEED)
    return video_digest(frame_sample(vids, every_n=1, fake=False))


def _q_frame_sample_real(spark, sf_dir):
    """REAL frame sampling: decode Y4M, keep every 2nd frame, digest each."""
    from .operators.multimodal import (
        frame_pixel_digest,
        frame_sample,
        make_real_video,
    )

    vids = make_real_video(spark, N_REAL_VIDEO, seed=_REAL_VIDEO_SEED)
    return frame_pixel_digest(frame_sample(vids, every_n=2, fake=False))


def _frame_digest_rows(n: int, seed: int, every_n: int) -> list:
    """(media_id, frame_idx, h, w, px_sum, px_md5) tuples from the same
    NumPy decode the Spark tasks run — no Spark involved (same precomputed-
    VALUES pattern as _decode_image_real_sql)."""
    import hashlib

    import numpy as np

    from .operators.multimodal import decode_y4m, real_video_rows

    out = []
    for mid, payload, _meta in real_video_rows(n, seed):
        frames = decode_y4m(bytes(payload))
        for fi in range(0, frames.shape[0], every_n):
            px = frames[fi].ravel().astype(np.int64)
            s = ",".join(str(int(x)) for x in px)
            out.append(
                (mid, fi, frames.shape[1], frames.shape[2], int(px.sum()),
                 hashlib.md5(s.encode()).hexdigest())
            )
    return out


N_REAL_MP4 = 8
_REAL_MP4_SEED = 29


def _q_decode_mp4_real(spark, sf_dir):
    """REAL Motion-JPEG MP4 decode end-to-end: BMFF box walk (moov/trak/
    stbl sample tables) + per-frame baseline-JPEG decode, digested per
    video exactly like decode_video_real."""
    from .operators.multimodal import frame_sample, make_real_mp4, video_digest

    vids = make_real_mp4(spark, N_REAL_MP4, seed=_REAL_MP4_SEED)
    return video_digest(frame_sample(vids, every_n=1, fake=False))


def _decode_mp4_real_sql(n: int = N_REAL_MP4, seed: int = _REAL_MP4_SEED) -> str:
    """Precomputed VALUES oracle for the REAL MP4 decode — same digest
    derivation as _decode_video_real_sql, over the seeded MP4 fixture."""
    import hashlib
    from collections import defaultdict

    import numpy as np

    from .operators.multimodal import decode_mjpeg_mp4, real_mp4_rows

    per_video: dict[int, list] = defaultdict(list)
    for mid, payload, _meta in real_mp4_rows(n, seed):
        frames = decode_mjpeg_mp4(bytes(payload))
        for fi in range(frames.shape[0]):
            px = frames[fi].ravel().astype(np.int64)
            s = ",".join(str(int(x)) for x in px)
            per_video[mid].append(
                (fi, frames.shape[1], frames.shape[2], int(px.sum()),
                 hashlib.md5(s.encode()).hexdigest())
            )
    rows = []
    for mid in sorted(per_video):
        fr = sorted(per_video[mid])
        vmd5 = hashlib.md5(",".join(m for *_rest, m in fr).encode()).hexdigest()
        rows.append(
            f"({mid},{len(fr)},{fr[0][1]},{fr[0][2]},{sum(x[3] for x in fr)},'{vmd5}')"
        )
    return (
        "SELECT CAST(media_id AS BIGINT) AS media_id, CAST(n_frames AS INTEGER) AS n_frames, "
        "CAST(height AS INTEGER) AS height, CAST(width AS INTEGER) AS width, "
        "CAST(px_sum AS BIGINT) AS px_sum, video_md5 "
        "FROM (VALUES " + ",".join(rows)
        + ") AS t(media_id, n_frames, height, width, px_sum, video_md5)"
    )


def _frame_sample_real_sql(n: int = N_REAL_VIDEO, seed: int = _REAL_VIDEO_SEED,
                           every_n: int = 2) -> str:
    rows = [
        f"({mid},{fi},{h},{w},{ps},'{md5}')"
        for mid, fi, h, w, ps, md5 in _frame_digest_rows(n, seed, every_n)
    ]
    return (
        "SELECT CAST(media_id AS BIGINT) AS media_id, CAST(frame_idx AS INTEGER) AS frame_idx, "
        "CAST(height AS INTEGER) AS height, CAST(width AS INTEGER) AS width, "
        "CAST(px_sum AS BIGINT) AS px_sum, px_md5 "
        "FROM (VALUES " + ",".join(rows)
        + ") AS t(media_id, frame_idx, height, width, px_sum, px_md5)"
    )


def _decode_video_real_sql(n: int = N_REAL_VIDEO, seed: int = _REAL_VIDEO_SEED) -> str:
    import hashlib
    from collections import defaultdict

    per_video: dict[int, list] = defaultdict(list)
    for mid, fi, h, w, ps, md5 in _frame_digest_rows(n, seed, every_n=1):
        per_video[mid].append((fi, h, w, ps, md5))
    rows = []
    for mid in sorted(per_video):
        fr = sorted(per_video[mid])
        vmd5 = hashlib.md5(",".join(m for *_rest, m in fr).encode()).hexdigest()
        rows.append(
            f"({mid},{len(fr)},{fr[0][1]},{fr[0][2]},{sum(x[3] for x in fr)},'{vmd5}')"
        )
    return (
        "SELECT CAST(media_id AS BIGINT) AS media_id, CAST(n_frames AS INTEGER) AS n_frames, "
        "CAST(height AS INTEGER) AS height, CAST(width AS INTEGER) AS width, "
        "CAST(px_sum AS BIGINT) AS px_sum, video_md5 "
        "FROM (VALUES " + ",".join(rows)
        + ") AS t(media_id, n_frames, height, width, px_sum, video_md5)"
    )


def _q_coloring_mod(spark, sf_dir):
    from .plans.coloring import run_coloring

    res = run_coloring(mod_edges(spark, sf_dir), engine_kwargs={"salt_skew": False})
    # the engine counts the final no-conflict sweep; the NumPy derivation
    # counts only rounds that changed a color — drift in either rule now
    # surfaces as THIS loud error, not a confusing 6-dp oracle mismatch
    from .oracle import coloring_changed_rounds

    want = coloring_changed_rounds(_mod_edges_np(sf_dir)) + 1
    assert res.iterations == want, (
        f"coloring unroll drift: engine ran {res.iterations} sweeps, "
        f"NumPy derivation says {want} for {sf_dir}"
    )
    return res.state.select("vid", F.col("value").alias("color"))


# to-convergence variants — exact oracles via deterministic unrolling
# (see build_oracle_sql comments); also covered by NumPy oracles in pytest
def _q_pagerank_converged(spark, sf_dir):
    res = run_pagerank(mod_edges(spark, sf_dir), tol=1e-6, max_iter=200,
                       engine_kwargs={"salt_skew": False})
    from .oracle import pagerank_converged_sweeps

    want = pagerank_converged_sweeps(_mod_edges_np(sf_dir))
    assert res.iterations == want, (
        f"converged-PR unroll drift: engine ran {res.iterations} sweeps, "
        f"NumPy derivation says {want} for {sf_dir}"
    )
    return res.state.select("vid", F.round("value", 6).alias("rank"))


def _q_wcc_seq_converged(spark, sf_dir):
    res = run_wcc(events_seq_edges(spark, sf_dir), engine_kwargs={"salt_skew": False})
    return component_sizes(res.state)


# IncEval faces (plans/wcc.py::run_wcc_incremental, plans/bfs.py::
# run_bfs_incremental): PEval on a deterministic subset of the edges, then
# incremental re-convergence when the remaining edges "arrive". The
# algorithms are monotone under additions, so the incremental fixpoint is
# IDENTICAL to the batch fixpoint on the full graph — the oracle is simply
# the batch oracle, and a hash match proves the incremental path exact.
def _q_wcc_incremental_snr(spark, sf_dir):
    """PEval over supplier->nation links only (one component per nation),
    IncEval when the nation->region links arrive (components merge into the
    5 regions) — the daily-delta shape of a transcript link graph."""
    from .plans.wcc import run_wcc_incremental

    sup = _t(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") + 1000).cast("long").alias("src"),
        (F.col("s_nationkey").cast("long") + 100).alias("dst"),
    )
    nat = _t(spark, sf_dir, "nation").select(
        (F.col("n_nationkey").cast("long") + 100).alias("src"),
        F.col("n_regionkey").cast("long").alias("dst"),
    )
    prev = run_wcc(sup, engine_kwargs={"salt_skew": False})
    res = run_wcc_incremental(sup, nat, prev.state,
                              engine_kwargs={"salt_skew": False})
    return component_sizes(res.state)


def _kcore_sql(k: int, rounds: int) -> str:
    """Unrolled synchronous peel: round r keeps edges whose endpoints both
    had degree >= k in round r-1's edge set. Rounds past the fixpoint are
    no-ops, so unrolling (derived changed-rounds + 2) states the k-core
    exactly (same idempotence argument as the coloring oracle). MATERIALIZED
    CTEs for the same inlining reason as the other unrolled generators."""
    parts = [
        "WITH e0 AS MATERIALIZED (",
        f"  SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS d FROM ({KC_SQL}) t),",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"k{r} AS MATERIALIZED (SELECT v FROM ("
            f"SELECT s AS v FROM e{r-1} UNION ALL SELECT d FROM e{r-1}) t "
            f"GROUP BY v HAVING COUNT(*) >= {k}),"
        )
        parts.append(
            f"e{r} AS MATERIALIZED (SELECT s, d FROM e{r-1} "
            f"WHERE s IN (SELECT v FROM k{r}) AND d IN (SELECT v FROM k{r})),"
        )
    last = f"e{rounds}"
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT DISTINCT v AS vid FROM (SELECT s AS v FROM {last} "
        f"UNION ALL SELECT d FROM {last}) t"
    )
    return "\n".join(parts)


@functools.cache
def kcore_oracle_sql(sf_dir: str = _DRIVER_SF_DIR) -> str:
    """k-core oracle with the unroll depth DERIVED from the input (same
    no-measured-constants rule as pagerank_converged_oracle_sql)."""
    from .oracle import kcore_peel_rounds

    return _kcore_sql(KC_K, kcore_peel_rounds(_kc_edges_np(sf_dir), KC_K) + 2)


def _coreness_sql(rounds: int) -> str:
    """Unrolled synchronous h-index iteration (plans/coreness.py rule):
    s0 = undirected degree; round r replaces each vertex's value with the
    h-index of its neighbors' round r-1 values — MAX(LEAST(val, rn)) over
    the neighbor values sorted descending is exactly the h-index. The
    fixpoint is the core number (Lu et al. 2016); rounds past it are no-ops,
    so unrolling (derived changed-rounds + 2) states coreness exactly."""
    parts = [
        "WITH e0 AS MATERIALIZED (",
        f"  SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS d FROM ({KC_SQL}) t),",
        "sym AS MATERIALIZED (SELECT s, d FROM e0 UNION ALL SELECT d, s FROM e0),",
        "s0 AS MATERIALIZED (SELECT s AS v, COUNT(*) AS val FROM sym GROUP BY s),",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT v, MAX(LEAST(val, rn)) AS val FROM ("
            f"SELECT e.d AS v, s.val, "
            f"ROW_NUMBER() OVER (PARTITION BY e.d ORDER BY s.val DESC) AS rn "
            f"FROM sym e JOIN s{r-1} s ON s.v = e.s) t GROUP BY v),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT v AS vid, CAST(val AS BIGINT) AS coreness FROM s{rounds}"
    )
    return "\n".join(parts)


@functools.cache
def coreness_oracle_sql(sf_dir: str = _DRIVER_SF_DIR) -> str:
    """Coreness oracle with the unroll depth DERIVED from the input; the
    derivation itself re-asserts h-index fixpoint == peel core numbers on
    the actual graph (oracle.coreness_hindex_rounds)."""
    from .oracle import coreness_hindex_rounds

    return _coreness_sql(coreness_hindex_rounds(_kc_edges_np(sf_dir)) + 2)


def _ktruss_sql(k: int, rounds: int) -> str:
    """Unrolled synchronous truss peel: round r keeps edges whose support
    (triangles through them in round r-1's edge set, each canonical triangle
    crediting all three of its edges) is >= k-2. Rounds past the fixpoint
    are no-ops — same idempotence argument as the k-core unroll."""
    parts = [
        "WITH e0 AS MATERIALIZED (",
        f"  SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS d FROM ({KC_SQL}) t),",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"tri{r} AS MATERIALIZED ("
            f"SELECT ab.s AS a, ab.d AS b, bc.d AS c "
            f"FROM e{r-1} ab JOIN e{r-1} bc ON bc.s = ab.d "
            f"JOIN e{r-1} ac ON ac.s = ab.s AND ac.d = bc.d),"
        )
        parts.append(
            f"sup{r} AS MATERIALIZED (SELECT s, d, COUNT(*) AS c FROM ("
            f"SELECT a AS s, b AS d FROM tri{r} UNION ALL "
            f"SELECT b, c FROM tri{r} UNION ALL "
            f"SELECT a, c FROM tri{r}) t GROUP BY s, d),"
        )
        parts.append(
            f"e{r} AS MATERIALIZED (SELECT e.s, e.d FROM e{r-1} e "
            f"JOIN sup{r} u ON u.s = e.s AND u.d = e.d WHERE u.c >= {k - 2}),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT s AS src, d AS dst FROM e{rounds}")
    return "\n".join(parts)


@functools.cache
def ktruss_oracle_sql(sf_dir: str = _DRIVER_SF_DIR) -> str:
    """k-truss oracle with the unroll depth DERIVED from the input (same
    no-measured-constants rule as kcore_oracle_sql)."""
    from .oracle import ktruss_peel_rounds

    return _ktruss_sql(KT_K, ktruss_peel_rounds(_kc_edges_np(sf_dir), KT_K) + 2)


@functools.cache
def _kc_edges_np(sf_dir: str):
    import duckdb
    import numpy as np

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    out = con.sql(KC_SQL).fetchnumpy()
    return np.stack(
        [out["src"].astype(np.int64), out["dst"].astype(np.int64)], axis=1
    )


def _q_kcore(spark, sf_dir):
    """k-core peel (no reference analog; link-graph staple). The engine's
    round count is asserted against the NumPy derivation, like the other
    to-convergence queries."""
    from .plans.kcore import run_kcore

    return run_kcore(kc_edges(spark, sf_dir), k=KC_K)


def _q_coreness(spark, sf_dir):
    """Full coreness decomposition (k-core number per vertex) by the
    iterative h-index fixpoint — completes the k-core family on the same
    kc graph (coreness(v) >= KC_K iff v in kcore14_kc's answer)."""
    from .plans.coreness import run_coreness

    return run_coreness(kc_edges(spark, sf_dir))


def _q_ktruss(spark, sf_dir):
    """k-truss peel (no reference analog; near-clique core mining on the
    same kc graph). Round count derived by oracle.ktruss_peel_rounds."""
    from .plans.ktruss import run_ktruss

    return run_ktruss(kc_edges(spark, sf_dir), k=KT_K)


def _q_bfs_decremental_mod(spark, sf_dir):
    """Deletion-capable BFS IncEval: converge on the full mod graph, delete
    ~1/7 of the edges, localize (support-loss seeds -> forward closure ->
    boundary re-convergence); exact vs the batch recursive-CTE oracle on
    the remaining edges."""
    from .plans.bfs import run_bfs_decremental

    e = mod_edges(spark, sf_dir)
    dele = e.filter((F.col("src") * 5 + F.col("dst")) % 7 == 0)
    root = e.select(F.least(F.min("src"), F.min("dst")).alias("r")).collect()[0]["r"]
    prev = run_bfs(e, root=int(root), engine_kwargs={"salt_skew": False})
    res = run_bfs_decremental(e, dele, prev.state, root=int(root),
                              engine_kwargs={"salt_skew": False})
    return res.state.filter(F.col("value").isNotNull()).select(
        "vid", F.col("value").alias("dist")
    )


_BFS_DEC_MOD_SQL = f"""
WITH RECURSIVE
alledges AS MATERIALIZED ({MOD_SQL}),
edges AS MATERIALIZED (SELECT src, dst FROM alledges WHERE (src * 5 + dst) % 7 <> 0),
fverts AS (SELECT src AS v FROM alledges UNION SELECT dst FROM alledges),
root AS (SELECT MIN(v) AS rv FROM fverts),
walk(v, d) AS (
  SELECT rv, CAST(0 AS BIGINT) FROM root
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.v WHERE w.d < 250
)
SELECT v AS vid, MIN(d) AS dist FROM walk GROUP BY v
"""


def _q_wcc_decremental_snr(spark, sf_dir):
    """Deletion-capable IncEval (BEYOND reference parity — its IncEval is
    additions-only monotone): converge on the full supplier->nation->region
    graph, then DELETE five nations' region links ((nationkey % 5) == 2).
    Those nation subtrees split into their own components while untouched
    regions keep their state verbatim; exact vs the batch recursive-CTE
    oracle over the remaining edges."""
    from .plans.wcc import run_wcc_decremental

    full = snr_edges(spark, sf_dir)
    deleted = full.filter(
        (F.col("src") >= 100) & (F.col("src") < 125) & (F.col("dst") < 5)
        & ((F.col("src") - 100) % 5 == 2)
    )
    prev = run_wcc(full, engine_kwargs={"salt_skew": False})
    res = run_wcc_decremental(full, deleted, prev.state,
                              engine_kwargs={"salt_skew": False})
    return component_sizes(res.state)


_WCC_DEC_SNR_SQL = f"""
WITH RECURSIVE
e0 AS (SELECT src, dst FROM ({SNR_SQL}) t
       WHERE NOT (src >= 100 AND src < 125 AND dst < 5 AND (src - 100) % 5 = 2)),
und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
verts AS (SELECT DISTINCT src AS v FROM und),
reach(v, m) AS (
  SELECT v, v FROM verts
  UNION
  SELECT u.dst, r.m FROM reach r JOIN und u ON u.src = r.v
),
labels AS (SELECT v, MIN(m) AS label FROM reach GROUP BY v)
SELECT label, CAST(COUNT(*) AS BIGINT) AS size FROM labels GROUP BY label
"""


_EDGE_CSV_FIXTURE_FILES = 3
_EDGE_CSV_FIXTURE_ROWS = 400  # per file, before self-loop drop


def _ensure_edge_csv_fixture() -> str:
    """Deterministic directory of CSV edge lists — the batch-convert
    driver's input, readable by both Spark and DuckDB (same per-user dir +
    content-hash validation + race-safe publish as the stream fixture).
    Contains self-loops on purpose: the reader's drop policy is part of
    the oracle."""
    import os
    import shutil

    from .fixtures import (
        fixture_base_dir,
        publish_dir,
        seal_dir,
        valid_fixture_dir,
    )

    path = (
        f"{fixture_base_dir()}/edge_csv_f{_EDGE_CSV_FIXTURE_FILES}"
        f"_r{_EDGE_CSV_FIXTURE_ROWS}"
    )
    if valid_fixture_dir(path):
        return path
    shutil.rmtree(path, ignore_errors=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    for k in range(_EDGE_CSV_FIXTURE_FILES):
        lines = []
        for i in range(_EDGE_CSV_FIXTURE_ROWS):
            src = (i * 131 + k * 7919) % 997
            dst = (i * 197 + k * 131 + 1) % 997
            if i % 50 == 0:
                dst = src  # deliberate self-loop, must be dropped
            lines.append(f"{src},{dst}\n")
        with open(f"{tmp}/edges-{k:02d}.csv", "w") as fh:
            fh.writelines(lines)
    seal_dir(tmp)
    publish_dir(tmp, path)
    return path


def _q_edge_csv_batch_convert(spark, sf_dir):
    """Batch directory-conversion driver (tools/batch_graph_convert.cpp
    parity): a directory of CSV edge lists converts to the parquet edge
    layout in one call; the returned edge set (self-loops dropped, splits
    merged) is what the oracle checks via DuckDB's read_csv over the SAME
    files."""
    import os

    from .sources.edgelist import batch_convert_edgelists

    src = _ensure_edge_csv_fixture()
    dst = f"/tmp/minigraph_edge_csv_out_{os.getpid()}"
    return batch_convert_edgelists(spark, src, dst)


def _edge_csv_batch_convert_sql() -> str:
    path = _ensure_edge_csv_fixture()
    return f"""
  SELECT src, dst FROM read_csv('{path}/*.csv', header=false,
                                columns={{'src': 'BIGINT', 'dst': 'BIGINT'}})
  WHERE src != dst
"""


def _q_sssp_incremental_mod(spark, sf_dir):
    """Weighted-SSSP IncEval: converge on ~4/5 of the weighted mod graph,
    absorb the held-out fifth from the previous distance state; exact vs
    the batch recursive-CTE oracle (min-plus is monotone under additions)."""
    from .plans.bfs import run_bfs_incremental

    e = mod_edges(spark, sf_dir).withColumn(
        "w", (F.lit(1) + (F.col("src") * 31 + F.col("dst")) % 9).cast("long")
    )
    pred = (F.col("src") + F.col("dst") * 3) % 5 == 0
    base, delta = e.filter(~pred), e.filter(pred)
    root = e.select(F.least(F.min("src"), F.min("dst")).alias("r")).collect()[0]["r"]
    prev = run_bfs(base, root=int(root), weight_col="w",
                   engine_kwargs={"salt_skew": False})
    res = run_bfs_incremental(base, delta, prev.state, root=int(root),
                              weight_col="w", engine_kwargs={"salt_skew": False})
    return res.state.filter(F.col("value").isNotNull()).select(
        "vid", F.col("value").alias("dist")
    )


def _q_triangles_incremental_mod(spark, sf_dir):
    """IncEval triangle maintenance: batch-count ~4/5 of the mod graph,
    absorb the held-out fifth by inclusion-exclusion over the delta; exact
    vs the batch wedge-join oracle on the full graph."""
    from .plans.triangles import triangle_count_incremental

    e = mod_edges(spark, sf_dir)
    pred = (F.col("src") * 3 + F.col("dst")) % 5 == 0
    base, delta = e.filter(~pred), e.filter(pred)
    prev = triangle_count(base).collect()[0][0]
    return triangle_count_incremental(base, delta, prev)


def _q_bfs_incremental_mod(spark, sf_dir):
    """PEval BFS on ~4/5 of the mod graph, IncEval when the held-out fifth
    arrives; exact vs the batch recursive-CTE oracle on the full graph."""
    from .plans.bfs import run_bfs_incremental

    e = mod_edges(spark, sf_dir)
    delta = e.filter((F.col("src") + F.col("dst")) % 5 == 0)
    base = e.filter((F.col("src") + F.col("dst")) % 5 != 0)
    root = e.select(F.least(F.min("src"), F.min("dst")).alias("r")).collect()[0]["r"]
    prev = run_bfs(base, root=int(root), engine_kwargs={"salt_skew": False})
    res = run_bfs_incremental(base, delta, prev.state, root=int(root),
                              engine_kwargs={"salt_skew": False})
    return res.state.filter(F.col("value").isNotNull()).select(
        "vid", F.col("value").alias("dist")
    )


# Dict ORDER is a driver contract: the per-round CORRECTNESS check samples the
# FIRST ~50 keys in dict order.
#
# ROTATION RULE (institutionalized, VERDICT r4 item #1): while the 50-key cap
# persists, ALTERNATE the two halves of the registry every round —
#   block 1: keys whose newest driver-green row is OLDEST (one round stale),
#            plus any keys NEW this round (never driver-verified);
#   block 2: a handful of last-round-green keys whose underlying CODE changed
#            this round (regression canaries for the round's edits);
#   tail:    everything verified green last round.
# Every key is then driver-verified at least every other round, and the union
# of any two consecutive CORRECTNESS files covers all 95 keys.
#
# Round-5 instance: block 1 = the 45 keys green only in r03 (rotated out of
# the r04 window); block 2 = 5 r04-green keys exercising round-5 edits
# (group_quantiles exact flag, negative-sample dense ids via
# compact_ids_scalable, serialized localCheckpoint in tracked_local_checkpoint,
# shared compaction/superstep cores).
QUERIES = {
    # --- block 1: last driver-verified in round 3 (45 keys) ---
    "triangle_count_mod": _q_triangles,
    "triangles_per_vertex_mod": _q_triangles_per_vertex,
    "clustering_mod": _q_clustering,
    "transitivity_mod": _q_transitivity,
    "adamic_adar_kc": _q_adamic_adar,
    "link_scores_kc": _q_link_scores,
    "harmonic_kc": _q_harmonic,
    "closeness_kc": _q_closeness,
    "eigen3_kc": _q_eigenvector,
    "degree_hist_kc": _q_degree_hist,
    "betweenness_kc": _q_betweenness,
    "anf3_kc": _q_anf,
    "nf_curve_kc": _q_nf_curve,
    "eff_diameter_kc": _q_eff_diameter,
    "pagerank3_mod": _q_pagerank3,
    "pagerank_weighted_mod": _q_pagerank_weighted,
    "hits3_mod": _q_hits3,
    "scc_kc": _q_scc,
    "ppr3_mod": _q_ppr3,
    "walk4_mod": _q_walks,
    "pagerank_warm_mod": _q_pagerank_warm_mod,
    "pagerank_minigraph3_mod": _q_pagerank_minigraph3,
    "lpa2_mod": _q_lpa2,
    "modularity_lpa_mod": _q_modularity,
    "degree_out": _q_degree_out,
    "degrees": _q_degrees,
    "assortativity_mod": _q_assortativity,
    "neighbor_emb_mean": _q_neighbor_emb,
    "wcc_components_snr": _q_wcc_snr,
    "wcc_csr_components_snr": _q_wcc_csr_snr,
    "bfs_mod": _q_bfs_mod,
    "bfs_csr_mod": _q_bfs_csr_mod,
    "sssp_weighted_mod": _q_sssp_weighted_mod,
    "stream_seq_edges": _q_stream_seq_edges,
    "doc_fingerprint": _q_doc_fingerprint,
    "exact_dedup_keep_min": _q_dedup_keep_min,
    "minhash_signatures": _q_minhash,
    "minhash_lsh_pairs": _q_lsh_pairs,
    "near_dup_clusters": _q_dedup_clusters,
    "ngram_jaccard_dup": _q_ngram_jaccard,
    "simhash": _q_simhash,
    "simhash_near_pairs": _q_simhash_near_pairs,
    "embedding_near_dup_lsh": _q_embedding_dup_lsh,
    "token_count": _q_token_count,
    "tfidf_top3": _q_tfidf,
    # --- block 2: r04-green canaries for round-5 code edits (4 keys) ---
    "event_value_quantiles": _q_event_quantiles,
    "negative_samples_kc": _q_negative_samples,
    "mis_kc": _q_mis,
    "vertex_compaction": _q_vertex_compaction,
    # new in round 5 (never driver-verified) — takes the 50th slot;
    # wcc_seq_converged moves to the tail with its r04-green row intact
    "ann_cosine_topk_mm": _q_ann_topk_mm,
    # --- tail: verified green in round 4 (r04 rows stay authoritative) ---
    "wcc_seq_converged": _q_wcc_seq_converged,
    "kcore14_kc": _q_kcore,
    "ktruss4_kc": _q_ktruss,
    "wcc_decremental_snr": _q_wcc_decremental_snr,
    "bfs_decremental_mod": _q_bfs_decremental_mod,
    "decode_video_real": _q_decode_video_real,
    "frame_sample_real": _q_frame_sample_real,
    "sessionize_events": _q_sessionize,
    "decode_png_real": _q_decode_png_real,
    "decode_jpeg_real": _q_decode_jpeg_real,
    "decode_mp4_real": _q_decode_mp4_real,
    "coreness_kc": _q_coreness,
    "katz3_kc": _q_katz,
    "user_day_cooccurrence": _q_user_day_cooc,
    "butterfly_count_events": _q_butterflies,
    "scc_condensation": _q_scc_condensation,
    "stratified_sample_docs": _q_stratified_sample,
    "bigram_top20": _q_bigram_top20,
    "dag_layers_kc": _q_dag_layers,
    "cooc_jaccard": _q_cooc_jaccard,
    "interarrival_stats": _q_interarrival,
    "bowtie_scc": _q_bowtie,
    "rich_club_kc": _q_rich_club,
    "ann_cosine_topk": _q_ann_topk,
    "ann_cosine_topk_lsh": _q_ann_topk_lsh,
    "ann_cosine_topk_ivf": _q_ann_topk_ivf,
    "bfs_incremental_mod": _q_bfs_incremental_mod,
    "coloring_mod": _q_coloring_mod,
    "decode_audio_real": _q_decode_audio_real,
    "decode_image_real": _q_decode_image_real,
    "edge_csv_batch_convert": _q_edge_csv_batch_convert,
    "frame_sample": _q_frame_sample,
    "lang_id": _q_lang_id,
    "media_features": _q_media_features,
    "pagerank_mod_converged": _q_pagerank_converged,
    "quality_score": _q_quality,
    "sssp_incremental_mod": _q_sssp_incremental_mod,
    "token_stats": _q_token_stats,
    "triangle_count_incremental_mod": _q_triangles_incremental_mod,
    "wcc_incremental_snr": _q_wcc_incremental_snr,
    "seq_edge_projection": _q_seq_edges,
    "tool_edge_projection": events_tool_edges,
    "conductance_lpa_mod": _q_conductance,
    "reciprocity_mod": _q_reciprocity,
    "distinct_vertex_count": _q_distinct_vertex_count,
    "graph_stats": _q_graph_stats,
}

@functools.cache
def _mod_edges_np(sf_dir: str):
    """The mod graph as a NumPy edge array, read straight from the events
    parquet via DuckDB (no Spark) — the shared input for deriving
    to-convergence unroll counts at oracle-build time."""
    import duckdb
    import numpy as np

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    out = con.sql(MOD_SQL).fetchnumpy()
    return np.stack(
        [out["src"].astype(np.int64), out["dst"].astype(np.int64)], axis=1
    )


@functools.cache
def pagerank_converged_oracle_sql(sf_dir: str = _DRIVER_SF_DIR) -> str:
    """Converged-PR oracle: apply always writes the new value, so a
    converged run of N sweeps equals a fixed-N unroll. N is DERIVED here by
    running the NumPy oracle to the same max|Δ| <= tol stop on the same
    input — no hand-measured constants; _q_pagerank_converged additionally
    asserts the engine's sweep count equals this derivation."""
    from .oracle import pagerank_converged_sweeps

    return _pagerank3_sql(iters=pagerank_converged_sweeps(_mod_edges_np(sf_dir)))


@functools.cache
def coloring_oracle_sql(sf_dir: str = _DRIVER_SF_DIR) -> str:
    """Coloring oracle: the synchronous repair rule is idempotent past its
    fixpoint, so unrolling (derived changed-rounds + 2) states the converged
    colors; the +2 no-op rounds are free insurance and keep this one oracle
    valid at ANY sf whose graph converges in fewer rounds."""
    from .oracle import coloring_changed_rounds

    return _coloring_sql(coloring_changed_rounds(_mod_edges_np(sf_dir)) + 2)


@functools.cache
def build_oracle_sql() -> dict[str, str]:
    """The driver's oracle map, built LAZILY and once (functools.cache):
    several entries write fixture directories or run NumPy encode/decode
    work, which must not run as an import side effect (a bare
    `import relational` now touches no filesystem and does no codec work —
    only the first queries()/oracle_sql() call pays)."""
    return dict(_ORACLE_SQL_STATIC, **{
        "embedding_near_dup_lsh": _embedding_dup_lsh_sql(),
        "ann_cosine_topk_lsh": _ann_lsh_sql(),
        "ann_cosine_topk_ivf": _ann_ivf_sql(),
        "media_features": _media_features_sql(N_MEDIA, seed=7),
        "decode_image_real": _decode_image_real_sql(),
        "decode_png_real": _decode_png_real_sql(),
        "decode_jpeg_real": _decode_jpeg_real_sql(),
        "decode_mp4_real": _decode_mp4_real_sql(),
        "decode_audio_real": _decode_audio_real_sql(),
        "decode_video_real": _decode_video_real_sql(),
        "frame_sample_real": _frame_sample_real_sql(),
        "stream_seq_edges": _stream_seq_sql(),
        "coloring_mod": coloring_oracle_sql(),
        "mis_kc": mis_oracle_sql(),
        "stratified_sample_docs": _stratified_sample_sql(),
        "dag_layers_kc": dag_layers_oracle_sql(),
        "kcore14_kc": kcore_oracle_sql(),
        "coreness_kc": coreness_oracle_sql(),
        "ktruss4_kc": ktruss_oracle_sql(),
        "betweenness_kc": betweenness_oracle_sql(),
        "pagerank_mod_converged": pagerank_converged_oracle_sql(),
        "edge_csv_batch_convert": _edge_csv_batch_convert_sql(),
    })


_ORACLE_SQL_STATIC = {
    "seq_edge_projection": SEQ_SQL,
    "tool_edge_projection": TOOL_EDGES_SQL,
    "degree_out": f"SELECT src AS vid, COUNT(*) AS out_degree FROM ({SEQ_SQL}) GROUP BY src",
    "degrees": f"""
      WITH seq AS ({SEQ_SQL}),
      outd AS (SELECT src AS vid, COUNT(*) AS od FROM seq GROUP BY src),
      ind AS (SELECT dst AS vid, COUNT(*) AS id_ FROM seq GROUP BY dst)
      SELECT COALESCE(o.vid, i.vid) AS vid,
             COALESCE(i.id_, 0) AS in_degree,
             COALESCE(o.od, 0) AS out_degree
      FROM outd o FULL OUTER JOIN ind i ON o.vid = i.vid
    """,
    "distinct_vertex_count": f"""
      SELECT CAST(COUNT(*) AS BIGINT) AS num_vertices FROM (
        SELECT src AS v FROM ({SEQ_SQL}) UNION SELECT dst FROM ({SEQ_SQL}))
    """,
    "graph_stats": f"""
      WITH seq AS ({SEQ_SQL}),
      outd AS (SELECT src AS vid, COUNT(*) AS od FROM seq GROUP BY src),
      ind AS (SELECT dst AS vid, COUNT(*) AS id_ FROM seq GROUP BY dst),
      deg AS (SELECT COALESCE(o.vid, i.vid) AS vid,
                     COALESCE(i.id_, 0) AS in_degree, COALESCE(o.od, 0) AS out_degree
              FROM outd o FULL OUTER JOIN ind i ON o.vid = i.vid)
      SELECT (SELECT COUNT(*) FROM seq) AS num_edges,
             COUNT(*) AS num_vertices, MAX(vid) AS max_vid,
             MAX(in_degree) AS max_in_degree, MAX(out_degree) AS max_out_degree,
             ROUND(AVG(in_degree), 6) AS avg_in_degree,
             ROUND(AVG(out_degree), 6) AS avg_out_degree
      FROM deg
    """,
    "vertex_compaction": f"""
      WITH verts AS (SELECT src AS vid FROM ({SEQ_SQL}) UNION SELECT dst FROM ({SEQ_SQL}))
      SELECT vid, CAST(row_number() OVER (ORDER BY vid) - 1 AS BIGINT) AS dense_id FROM verts
    """,
    "triangle_count_mod": _TRI_MOD_SQL,
    "triangles_per_vertex_mod": f"""
      WITH edges AS ({MOD_SQL}),
      und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
      ord_e AS (SELECT src, dst FROM und WHERE src < dst),
      tri AS (
        SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
        FROM ord_e ab JOIN ord_e bc ON bc.src = ab.dst
        JOIN ord_e ac ON ac.src = ab.src AND ac.dst = bc.dst
      ),
      corners AS (
        SELECT a AS vid FROM tri UNION ALL
        SELECT b FROM tri UNION ALL SELECT c FROM tri
      )
      SELECT vid, CAST(COUNT(*) AS BIGINT) AS triangles FROM corners GROUP BY vid
    """,
    "clustering_mod": f"""
      WITH edges AS ({MOD_SQL}),
      und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
      ord_e AS (SELECT src, dst FROM und WHERE src < dst),
      deg AS (SELECT src AS vid, COUNT(*) AS deg FROM und GROUP BY src),
      tri AS (
        SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
        FROM ord_e ab JOIN ord_e bc ON bc.src = ab.dst
        JOIN ord_e ac ON ac.src = ab.src AND ac.dst = bc.dst
      ),
      corners AS (
        SELECT a AS vid FROM tri UNION ALL
        SELECT b FROM tri UNION ALL SELECT c FROM tri
      ),
      pt AS (SELECT vid, COUNT(*) AS t FROM corners GROUP BY vid)
      SELECT d.vid, CAST(d.deg AS BIGINT) AS deg,
             CAST(COALESCE(pt.t, 0) AS BIGINT) AS triangles,
             ROUND(CASE WHEN d.deg >= 2
                        THEN 2.0 * COALESCE(pt.t, 0) / (d.deg * (d.deg - 1.0))
                        ELSE 0.0 END, 6) AS lcc
      FROM deg d LEFT JOIN pt ON pt.vid = d.vid
    """,
    "transitivity_mod": f"""
      WITH edges AS ({MOD_SQL}),
      und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
      ord_e AS (SELECT src, dst FROM und WHERE src < dst),
      deg AS (SELECT src AS vid, COUNT(*) AS deg FROM und GROUP BY src),
      tc AS (
        SELECT COUNT(*) AS t
        FROM ord_e ab JOIN ord_e bc ON bc.src = ab.dst
        JOIN ord_e ac ON ac.src = ab.src AND ac.dst = bc.dst
      ),
      wt AS (SELECT CAST(SUM(deg * (deg - 1)) / 2 AS BIGINT) AS w FROM deg)
      SELECT CAST(tc.t AS BIGINT) AS num_triangles, wt.w AS num_wedges,
             ROUND(CASE WHEN wt.w > 0 THEN 3.0 * tc.t / wt.w ELSE 0.0 END, 6)
               AS transitivity
      FROM tc, wt
    """,
    "link_scores_kc": f"""
      WITH edges AS ({KC_SQL}),
      und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
      ord_e AS (SELECT src, dst FROM und WHERE src < dst),
      deg AS (SELECT src AS w, COUNT(*) AS deg FROM und GROUP BY src),
      -- deg <= 1000 mirrors linkpred.DEFAULT_MAX_CENTER_DEGREE: the hub
      -- cap is part of the default semantics, not a lossy approximation
      ctr AS (SELECT u.src AS w, u.dst AS n, 1.0 / LN(d.deg) AS wt,
                     1.0 / d.deg AS rwt
              FROM und u JOIN deg d ON d.w = u.src
              WHERE d.deg >= 2 AND d.deg <= 1000),
      pairs AS (SELECT a.n AS u, b.n AS v, a.wt, a.rwt
                FROM ctr a JOIN ctr b ON a.w = b.w AND a.n < b.n),
      scored AS (SELECT u, v, COUNT(*) AS cn, SUM(wt) AS aa, SUM(rwt) AS ra
                 FROM pairs GROUP BY u, v),
      nonadj AS (SELECT s.* FROM scored s
                 LEFT JOIN ord_e e ON e.src = s.u AND e.dst = s.v
                 WHERE e.src IS NULL),
      full_m AS (SELECT n.u, n.v, CAST(n.cn AS BIGINT) AS common_neighbors,
                        ROUND(n.aa, 6) AS aa_score, ROUND(n.ra, 6) AS ra_score,
                        ROUND(CAST(n.cn AS DOUBLE) / (du.deg + dv.deg - n.cn), 6) AS jaccard,
                        CAST(du.deg * dv.deg AS BIGINT) AS pref_attachment
                 FROM nonadj n JOIN deg du ON du.w = n.u JOIN deg dv ON dv.w = n.v),
      ranked AS (SELECT *, CAST(row_number() OVER (ORDER BY jaccard DESC, u, v)
                                AS INTEGER) AS rank FROM full_m)
      SELECT * FROM ranked WHERE rank <= 50
    """,
    "adamic_adar_kc": f"""
      WITH edges AS ({KC_SQL}),
      und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
      ord_e AS (SELECT src, dst FROM und WHERE src < dst),
      deg AS (SELECT src AS w, COUNT(*) AS deg FROM und GROUP BY src),
      -- deg <= 1000 mirrors linkpred.DEFAULT_MAX_CENTER_DEGREE (see
      -- link_scores_kc note)
      ctr AS (SELECT u.src AS w, u.dst AS n, 1.0 / LN(d.deg) AS wt
              FROM und u JOIN deg d ON d.w = u.src
              WHERE d.deg >= 2 AND d.deg <= 1000),
      pairs AS (SELECT a.n AS u, b.n AS v, a.wt
                FROM ctr a JOIN ctr b ON a.w = b.w AND a.n < b.n),
      scored AS (SELECT u, v, COUNT(*) AS cn, SUM(wt) AS aa
                 FROM pairs GROUP BY u, v),
      nonadj AS (SELECT s.* FROM scored s
                 LEFT JOIN ord_e e ON e.src = s.u AND e.dst = s.v
                 WHERE e.src IS NULL),
      ranked AS (SELECT u, v, CAST(cn AS BIGINT) AS common_neighbors,
                        ROUND(aa, 6) AS aa_score,
                        CAST(row_number() OVER (ORDER BY ROUND(aa, 6) DESC, u, v)
                             AS INTEGER) AS rank
                 FROM nonadj)
      SELECT * FROM ranked WHERE rank <= 50
    """,
    "assortativity_mod": f"""
      WITH edges AS ({MOD_SQL}),
      und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
      deg AS (SELECT src AS vid, COUNT(*) AS deg FROM und GROUP BY src)
      SELECT ROUND(CORR(ds.deg, dd.deg), 6) AS assortativity
      FROM und u JOIN deg ds ON ds.vid = u.src JOIN deg dd ON dd.vid = u.dst
    """,
    "pagerank3_mod": _pagerank3_sql(),
    "pagerank_weighted_mod": _pagerank_weighted_sql(),
    "hits3_mod": _hits_sql(),
    "scc_kc": SCC_ORACLE_SQL,
    "harmonic_kc": _harmonic_sql(),
    "closeness_kc": _closeness_sql(),
    "eigen3_kc": _eigenvector_sql(),
    "katz3_kc": _katz_sql(),
    "user_day_cooccurrence": _USER_DAY_COOC_SQL,
    "cooc_jaccard": _COOC_JACCARD_SQL,
    "interarrival_stats": _INTERARRIVAL_SQL,
    "butterfly_count_events": _BUTTERFLY_SQL,
    "scc_condensation": _SCC_CONDENSATION_SQL,
    "bowtie_scc": _BOWTIE_SQL,
    "rich_club_kc": _RICH_CLUB_SQL,
    "bigram_top20": _BIGRAM_SQL,
    "event_value_quantiles": _EVENT_QUANTILES_SQL,
    "negative_samples_kc": _negative_samples_sql(),
    "degree_hist_kc": DEGREE_HIST_SQL,
    "anf3_kc": _anf_sql(),
    "nf_curve_kc": _nf_curve_sql(),
    "eff_diameter_kc": _eff_diameter_sql(),
    "ppr3_mod": _ppr3_sql(),
    "walk4_mod": _walk_sql(),
    "pagerank_warm_mod": _pagerank_warm_sql(),
    "pagerank_minigraph3_mod": _pagerank_minigraph3_sql(),
    "lpa2_mod": _lpa2_sql(),
    "modularity_lpa_mod": _modularity_sql(),
    "conductance_lpa_mod": _conductance_sql(),
    "reciprocity_mod": _RECIPROCITY_SQL,
    "neighbor_emb_mean": _neighbor_emb_sql(),
    "wcc_components_snr": _WCC_SNR_SQL,
    "wcc_csr_components_snr": _WCC_SNR_SQL,
    "bfs_mod": _BFS_MOD_SQL,
    "bfs_csr_mod": _BFS_MOD_SQL,
    "sssp_weighted_mod": _SSSP_W_MOD_SQL,
    "doc_fingerprint": "SELECT doc_id, md5(lower(trim(text))) AS fingerprint FROM documents",
    "exact_dedup_keep_min": """
      SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(lower(trim(text)))
    """,
    "minhash_signatures": _MINHASH_SQL,
    "minhash_lsh_pairs": _LSH_PAIRS_SQL,
    "near_dup_clusters": _DEDUP_CLUSTERS_SQL,
    "ngram_jaccard_dup": _NGRAM_JACCARD_SQL,
    "simhash": _SIMHASH_SQL,
    "simhash_near_pairs": _SIMHASH_PAIRS_SQL,
    "tfidf_top3": _TFIDF_SQL,
    "sessionize_events": _SESSIONIZE_SQL,
    "token_count": """
      SELECT doc_id,
             CAST(CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
                  ELSE length(text) - length(replace(text, ' ', '')) + 1 END AS BIGINT)
             AS n_tokens
      FROM documents
    """,
    "token_stats": """
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT t) AS n_distinct_tokens,
             ROUND(AVG(length(t)), 6) AS avg_token_len
      FROM tok GROUP BY doc_id
    """,
    "quality_score": """
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      agg AS (SELECT doc_id, COUNT(*) AS n, COUNT(DISTINCT t) AS nd,
                     SUM(CASE WHEN t IN ('the','a','of','and','to','in') THEN 1 ELSE 0 END) AS nstop
              FROM tok GROUP BY doc_id)
      SELECT doc_id,
             ROUND(CAST(nd AS DOUBLE) / n, 6) AS ttr,
             ROUND(CAST(nstop AS DOUBLE) / n, 6) AS stopword_ratio,
             ROUND(0.7 * (CAST(nd AS DOUBLE) / n)
                   + 0.3 * (1.0 - ABS(CAST(nstop AS DOUBLE) / n - 0.4)), 6) AS quality
      FROM agg
    """,
    "lang_id": """
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      agg AS (SELECT doc_id,
                SUM(CASE WHEN t IN ('the','a','of','and') THEN 1 ELSE 0 END) AS c_en,
                SUM(CASE WHEN t IN ('query','row','column','table') THEN 1 ELSE 0 END) AS c_qy
              FROM tok GROUP BY doc_id)
      SELECT doc_id,
             CASE WHEN c_qy > 0 AND c_qy > c_en THEN 'qy'
                  WHEN c_en > 0 AND c_en > c_qy THEN 'en'
                  ELSE 'und' END AS lang_pred
      FROM agg
    """,
    "ann_cosine_topk": _ANN_TOPK_SQL,
    "ann_cosine_topk_mm": _ANN_TOPK_SQL,
    "frame_sample": FRAME_SAMPLE_SQL,
    "wcc_seq_converged": _WCC_SEQ_SQL,
    # IncEval == PEval on the full graph for monotone kernels — batch oracles
    "wcc_incremental_snr": _WCC_SNR_SQL,
    "wcc_decremental_snr": _WCC_DEC_SNR_SQL,
    "bfs_decremental_mod": _BFS_DEC_MOD_SQL,
    "bfs_incremental_mod": _BFS_MOD_SQL,
    "sssp_incremental_mod": _SSSP_W_MOD_SQL,
    "triangle_count_incremental_mod": _TRI_MOD_SQL,
}

ROWS_ONLY: set[str] = set()


def __getattr__(name: str):
    # back-compat module attribute: ORACLE_SQL is now built lazily (see
    # build_oracle_sql) so importing this module has no side effects
    if name == "ORACLE_SQL":
        return build_oracle_sql()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
