"""Coreness (k-core number per vertex) via the iterative h-index fixpoint:
plans/coreness.py vs the NumPy min-degree peel ground truth, plus the
cross-consistency invariant against run_kcore (coreness(v) >= k iff v
survives the k-core peel)."""

import numpy as np

from minigraph_spark import oracle
from minigraph_spark.fixtures import make_rmat_edges_np
from minigraph_spark.plans.coreness import run_coreness


def _spark_edges(spark, arr):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in arr], "src long, dst long"
    )


def test_coreness_clique_plus_tail(spark):
    """Closed form: K5 members have core number 4, the pendant tail 1."""
    arr = np.array(
        [(a, b) for a in range(5) for b in range(a + 1, 5)]
        + [(4, 5), (5, 6), (6, 7)]
    )
    got = {r["vid"]: r["coreness"] for r in run_coreness(_spark_edges(spark, arr)).collect()}
    assert got == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4, 5: 1, 6: 1, 7: 1}


def test_coreness_matches_numpy_peel_on_rmat(spark):
    """h-index fixpoint == Batagelj-Zaversnik peel on a skewed R-MAT
    (includes multi-edges and self-loops the closure must drop)."""
    arr = make_rmat_edges_np(power=8, num_edges=1500, seed=37)
    got = {r["vid"]: r["coreness"] for r in run_coreness(_spark_edges(spark, arr)).collect()}
    want = oracle.coreness_np(arr)
    assert got == want


def test_coreness_consistent_with_kcore(spark):
    """coreness(v) >= k  <=>  v in the k-core, for every k that appears."""
    from minigraph_spark.plans.kcore import run_kcore

    arr = make_rmat_edges_np(power=7, num_edges=900, seed=11)
    edges = _spark_edges(spark, arr)
    core = {r["vid"]: r["coreness"] for r in run_coreness(edges).collect()}
    for k in sorted(set(core.values())):
        in_kcore = {r["vid"] for r in run_kcore(edges, k=k).collect()}
        assert in_kcore == {v for v, c in core.items() if c >= k}, f"k={k}"
