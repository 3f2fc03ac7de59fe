import numpy as np

from minigraph_spark import oracle
from minigraph_spark.fixtures import TINY7_EDGES, make_rmat_edges_np, tiny7_edges
from minigraph_spark.plans.wcc import component_sizes, run_wcc
from tests.conftest import labels_dict


def _spark_edges(spark, arr):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(arr, columns=["src", "dst"]), schema="src long, dst long"
    )


def test_wcc_tiny7(spark):
    res = run_wcc(tiny7_edges(spark))
    got = labels_dict(res.state)
    want = oracle.wcc_labels(np.array(TINY7_EDGES))
    assert got == want
    # FIXTURES.md F3 golden: one component, all labels 0
    assert set(got.values()) == {0}
    assert res.converged


def test_wcc_directed_minlabel_tiny7(spark):
    res = run_wcc(tiny7_edges(spark), directed=True)
    got = labels_dict(res.state)
    want = oracle.directed_minlabel(np.array(TINY7_EDGES))
    assert got == want


def test_wcc_rmat(spark):
    arr = make_rmat_edges_np(power=8, num_edges=1500, seed=7)
    res = run_wcc(_spark_edges(spark, arr))
    got = labels_dict(res.state)
    want = oracle.wcc_labels(arr)
    assert got == want


def test_component_sizes(spark):
    # two disjoint chains: 0-1-2 and 10-11
    arr = np.array([[0, 1], [1, 2], [10, 11]])
    res = run_wcc(_spark_edges(spark, arr))
    sizes = {r["label"]: r["size"] for r in component_sizes(res.state).collect()}
    assert sizes == {0: 3, 10: 2}
