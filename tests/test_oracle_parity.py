"""Driver-contract rehearsal: run each __spark_entry__ query against its
DuckDB oracle on the real testdata and demand row-count + value equality
(order-insensitive, columns aligned by name) — the same comparison the
grading driver performs at sf0.01."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from minigraph_spark.relational import ORACLE_SQL, QUERIES, ROWS_ONLY

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _oracle_for(name: str) -> str:
    if name == "pagerank_mod_converged":
        # sf-dependent unroll: the converged sweep count is DERIVED from the
        # input by the NumPy oracle (relational.pagerank_converged_oracle_sql);
        # this rehearsal runs at sf0.001, the driver at sf0.01
        from minigraph_spark.relational import pagerank_converged_oracle_sql

        return pagerank_converged_oracle_sql(SF_DIR)
    if name == "kcore14_kc":
        # same sf-derived unroll treatment (the k-core peel depth differs
        # per sf; at sf0.001 the peel empties the graph — also worth testing)
        from minigraph_spark.relational import kcore_oracle_sql

        return kcore_oracle_sql(SF_DIR)
    if name == "ktruss4_kc":
        from minigraph_spark.relational import ktruss_oracle_sql

        return ktruss_oracle_sql(SF_DIR)
    if name == "coreness_kc":
        # sf-derived h-index unroll depth (rounds differ per sf)
        from minigraph_spark.relational import coreness_oracle_sql

        return coreness_oracle_sql(SF_DIR)
    if name == "betweenness_kc":
        from minigraph_spark.relational import betweenness_oracle_sql

        return betweenness_oracle_sql(SF_DIR)
    return ORACLE_SQL[name]


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(spark, name):
    got = _normalize(QUERIES[name](spark, SF_DIR).toPandas())
    want = _normalize(_duck(_oracle_for(name)))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows vs oracle {len(want)}"
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
            np.testing.assert_allclose(
                g.astype(float), w.astype(float), rtol=0, atol=1e-9,
                err_msg=f"{name}.{c}",
            )
        else:
            assert (g == w).all(), f"{name}.{c}: value mismatch"


@pytest.mark.parametrize("name", sorted(ROWS_ONLY))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() > 0


def test_every_query_has_oracle_or_is_rows_only():
    assert set(QUERIES) == set(ORACLE_SQL) | ROWS_ONLY


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns == ["vid", "rank"]
