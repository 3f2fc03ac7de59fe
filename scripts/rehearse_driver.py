"""Rehearse the grading driver's correctness sweep at its own scale.

The driver runs the FIRST 50 keys of __spark_entry__.queries() at sf0.01,
runs each key's oracle_sql() in DuckDB over the same parquet tables, and
compares row count, schema (column names sorted), and an order-insensitive
value hash. This script performs the same comparison locally so a key that
would fail in the driver window is caught before the round is graded.

Usage:
    python scripts/rehearse_driver.py [--sf-dir /root/testdata/sf0.01]
                                      [--start 0] [--count 50] [--keys k1,k2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _compare(got: pd.DataFrame, want: pd.DataFrame) -> str | None:
    if list(got.columns) != list(want.columns):
        return f"schema {list(got.columns)} != {list(want.columns)}"
    if len(got) != len(want):
        return f"rows {len(got)} != {len(want)}"
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
            if not np.allclose(g.astype(float), w.astype(float), rtol=0, atol=1e-9,
                               equal_nan=True):
                return f"values differ in float column {c}"
        elif not (g == w).all():
            return f"values differ in column {c}"
    return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--count", type=int, default=50)
    ap.add_argument("--keys", default=None,
                    help="comma-separated explicit key list (overrides window)")
    args = ap.parse_args()

    import __spark_entry__ as e
    from minigraph_spark.session import get_spark

    queries = e.queries()
    oracles = e.oracle_sql()
    if args.keys:
        keys = args.keys.split(",")
    else:
        keys = list(queries)[args.start:args.start + args.count]

    spark = get_spark()
    results: dict[str, dict] = {}
    for i, k in enumerate(keys):
        t0 = time.time()
        try:
            got = _normalize(queries[k](spark, args.sf_dir).toPandas())
            want = _normalize(_duck(oracles[k], args.sf_dir))
            err = _compare(got, want)
            results[k] = {
                "ok": err is None, "err": err,
                "rows": len(got), "sec": round(time.time() - t0, 1),
            }
        except Exception as ex:  # a raising query is a failed driver row
            results[k] = {
                "ok": False, "err": f"{type(ex).__name__}: {ex}"[:300],
                "rows": None, "sec": round(time.time() - t0, 1),
            }
        r = results[k]
        print(f"[{i + 1}/{len(keys)}] {k}: "
              f"{'OK' if r['ok'] else 'FAIL ' + str(r['err'])} ({r['sec']}s)",
              flush=True)

    bad = {k: v for k, v in results.items() if not v["ok"]}
    print(json.dumps({
        "checked": len(results), "failed": len(bad),
        "failures": bad,
        "total_sec": round(sum(v["sec"] for v in results.values()), 1),
    }))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
