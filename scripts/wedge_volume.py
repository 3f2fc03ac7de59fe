"""Measure the oriented wedge volume of an R-MAT fixture with DuckDB (no
Spark): under (degree, vid) orientation, the intersection join's shuffled
bytes scale with sum(d_out^2) and the intersection work with the closed-
wedge potential sum(C(d_out,2)). Substantiates BASELINE.md's wedge-bound
triangle-cost note with numbers per fixture size.

Usage: python scripts/wedge_volume.py /tmp/minigraph_rmat_p23_e64000000_s42.parquet
"""
import os
import sys

import duckdb

path = sys.argv[1]
if os.path.isdir(path):
    path = f"{path}/*.parquet"
con = duckdb.connect()
con.execute("SET threads=8")
row = con.execute(
    f"""
WITH canon AS (
  SELECT least(src, dst) AS s, greatest(src, dst) AS d
  FROM read_parquet('{path}') WHERE src <> dst GROUP BY 1, 2
), deg AS (
  SELECT v, count(*) AS deg
  FROM (SELECT s AS v FROM canon UNION ALL SELECT d FROM canon) GROUP BY 1
), oriented AS (
  -- rank = (degree, vid); canon has s < d so ties keep s as the out-vertex
  SELECT CASE WHEN dd.deg < ds.deg THEN c.d ELSE c.s END AS u
  FROM canon c JOIN deg ds ON c.s = ds.v JOIN deg dd ON c.d = dd.v
), od AS (SELECT u, count(*) AS k FROM oriented GROUP BY 1)
SELECT count(*) AS out_verts, sum(k) AS edges, max(k) AS max_out,
       sum(k * k) AS sum_sq, sum(k * (k - 1) / 2) AS wedges
FROM od
"""
).fetchone()
print(dict(zip(["out_verts", "edges", "max_out", "sum_sq", "wedges"], row)), flush=True)
