"""Transcript-table source adapter (BASELINE.json input_hint).

The production input is an Iceberg table of multi-turn conversation /
agent transcripts with columns (conv_id string, turn_idx int32, role
string, text string, tool string, ts timestamp). This module is the one
place that turns "wherever the transcripts live" into the canonical
``TRANSCRIPT_SCHEMA`` DataFrame the projection operators consume
(operators/project.py — the reference's CSV ingest face,
tools/graph_convert_exec.cpp:24-61, generalized to a catalog table):

- a catalog table name (``prod.chat.transcripts``, a temp view, or any
  name a configured catalog resolves) -> ``spark.read.table``
- a filesystem path -> ``spark.read.parquet``

Iceberg needs no special-casing at read time: an Iceberg table surfaces
through the Spark catalog like any other table, so the same
``read.table`` call serves hadoop-catalog / HMS / REST-catalog Iceberg
deployments — the cluster's ``spark.sql.catalog.*`` conf decides, and
snapshot pinning rides through ``reader_options`` (e.g.
``{"snapshot-id": ...}`` or ``{"as-of-timestamp": ...}``). In this
jar-less sandbox the catalog branch is exercised against temp views and
the parquet branch against the driver testdata; neither needs the
Iceberg runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TRANSCRIPT_SCHEMA

_REQUIRED = [f.name for f in TRANSCRIPT_SCHEMA.fields]


def is_table_name(source: str) -> bool:
    """Catalog-name heuristic: anything path-like (a separator, a scheme,
    or an existing local file/dir) reads as files; everything else goes to
    the catalog. ``db.table`` dots are catalog namespaces, not paths."""
    if "/" in source or "\\" in source or "://" in source:
        return False
    return not os.path.exists(source)


def load_transcripts(
    spark: SparkSession,
    source: str,
    reader_options: dict | None = None,
    strict: bool = True,
) -> DataFrame:
    """Load + conform a transcript table from a catalog name or a parquet
    path. ``reader_options`` passes straight to the DataFrameReader (the
    Iceberg snapshot-pinning surface). ``strict=False`` keeps extra
    columns instead of pruning to the canonical six."""
    reader = spark.read.options(**(reader_options or {}))
    if is_table_name(source):
        df = reader.table(source)
    else:
        df = reader.parquet(source)
    return conform_transcripts(df, strict=strict)


def conform_transcripts(df: DataFrame, strict: bool = True) -> DataFrame:
    """Project any transcript-shaped DataFrame onto TRANSCRIPT_SCHEMA:
    required columns present (clear error otherwise), types cast to the
    canonical ones (turn_idx int32, ts timestamp), canonical column order.

    Casting is declarative (Catalyst folds it into the scan), so a table
    whose turn_idx landed as long/int64 — the common parquet default —
    conforms without a separate rewrite pass. Column pruning keeps the
    scan's ReadSchema at the six canonical columns when strict."""
    missing = [c for c in _REQUIRED if c not in df.columns]
    if missing:
        raise ValueError(
            f"transcript source is missing required column(s) {missing}; "
            f"expected (conv_id, turn_idx, role, text, tool, ts), got {df.columns}"
        )
    cols = [F.col(f.name).cast(f.dataType).alias(f.name) for f in TRANSCRIPT_SCHEMA.fields]
    if not strict:
        cols += [F.col(c) for c in df.columns if c not in _REQUIRED]
    return df.select(*cols)
