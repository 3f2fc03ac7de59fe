"""Per-iteration vertex-state snapshots with per-partition lineage.

Maps the reference's vdata-only checkpoint writes
(reference: utility/io/csr_io_adapter.h:426-489, WriteCSR2CSRBin with
vdata_only=true — the per-superstep flush) and its StatisticInfo sidecars
(utility/io/data_mngr.h:271-311) onto a parquet snapshot directory:

    {dir}/iter=00007/state.parquet      # (vid, value[, ...]) only — column-
                                        # pruned write, the vdata_only analog
    {dir}/iter=00007/lineage.json       # iteration, counts, per-partition
                                        # row counts + value fingerprints
    {dir}/metrics.jsonl                 # one row per iteration (appended)

Any run is resumable mid-convergence: `latest(dir)` returns the newest
complete snapshot (a snapshot is complete iff its lineage.json exists —
written last). Parquet is used as the snapshot format in-sandbox; the layout
(immutable snapshot dirs + manifest sidecar) is Iceberg-shaped so swapping
the writer for `.writeTo(...).createOrReplace()` on a real catalog is local
to this module.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _iter_dir(base: str, iteration: int) -> str:
    return os.path.join(base, f"iter={iteration:05d}")


def write_snapshot(
    state: DataFrame, base_dir: str, iteration: int, extra: dict | None = None
) -> dict:
    """Write the vertex state and its lineage manifest; returns the manifest."""
    d = _iter_dir(base_dir, iteration)
    state.write.mode("overwrite").parquet(os.path.join(d, "state.parquet"))
    # per-partition lineage: row count + order-insensitive value fingerprint
    # per physical partition of the snapshot just written
    snap = state.sparkSession.read.parquet(os.path.join(d, "state.parquet"))
    per_part = (
        snap.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            # XOR-fold of row hashes: order-insensitive and overflow-free
            # (sum would overflow LongType under ANSI mode)
            F.bit_xor(F.xxhash64(*[F.col(c).cast("string") for c in snap.columns])).alias(
                "fingerprint"
            ),
        )
        .collect()
    )
    manifest = {
        "iteration": iteration,
        "num_rows": int(sum(r["rows"] for r in per_part)),
        "partitions": [
            {"pid": int(r["_pid"]), "rows": int(r["rows"]), "fingerprint": int(r["fingerprint"])}
            for r in sorted(per_part, key=lambda r: r["_pid"])
        ],
        **(extra or {}),
    }
    # lineage.json written last = commit marker
    with open(os.path.join(d, "lineage.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def append_metrics(base_dir: str, row: dict) -> None:
    os.makedirs(base_dir, exist_ok=True)
    with open(os.path.join(base_dir, "metrics.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def latest(base_dir: str) -> tuple[int, str] | None:
    """Newest complete snapshot -> (iteration, state_path), else None."""
    if not os.path.isdir(base_dir):
        return None
    best = None
    for name in os.listdir(base_dir):
        m = re.fullmatch(r"iter=(\d+)", name)
        if not m:
            continue
        it = int(m.group(1))
        d = os.path.join(base_dir, name)
        if os.path.exists(os.path.join(d, "lineage.json")):
            if best is None or it > best[0]:
                best = (it, os.path.join(d, "state.parquet"))
    return best


def load_snapshot(spark: SparkSession, base_dir: str) -> tuple[int, DataFrame] | None:
    found = latest(base_dir)
    if found is None:
        return None
    it, path = found
    return it, spark.read.parquet(path)
