"""Structured Streaming ingest: transcript stream → link-graph edges.

The reference is batch-only — its "stream" variants mean streaming fragments
through bounded memory, not event streams (reference: README.md:104-108,
apps/cpp/wcc_vc_stream.cpp). This module is the engine's *event-streaming*
ingest face for the transcript table (BASELINE.json input_hint): an
append-only log of (conv_id, turn_idx, role, text, tool, ts) rows arriving
over time, projected incrementally into the same edge table the batch path
(operators/project.py::seq_edges) produces.

Design:
- seq edges need the PREVIOUS turn of each conversation — cross-micro-batch
  state. Implemented with applyInPandasWithState keyed by conv_id: the state
  holds the last seen turn_idx per conversation; each batch's turns are
  sorted and chained onto it. Vectorized pandas per group — no per-row
  Python in the hot path; the 64-bit vertex ids are hashed JVM-side after
  the stateful op (xxhash64 is not reproducible in pandas).
- Contract: turns arrive with non-decreasing turn_idx per conversation
  across micro-batches (true for an append-only transcript log). Within a
  micro-batch, arrival order is irrelevant (sorted per group). Under that
  contract the streamed edge set equals the batch projection exactly
  (tested in tests/test_streaming.py).
- Scale: state is one small tuple per conversation. For a continuously
  running deployment pass conv_ttl_ms so stale conversations are dropped
  via a processing-time timeout and state doesn't grow with the total
  number of conversations ever seen. The TTL is OFF by default because a
  pending processing-time timeout makes trigger(availableNow) spin no-data
  "cleaning up state" batches forever instead of terminating (observed on
  Spark 4.1; drain-style runs and tests must use conv_ttl_ms=None).

Also provides a watermarked windowed aggregation (turn rates per role) —
the standard late-data-tolerant metrics face.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from ..schemas import TRANSCRIPT_SCHEMA

# (conv_id, src_turn, dst_turn) — intermediate, pre-hash
_RAW_EDGE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("src_turn", T.IntegerType(), False),
        T.StructField("dst_turn", T.IntegerType(), False),
    ]
)
_STATE_SCHEMA = T.StructType([T.StructField("last_turn", T.IntegerType(), True)])


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an append-only transcript parquet directory.
    On a real deployment this is an Iceberg/Kafka source with the same
    schema; the projection below is source-agnostic."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def _make_seq_edges_stateful(conv_ttl_ms: int | None):
    def _seq_edges_stateful(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return

        def _refresh_ttl() -> None:
            # every arrival for a live conversation must push its expiry out,
            # including replay-only batches that emit no edges — otherwise an
            # active conversation's state can expire mid-stream
            if conv_ttl_ms is not None and state.exists:
                state.setTimeoutDuration(conv_ttl_ms)

        turns = pd.concat(list(batches), ignore_index=True)
        if len(turns) == 0:
            _refresh_ttl()
            return
        idx = turns["turn_idx"].sort_values().unique()  # numpy int32, ascending
        prev = state.get[0] if state.exists else None
        # chain: prev -> idx[0] -> idx[1] -> ... (drop idx already <= prev:
        # replays of old turns must not emit duplicate edges)
        if prev is not None:
            idx = idx[idx > prev]
        if len(idx) == 0:
            _refresh_ttl()
            return
        src = ([prev] if prev is not None else []) + idx[:-1].tolist()
        dst = idx.tolist() if prev is not None else idx[1:].tolist()
        state.update((int(idx[-1]),))
        _refresh_ttl()
        if not src:
            return
        yield pd.DataFrame(
            {"conv_id": key[0], "src_turn": src, "dst_turn": dst}
        ).astype({"src_turn": "int32", "dst_turn": "int32"})

    return _seq_edges_stateful


def stream_seq_edges_raw(
    transcripts: DataFrame, conv_ttl_ms: int | None = None
) -> DataFrame:
    """Incremental sequential-turn edges in pre-hash form
    (conv_id, src_turn, dst_turn) — the cross-batch stateful stage on its
    own, before vertex-id hashing. This face is what the driver's DuckDB
    oracle checks (a window-lead over the same transcript parquet), since
    Spark's xxhash64 is not reproducible SQL-side.

    conv_ttl_ms: evict a conversation's state this long after its last turn
    (continuous deployments only — see module docstring for why drain-style
    availableNow runs must leave it None)."""
    return (
        transcripts.select("conv_id", "turn_idx")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_seq_edges_stateful(conv_ttl_ms),
            outputStructType=_RAW_EDGE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if conv_ttl_ms is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )


def stream_seq_edges(
    transcripts: DataFrame, conv_ttl_ms: int | None = None
) -> DataFrame:
    """Incremental sequential-turn edges; schema-compatible with the batch
    projection (src, dst, kind, conv_id). One shuffle on conv_id per
    micro-batch (the state exchange); vertex-id hashing stays JVM-side."""
    raw = stream_seq_edges_raw(transcripts, conv_ttl_ms)
    return raw.select(
        F.xxhash64(F.col("conv_id"), F.col("src_turn")).alias("src"),
        F.xxhash64(F.col("conv_id"), F.col("dst_turn")).alias("dst"),
        F.lit("seq").alias("kind"),
        "conv_id",
    )


_SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_seq", T.LongType(), False),
    ]
)
_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_ns", T.LongType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def _make_sessionize_stateful(gap_seconds: int):
    gap_ns = int(gap_seconds) * 1_000_000_000

    def _sessionize_stateful(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # per-(group, micro-batch) dispatch is the measured throughput floor
        # of this operator (BASELINE.md r5 10M-row runs), so the body is
        # fully vectorized (guide §4.2): no per-row Python loop, no pandas
        # concat/sort in the 1-batch common case — numpy lexsort + a
        # cumsum over the gap predicate IS the session assignment
        import numpy as np

        dfs = [b for b in batches if len(b)]
        if not dfs:
            return
        pdf = dfs[0] if len(dfs) == 1 else pd.concat(dfs, ignore_index=True)
        # pin the epoch unit before the int view — Arrow may hand pandas
        # either ns or us resolution depending on version
        ts = pdf["ts"].to_numpy().astype("datetime64[ns]").astype("int64")
        eid = pdf["event_id"].to_numpy().astype("int64")
        order = np.lexsort((eid, ts))  # primary ts, tie-break event_id
        ts, eid = ts[order], eid[order]
        last_ns, seq = state.get if state.exists else (None, -1)
        incr = np.empty(len(ts), dtype=np.int64)
        incr[0] = 1 if (last_ns is None or ts[0] - last_ns > gap_ns) else 0
        if len(ts) > 1:
            incr[1:] = ts[1:] - ts[:-1] > gap_ns
        out = seq + np.cumsum(incr)
        state.update((int(ts[-1]), int(out[-1])))
        yield pd.DataFrame(
            {
                "event_id": eid,
                "user_id": np.full(len(eid), int(key[0]), dtype="int64"),
                "session_seq": out,
            }
        )

    return _sessionize_stateful


def stream_sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Streaming face of operators/textops.sessionize: per-user gap-based
    session assignment over an append-only event stream, cross-micro-batch
    (the state holds each user's last event time + current session index).

    Contract: per-user event times are non-decreasing across micro-batches
    (append-only log); within a batch arrival order is irrelevant (sorted
    per group). Under that contract the streamed (event_id, user_id,
    session_seq) equals the batch sessionize exactly — proved by the
    batch-equality pytest. State: one (ts, seq) tuple per user."""
    return (
        events.select("event_id", "user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionize_stateful(gap_seconds),
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_turn_rates(
    transcripts: DataFrame,
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Watermarked per-role turn counts in event-time windows — late rows
    beyond the watermark are dropped, state for closed windows is evicted
    (bounded-state metrics over an unbounded stream)."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("num_turns"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            "num_turns",
        )
    )


# size-adaptive state width calibration (see run_available_now): target
# rows per state partition per micro-batch, and the bytes/row divisor for
# estimating rows from source file sizes (measured 12.4 B/row on the
# narrow numeric event slices; same constant family as
# SuperstepEngine.EST_BYTES_PER_ROW). The 4096-row target sits on the
# measured plateau: at ~25k rows/batch, 8 partitions (~3k rows each) ran
# 5.2 s vs 9.6 s at 32 and 6.1 s at 4 — the per-partition-per-batch fixed
# cost (state store load/commit + a Python dispatch) dominates below ~4k
# rows of vectorized work per partition.
_STREAM_TARGET_ROWS_PER_PARTITION = 4096
_STREAM_EST_BYTES_PER_ROW = 12


def _adaptive_state_partitions(df: DataFrame) -> int | None:
    """Derive a state-store partition count from the stream SOURCE's size
    (guide §2.2 — scale-adaptive partitioning, the streaming twin of
    SuperstepEngine's size-aware width): estimate rows per micro-batch from
    the file-stream source's on-disk bytes and maxFilesPerTrigger, divide
    by the per-partition target, clamp to [1, session width]. Returns None
    (= leave the session conf) whenever the plan is not a single local
    file-stream source or anything in the estimate is unavailable — the
    derivation only ever SHRINKS the width (AQE-coalesce analog); remote
    or unbounded deployments size UP via the session conf / the explicit
    knob instead."""
    import glob as _glob
    import os

    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        if leaves.size() != 1:
            return None
        leaf = leaves.apply(0)
        if "StreamingRelation" not in leaf.getClass().getName():
            return None
        opts = {}
        it = leaf.dataSource().options().iterator()
        while it.hasNext():
            kv = it.next()
            opts[kv._1()] = kv._2()
        path = opts.get("path")
        if not path:
            return None
        if "://" in path and not path.startswith("file:"):
            return None  # non-local source: no cheap size estimate
        local = path[len("file:"):] if path.startswith("file:") else path
        files: list[str] = []
        for m in _glob.glob(local):
            if os.path.isdir(m):
                for root, _dirs, fns in os.walk(m):
                    files.extend(
                        os.path.join(root, fn)
                        for fn in fns
                        if not fn.startswith(("_", "."))
                    )
            elif not os.path.basename(m).startswith(("_", ".")):
                files.append(m)
        if not files:
            return None
        total = sum(os.path.getsize(f) for f in files)
        per_trigger = float(total)
        mfpt = opts.get("maxFilesPerTrigger")
        if mfpt is not None:
            k = int(mfpt)
            if 0 < k < len(files):
                per_trigger = total * k / len(files)
        est_rows = max(1, int(per_trigger) // _STREAM_EST_BYTES_PER_ROW)
        width = -(-est_rows // _STREAM_TARGET_ROWS_PER_PARTITION)
        n_session = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        return max(1, min(n_session, width))
    except Exception:
        return None


def run_available_now(
    df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain everything currently available through the streaming plan into
    an in-memory sink and return it as a DataFrame (test/drive helper; a
    production sink is writeStream.format('iceberg'/'parquet') with a
    checkpointLocation). Use output_mode='complete' for watermarked windowed
    aggregations when the stream ends before the watermark closes the last
    windows (append would emit nothing for them).

    state_partitions (or env MG_STREAM_STATE_PARTITIONS) scopes
    spark.sql.shuffle.partitions around query start: a stateful streaming
    query pins its state-store partition count at birth from that conf, and
    each partition pays fixed per-micro-batch costs (state store
    load/commit, a Python worker dispatch for applyInPandasWithState), so
    the right count tracks PER-BATCH data volume, not the session-wide
    width tuned for E-scale batch shuffles (measured on the sf0.1 drain:
    32 -> 8 partitions cut wall 9.6 -> 5.2 s at identical output; a
    100 TB/day deployment sizes it UP from throughput instead).

    Default (None / env 0): SIZE-ADAPTIVE — derived from the file-stream
    source's on-disk volume per trigger (_adaptive_state_partitions),
    falling back to the session conf when the source cannot be sized.
    Partition count is a pure performance knob (groups are hash-assigned
    whole to partitions; per-group output is partition-independent).
    Pass an explicit count (or env N>0) to pin it; -1 pins the session
    conf (the pre-adaptive behavior)."""
    import os

    spark = df.sparkSession
    sp = state_partitions or int(os.environ.get("MG_STREAM_STATE_PARTITIONS", "0"))
    if sp == 0:
        sp = _adaptive_state_partitions(df) or 0
    elif sp < 0:
        sp = 0
    saved = spark.conf.get("spark.sql.shuffle.partitions") if sp else None
    if sp:
        spark.conf.set("spark.sql.shuffle.partitions", str(sp))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if sp:
            spark.conf.set("spark.sql.shuffle.partitions", saved)
    return df.sparkSession.table(query_name)
