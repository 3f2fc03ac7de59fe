"""Streaming ingest: incremental seq-edge projection == batch projection,
cross-micro-batch state, watermarked windowed aggregation."""

import os

import pytest

from minigraph_spark.fixtures import make_transcripts, make_transcripts_pdf
from minigraph_spark.operators.project import seq_edges
from minigraph_spark.streaming import (
    read_transcript_stream,
    run_available_now,
    stream_seq_edges,
    stream_turn_rates,
)


def _write_arrival_files(pdf, path, num_files):
    """Split a transcript table into arrival-ordered parquet files: file k
    holds each conversation's k-th slice of turns (so every conversation
    spans several micro-batches — the cross-batch state path is exercised,
    while turn_idx stays non-decreasing per conversation, matching the
    append-only-log contract)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    for k in range(num_files):
        lo = pdf.groupby("conv_id")["turn_idx"].transform(
            lambda s: (s.rank(method="first") - 1) * num_files // len(s)
        )
        part = pdf[lo == k]
        if len(part) == 0:
            continue
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            f"{path}/part-{k:03d}.parquet",
        )


@pytest.fixture(scope="module")
def arrival_dir(tmp_path_factory):
    pdf = make_transcripts_pdf(300, seed=7)
    path = str(tmp_path_factory.mktemp("stream") / "transcripts")
    _write_arrival_files(pdf, path, num_files=4)
    return path, pdf


def test_stream_seq_edges_equals_batch(spark, arrival_dir):
    path, pdf = arrival_dir
    # one file per micro-batch: conversations span 4 batches, so edges must
    # chain across batches through the per-conversation state
    stream = read_transcript_stream(spark, path, max_files_per_trigger=1)
    got = run_available_now(stream_seq_edges(stream), "seq_edges_stream")
    expect = seq_edges(
        spark.createDataFrame(pdf, schema="conv_id string, turn_idx int, "
                                          "role string, text string, tool string, ts timestamp")
    )
    g = {(r.src, r.dst) for r in got.collect()}
    e = {(r.src, r.dst) for r in expect.collect()}
    assert g == e and len(g) > 0


def test_stream_seq_edges_no_duplicates(spark, arrival_dir):
    path, _ = arrival_dir
    stream = read_transcript_stream(spark, path, max_files_per_trigger=1)
    got = run_available_now(stream_seq_edges(stream), "seq_edges_dup").collect()
    assert len(got) == len({(r.src, r.dst) for r in got})


def test_stream_turn_rates_matches_batch_counts(spark):
    tr = make_transcripts(spark, 100, seed=11)
    tmp = "/tmp/mg_stream_rates_src"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    tr.write.parquet(tmp)
    stream = read_transcript_stream(spark, tmp)
    rates = run_available_now(
        stream_turn_rates(stream, window="10 minutes", watermark="1 minute"),
        "turn_rates",
        output_mode="complete",
    )
    total_streamed = sum(r.num_turns for r in rates.collect())
    assert total_streamed == tr.filter("ts is not null").count()
    # window bounds are 10-minute aligned
    assert all(
        r.window_start.minute % 10 == 0 and r.window_end > r.window_start
        for r in rates.collect()
    )


def test_stream_delta_feeds_incremental_wcc(spark, tmp_path):
    """End-to-end daily-delta composition: stream the transcript log,
    batch-converge components, then stream the newly arrived turns and
    maintain the components INCREMENTALLY — the IncEval face consuming the
    streaming projection's output. Must equal batch WCC on the full log.
    (A production deployment gets the delta directly from the checkpointed
    stream; here the second drain re-reads everything, so the delta is the
    new-minus-old edge set — the same rows.)"""
    import shutil

    from minigraph_spark.plans.wcc import run_wcc, run_wcc_incremental

    pdf = make_transcripts_pdf(200, seed=23)
    staging = str(tmp_path / "staging")
    live = str(tmp_path / "live")
    _write_arrival_files(pdf, staging, num_files=4)
    os.makedirs(live, exist_ok=True)
    files = sorted(os.listdir(staging))
    for f in files[:3]:
        shutil.copy(f"{staging}/{f}", f"{live}/{f}")

    stream = read_transcript_stream(spark, live, max_files_per_trigger=1)
    v1 = run_available_now(stream_seq_edges(stream), "delta_wcc_v1").select("src", "dst")
    v1.persist().count()
    prev = run_wcc(v1)

    shutil.copy(f"{staging}/{files[3]}", f"{live}/{files[3]}")
    stream2 = read_transcript_stream(spark, live, max_files_per_trigger=1)
    v2 = run_available_now(stream_seq_edges(stream2), "delta_wcc_v2").select("src", "dst")
    v2.persist().count()
    delta = v2.exceptAll(v1)

    inc = run_wcc_incremental(v1, delta, prev.state)
    batch = run_wcc(v2)
    got = {r["vid"]: r["value"] for r in inc.state.collect()}
    want = {r["vid"]: r["value"] for r in batch.state.collect()}
    assert got == want
    v1.unpersist()
    v2.unpersist()


def test_stream_sessionize_equals_batch(spark, tmp_path):
    """Cross-micro-batch streaming sessionization == batch sessionize on the
    same events: each user's events are split time-ordered across 3 files
    (one per micro-batch), so sessions must chain through the per-user
    state, including gaps that straddle a batch boundary."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from minigraph_spark.operators.textops import sessionize
    from minigraph_spark.streaming import run_available_now, stream_sessionize

    rng = np.random.default_rng(11)
    n = 600
    users = rng.integers(0, 20, size=n)
    # bursty inter-event gaps: mostly short, some >> threshold
    gaps = np.where(rng.random(n) < 0.2, 7200, 60) + rng.integers(0, 30, size=n)
    ts = pd.to_datetime("2026-01-01") + pd.to_timedelta(
        np.cumsum(gaps), unit="s"
    )
    pdf = pd.DataFrame(
        {"event_id": np.arange(n, dtype=np.int64), "user_id": users.astype(np.int64),
         "ts": ts.astype("datetime64[us]")}
    )
    path = str(tmp_path / "events")
    import os

    os.makedirs(path)
    order = pdf.sort_values(["user_id", "ts", "event_id"])
    slot = order.groupby("user_id").cumcount() * 3 // order.groupby(
        "user_id"
    )["event_id"].transform("size")
    for k in range(3):
        part = order[slot == k]
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       f"{path}/part-{k}.parquet")
    # FileStreamSource orders micro-batches by file modification time with
    # an arbitrary tie-break: stagger mtimes explicitly (same guard as
    # bench.py's streaming section) — back-to-back writes can land in the
    # same mtime tick, and an out-of-order slice silently violates the
    # operator's per-user non-decreasing-ts contract across batches
    import time as _time

    base_mtime = _time.time() - 1000
    for k in range(3):
        os.utime(f"{path}/part-{k}.parquet", (base_mtime + k, base_mtime + k))

    schema = "event_id long, user_id long, ts timestamp"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    )
    got = run_available_now(
        stream_sessionize(stream, gap_seconds=1800), "sessionize_stream"
    )
    batch = sessionize(spark.createDataFrame(pdf, schema=schema), gap_seconds=1800)
    g = {(r.event_id, r.user_id): r.session_seq for r in got.collect()}
    b = {(r.event_id, r.user_id): r.session_seq for r in batch.collect()}
    assert g == b and len(g) == n
    # sessions actually split (the fixture has real >30min gaps)
    assert max(g.values()) >= 3


def test_adaptive_state_partitions_from_source_size(spark, tmp_path):
    """The size-adaptive state width (run_available_now default) derives
    the partition count from the file-stream source's bytes per trigger:
    tiny sources shrink to 1, maxFilesPerTrigger scales the estimate, the
    width never exceeds the session conf, and a non-stream plan returns
    None (fall back to the session conf). Width is a pure performance
    knob — the equality tests above already pin output identity."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from minigraph_spark.streaming import (
        _STREAM_EST_BYTES_PER_ROW,
        _STREAM_TARGET_ROWS_PER_PARTITION,
        _adaptive_state_partitions,
        stream_sessionize,
    )

    path = str(tmp_path / "ev")
    os.makedirs(path)
    n = 500
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": (np.arange(n, dtype=np.int64) % 7),
            "ts": pd.to_datetime("2026-01-01")
            + pd.to_timedelta(np.arange(n), unit="s"),
        }
    )
    for k in range(2):
        pq.write_table(
            pa.Table.from_pandas(pdf[pdf.event_id % 2 == k], preserve_index=False),
            f"{path}/part-{k}.parquet",
        )
    schema = "event_id long, user_id long, ts timestamp"

    # tiny source, one file per trigger -> width 1
    s1 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    assert _adaptive_state_partitions(stream_sessionize(s1)) == 1

    # the estimate follows bytes-per-trigger: with both files in one
    # trigger it is exactly total_bytes/12 rows, rounded up into
    # target-sized partitions (still clamped to the session width)
    files = [f"{path}/part-{k}.parquet" for k in range(2)]
    total = sum(os.path.getsize(f) for f in files)
    est_rows = max(1, total // _STREAM_EST_BYTES_PER_ROW)
    want = -(-est_rows // _STREAM_TARGET_ROWS_PER_PARTITION)
    n_session = int(spark.conf.get("spark.sql.shuffle.partitions"))
    s2 = spark.readStream.schema(schema).parquet(path)
    assert _adaptive_state_partitions(stream_sessionize(s2)) == max(
        1, min(n_session, want)
    )

    # a batch (non-stream) plan has no StreamingRelation leaf -> None
    assert _adaptive_state_partitions(spark.createDataFrame(pdf, schema)) is None
