from pyspark.sql import functions as F

from minigraph_spark.fixtures import make_transcripts
from minigraph_spark.operators.project import (
    project_edges,
    roundtrip_check,
    seq_edges,
    symmetrize,
    tool_edges,
    transcript_vertices,
)


def test_seq_edges_count(spark):
    """Each conversation of length L contributes exactly L-1 seq edges."""
    t = make_transcripts(spark, num_convs=200, seed=42).persist()
    per_conv = t.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
    want = per_conv.agg(F.sum(F.col("n") - 1)).collect()[0][0]
    got = seq_edges(t).count()
    assert got == want


def test_seq_edges_follow_turn_order(spark):
    t = make_transcripts(spark, num_convs=50, seed=1)
    v = transcript_vertices(t).select("vid", "conv_id", "turn_idx")
    e = seq_edges(t)
    joined = (
        e.join(v.select(F.col("vid").alias("src"), F.col("turn_idx").alias("si")), "src")
        .join(v.select(F.col("vid").alias("dst"), F.col("turn_idx").alias("di")), "dst")
    )
    bad = joined.filter(F.col("di") != F.col("si") + 1).count()
    assert bad == 0


def test_tool_edges_same_tool_later_turn(spark):
    t = make_transcripts(spark, num_convs=500, seed=42).persist()
    e = tool_edges(t, max_fanout=16)
    v = transcript_vertices(t).select("vid", "conv_id", "turn_idx", "tool")
    joined = (
        e.join(
            v.select(F.col("vid").alias("src"), F.col("turn_idx").alias("si"),
                     F.col("tool").alias("stool"), F.col("conv_id").alias("sconv")),
            "src",
        )
        .join(
            v.select(F.col("vid").alias("dst"), F.col("turn_idx").alias("di"),
                     F.col("tool").alias("dtool"), F.col("conv_id").alias("dconv")),
            "dst",
        )
    )
    assert joined.filter(
        (F.col("stool") != F.col("dtool"))
        | (F.col("sconv") != F.col("dconv"))
        | (F.col("di") <= F.col("si"))
    ).count() == 0


def test_roundtrip_invariant(spark):
    """BASELINE.json input_hint per-row invariant: per-turn text equality
    under stable (conv_id, turn_idx) ordering after graph round-trip."""
    t = make_transcripts(spark, num_convs=300, seed=42)
    assert roundtrip_check(t)


def test_vid_uniqueness(spark):
    t = make_transcripts(spark, num_convs=1000, seed=42)
    v = transcript_vertices(t)
    assert v.select("vid").distinct().count() == t.count()


def test_symmetrize(spark):
    import pandas as pd

    e = spark.createDataFrame(
        pd.DataFrame([(0, 1), (1, 0), (1, 2), (2, 2)], columns=["src", "dst"]),
        schema="src long, dst long",
    )
    got = {(r["src"], r["dst"]) for r in symmetrize(e).collect()}
    assert got == {(0, 1), (1, 0), (1, 2), (2, 1)}


def test_project_edges_schema(spark):
    t = make_transcripts(spark, num_convs=50, seed=2)
    e = project_edges(t)
    assert e.columns == ["src", "dst", "kind", "conv_id"]
    kinds = {r["kind"] for r in e.select("kind").distinct().collect()}
    assert kinds <= {"seq", "tool"}
