"""Transcript source adapter: catalog-vs-path dispatch, schema conform,
and the per-turn text-equality invariant through the adapter
(BASELINE.json input_hint: Iceberg transcript table -> canonical schema)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minigraph_spark.fixtures import make_transcripts  # noqa: E402
from minigraph_spark.operators.project import roundtrip_check  # noqa: E402
from minigraph_spark.schemas import TRANSCRIPT_SCHEMA  # noqa: E402
from minigraph_spark.sources.transcripts import (  # noqa: E402
    conform_transcripts,
    is_table_name,
    load_transcripts,
)


def _names_types(schema):
    # parquet roundtrips drop non-null flags, so the conform contract is
    # (name, type, order) — not nullability
    return [(f.name, f.dataType) for f in schema.fields]


def test_is_table_name_dispatch(tmp_path):
    assert is_table_name("prod.chat.transcripts")
    assert is_table_name("some_temp_view")
    assert not is_table_name("testdata/sf0.01/events.parquet")
    assert not is_table_name("s3://bucket/transcripts")
    assert not is_table_name(str(tmp_path))  # existing local dir


def test_load_from_catalog_view_and_parquet_path(spark, tmp_path):
    tr = make_transcripts(spark, 60, seed=7)
    # catalog branch: Iceberg tables resolve through the same read.table
    tr.createOrReplaceTempView("transcripts_view_t1")
    via_table = load_transcripts(spark, "transcripts_view_t1")
    # path branch
    p = str(tmp_path / "tr.parquet")
    tr.write.parquet(p)
    via_path = load_transcripts(spark, p)
    assert _names_types(via_table.schema) == _names_types(TRANSCRIPT_SCHEMA)
    assert _names_types(via_path.schema) == _names_types(TRANSCRIPT_SCHEMA)
    a = sorted(via_table.collect())
    b = sorted(via_path.collect())
    assert a == b and len(a) > 60


def test_conform_casts_widened_types_and_prunes(spark):
    tr = make_transcripts(spark, 20, seed=3)
    # simulate the common parquet drift: int64 turn_idx, extra column,
    # shuffled column order
    drifted = tr.selectExpr(
        "text", "cast(turn_idx as long) as turn_idx", "ts", "role",
        "conv_id", "tool", "1 as extra_col"
    )
    out = conform_transcripts(drifted)
    assert _names_types(out.schema) == _names_types(TRANSCRIPT_SCHEMA)
    assert sorted(out.collect()) == sorted(tr.collect())
    loose = conform_transcripts(drifted, strict=False)
    assert loose.columns == [f.name for f in TRANSCRIPT_SCHEMA.fields] + ["extra_col"]


def test_missing_column_is_a_clear_error(spark):
    tr = make_transcripts(spark, 5, seed=1).drop("tool", "ts")
    with pytest.raises(ValueError, match=r"missing required column\(s\) \['tool', 'ts'\]"):
        conform_transcripts(tr)


def test_per_turn_text_equality_through_adapter(spark, tmp_path):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering must hold for transcripts loaded through
    the adapter, not just for fixture-born frames."""
    tr = make_transcripts(spark, 80, seed=11)
    p = str(tmp_path / "tr2.parquet")
    tr.write.parquet(p)
    loaded = load_transcripts(spark, p)
    assert roundtrip_check(loaded)
