"""Fixed StructType schemas (SURVEY.md §1.3).

The reference fixes its schema at compile time via C++ templates
(reference: minigraph/portability/sys_types.h:7-10 — gid/vid/vdata/edata are
all 32-bit unsigned). We widen vertex ids to LongType (10^12-turn scale needs
>2^32 ids) and carry scores as DoubleType (the reference truncates PageRank to
unsigned, see plans/pagerank.py for both variants).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Primary input: Iceberg-style transcript table (BASELINE.json input_hint).
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Canonical COO edge table (reference: minigraph/graphs/edgelist.h:30-172 —
# the flat [src,dst] pair buffer; a DataFrame of (src,dst) is the native
# Spark equivalent).
EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
    ]
)

# Edge table as projected from transcripts (operators/project.py), keeping
# provenance columns for lineage / invariant checks.
PROJECTED_EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # 'seq' | 'tool'
        T.StructField("conv_id", T.StringType(), False),
    ]
)

# Vertex state for the superstep engine (reference vdata_ array +
# active bitmap, minigraph/graphs/graph.h:68-139 + utility/bitmap.h).
def vertex_state_schema(value_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("vid", T.LongType(), False),
            T.StructField("value", value_type, True),
            T.StructField("active", T.BooleanType(), False),
        ]
    )


# Per-iteration metrics row (reference StatisticInfo,
# minigraph/portability/sys_data_structure.h:96-137, persisted per fragment;
# ours is one row per (iteration, partition-summary)).
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("iteration", T.IntegerType(), False),
        T.StructField("num_active", T.LongType(), False),
        T.StructField("num_changed", T.LongType(), False),
        T.StructField("num_messages", T.LongType(), False),
        T.StructField("elapsed_sec", T.DoubleType(), False),
        T.StructField("checkpointed", T.BooleanType(), False),
    ]
)
