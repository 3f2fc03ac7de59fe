"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

No reference analog (MiniGraph is scalar-uint-only, sys_types.h:7-15); this
is the training-data-pipeline surface the engine must carry at 100 TB:
media travel as `binary` columns with a typed metadata struct, and every
transform is an Arrow-batched mapInPandas / pandas UDF — never per-row
Python, never driver-side bytes.

The actual codec step is STUBBED (no image/audio libs in this container):
`decode_image` raises NotImplementedError unless `fake=True`, in which case
a deterministic fake decoder (bytes -> seeded uint8 array via xxhash-style
folding) stands in so the Spark-side plumbing — schema, batch shape,
partitioning, UDF signatures — is real and testable end-to-end.

Scale notes: binary payloads dominate row size, so ops here preserve
partitioning (mapInPandas, no shuffle), prune early (select only payload +
metadata needed), and emit fixed-size features so downstream shuffles move
KBs, not media bytes. maxRecordsPerBatch bounds Arrow batch memory when
payloads are MBs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # png|jpeg|wav|mp4|raw
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ]
)


def make_fake_media(spark, n: int, seed: int = 42, payload_bytes: int = 4096) -> DataFrame:
    """Deterministic synthetic media table (binary payloads + metadata)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = [("image", "png"), ("image", "jpeg"), ("audio", "wav"), ("video", "mp4")]
    for i in range(n):
        mt, fmt = kinds[i % len(kinds)]
        payload = rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                bytearray(payload),
                (
                    mt,
                    fmt,
                    64 + (i % 8) * 16 if mt == "image" else None,
                    64 + (i % 4) * 16 if mt == "image" else None,
                    (i % 30) + 1 if mt == "video" else None,
                    16000 if mt == "audio" else None,
                    1000 * ((i % 10) + 1) if mt in ("audio", "video") else None,
                ),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic stand-in decoder: folds payload bytes into an (h, w, 3)
    uint8 array. NOT a real codec — a seedable fixture so the pipeline
    around the decode is exercised for real."""
    a = np.frombuffer(payload, dtype=np.uint8)
    need = h * w * 3
    reps = -(-need // max(a.size, 1))
    return np.tile(a, reps)[:need].reshape(h, w, 3)


def decode_image(df: DataFrame, out_h: int = 32, out_w: int = 32, fake: bool = False) -> DataFrame:
    """payload -> decoded pixel tensor (flattened), via mapInPandas.

    Real codecs (PIL/cv2) are unavailable in this container: fake=False
    raises NotImplementedError at plan-build time; fake=True uses the
    deterministic fixture decoder. Output: (media_id, height, width,
    pixels: array<int>) — fixed-size rows, shuffle-friendly.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/cv2 (not in this container); "
            "pass fake=True for the deterministic fixture decoder"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pix = [
                _fake_decode(p, out_h, out_w).ravel()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(np.int64),
                    "height": out_h,
                    "width": out_w,
                    "pixels": [x.astype(np.int32) for x in pix],
                }
            )

    pruned = df.select("media_id", "payload")
    return pruned.mapInPandas(
        batches, schema="media_id long, height int, width int, pixels array<int>"
    )


def media_features(df: DataFrame) -> DataFrame:
    """Cheap payload-level features without decoding: byte length, entropy,
    byte mean — vectorized pandas over Arrow batches. The fixed-size feature
    row is what downstream dedup/similarity shuffles instead of payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            length = np.zeros(n, dtype=np.int64)
            mean = np.zeros(n, dtype=np.float64)
            entropy = np.zeros(n, dtype=np.float64)
            for i, p in enumerate(pdf["payload"]):
                a = np.frombuffer(p, dtype=np.uint8)
                length[i] = a.size
                mean[i] = float(a.mean()) if a.size else 0.0
                if a.size:
                    counts = np.bincount(a, minlength=256)
                    probs = counts[counts > 0] / a.size
                    entropy[i] = float(-(probs * np.log2(probs)).sum())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(np.int64),
                    "byte_len": length,
                    "byte_mean": np.round(mean, 6),
                    "byte_entropy": np.round(entropy, 6),
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema="media_id long, byte_len long, byte_mean double, byte_entropy double"
    )


def frame_sample(df: DataFrame, every_n: int = 5, fake: bool = False) -> DataFrame:
    """Video frame sampling: one row per sampled frame index (decode stubbed;
    frame indices computed from metadata — real plumbing, fake frames)."""
    if not fake:
        raise NotImplementedError(
            "video decoding requires av/cv2 (not in this container); "
            "pass fake=True to emit frame-index rows from metadata only"
        )
    vids = df.filter(F.col("meta.media_type") == "video").select(
        "media_id", F.col("meta.n_frames").alias("n_frames")
    )
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def resize_image(df: DataFrame, out_h: int, out_w: int, fake: bool = False) -> DataFrame:
    """Decode + nearest-neighbor resize in one mapInPandas pass (stubbed
    decode; the resize math is real and vectorized)."""
    decoded = decode_image(df, out_h=64, out_w=64, fake=fake)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys = (np.arange(out_h) * 64 // out_h)
        xs = (np.arange(out_w) * 64 // out_w)
        for pdf in it:
            out = []
            for pix in pdf["pixels"]:
                img = np.asarray(pix, dtype=np.int32).reshape(64, 64, 3)
                out.append(img[ys][:, xs].ravel())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(np.int64),
                    "height": out_h,
                    "width": out_w,
                    "pixels": out,
                }
            )

    return decoded.mapInPandas(
        batches, schema="media_id long, height int, width int, pixels array<int>"
    )
