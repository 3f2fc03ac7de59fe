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


def fake_media_rows(n: int, seed: int = 42, payload_bytes: int = 4096) -> list:
    """Deterministic synthetic media rows (pure NumPy, no Spark) — shared by
    make_fake_media and the driver's precomputed VALUES oracle, so the oracle
    derives expected features from the same bytes without touching Spark."""
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
    return rows


def make_fake_media(spark, n: int, seed: int = 42, payload_bytes: int = 4096) -> DataFrame:
    """Deterministic synthetic media table (binary payloads + metadata)."""
    return spark.createDataFrame(fake_media_rows(n, seed, payload_bytes), schema=MEDIA_SCHEMA)


def payload_stats(payload: bytes) -> tuple[int, float, float]:
    """(byte_len, byte_mean, byte_entropy) of one payload — the pure kernel
    behind media_features, reused by the driver's VALUES oracle."""
    a = np.frombuffer(payload, dtype=np.uint8)
    if not a.size:
        return 0, 0.0, 0.0
    counts = np.bincount(a, minlength=256)
    probs = counts[counts > 0] / a.size
    return int(a.size), float(a.mean()), float(-(probs * np.log2(probs)).sum())


def _fake_decode(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic stand-in decoder: folds payload bytes into an (h, w, 3)
    uint8 array. NOT a real codec — a seedable fixture so the pipeline
    around the decode is exercised for real."""
    a = np.frombuffer(payload, dtype=np.uint8)
    need = h * w * 3
    reps = -(-need // max(a.size, 1))
    return np.tile(a, reps)[:need].reshape(h, w, 3)


# --- real codecs (pure NumPy, zero deps) ---------------------------------
# PPM (P6), BMP (24-bit BI_RGB) and WAV (PCM16 mono) are simple public
# formats parseable with plain NumPy — they make the decode path REAL for
# those formats (fake=False), while compressed formats (png/jpeg/mp4) still
# require external codecs and stay stubbed.

def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6, maxval 255)."""
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode() + np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8. Handles comment lines."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos).reshape(h, w, 3)


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP (BI_RGB, bottom-up,
    BGR byte order, rows padded to 4 bytes)."""
    import struct

    h, w, _ = arr.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    bgr = np.ascontiguousarray(arr[:, :, ::-1], dtype=np.uint8)
    for y in range(h - 1, -1, -1):
        body += bgr[y].tobytes() + b"\x00" * pad
    data_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP -> (h, w, 3) uint8 RGB (bottom-up or top-down)."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    dib_size, w, h_signed, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    h = abs(h_signed)
    row = w * 3
    stride = row + ((-row) % 4)
    rows = []
    for y in range(h):
        off = data_off + y * stride
        rows.append(np.frombuffer(payload, dtype=np.uint8, count=row, offset=off).reshape(w, 3))
    img = np.stack(rows[::-1] if h_signed > 0 else rows)  # bottom-up -> top-down
    return img[:, :, ::-1].copy()  # BGR -> RGB


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM16 payload."""
    import struct

    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 mono -> (sample_rate, int16 samples). Walks chunks."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate, samples = None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from("<HHI", payload, pos)
            bits = struct.unpack_from("<H", payload, pos + 14)[0]
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("unsupported WAV (need PCM16 mono)")
        elif cid == b"data":
            samples = np.frombuffer(payload, dtype="<i2", count=size // 2, offset=pos)
        pos += size + (size % 2)
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, samples


_REAL_IMAGE_FORMATS = {"ppm": decode_ppm, "bmp": decode_bmp}


def real_media_rows(n: int, seed: int = 42) -> list:
    """Deterministic media rows with REAL payload encodings (PPM/BMP/WAV) —
    pure NumPy, shared by make_real_media and the driver's VALUES oracle."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = i % 3
        if kind < 2:
            h, w = 16 + (i % 4) * 8, 16 + (i % 3) * 8
            arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            fmt = "ppm" if kind == 0 else "bmp"
            payload = encode_ppm(arr) if kind == 0 else encode_bmp(arr)
            meta = ("image", fmt, w, h, None, None, None)
        else:
            sr = 8000
            ns = 1000 + (i % 7) * 100
            t = np.arange(ns)
            samples = (
                3000 * np.sin(2 * np.pi * 440 * t / sr)
                + 200 * rng.standard_normal(ns)
            ).astype(np.int16)
            payload = encode_wav(samples, sr)
            meta = ("audio", "wav", None, None, None, sr, 1000 * ns // sr)
        rows.append((i, bytearray(payload), meta))
    return rows


def make_real_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Media table whose payloads are REAL PPM/BMP/WAV encodings."""
    return spark.createDataFrame(real_media_rows(n, seed), schema=MEDIA_SCHEMA)


def _resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w, _ = img.shape
    ys = np.arange(out_h) * h // out_h
    xs = np.arange(out_w) * w // out_w
    return img[ys][:, xs]


def decode_image(df: DataFrame, out_h: int = 32, out_w: int = 32, fake: bool = False) -> DataFrame:
    """payload -> decoded pixel tensor via mapInPandas, nearest-resized to
    (out_h, out_w). fake=False REALLY decodes PPM and BMP payloads (pure
    NumPy codecs above); compressed formats (png/jpeg) would need PIL/cv2
    (not in this container) and raise inside the task. fake=True uses the
    deterministic fixture decoder regardless of format. Output: (media_id,
    height, width, pixels: array<int>) — fixed-size rows, shuffle-friendly.
    """

    if fake:
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

    def batches_real(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p, fmt in zip(pdf["payload"], pdf["format"]):
                dec = _REAL_IMAGE_FORMATS.get(fmt)
                if dec is None:
                    raise NotImplementedError(
                        f"decoding {fmt!r} requires PIL/cv2 (not in this "
                        "container); only ppm/bmp decode natively"
                    )
                img = _resize_nearest(dec(bytes(p)), out_h, out_w)
                out.append(img.ravel().astype(np.int32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(np.int64),
                    "height": out_h,
                    "width": out_w,
                    "pixels": out,
                }
            )

    pruned = df.select("media_id", "payload", F.col("meta.format").alias("format"))
    return pruned.mapInPandas(
        batches_real, schema="media_id long, height int, width int, pixels array<int>"
    )


def decode_audio(df: DataFrame) -> DataFrame:
    """WAV payload -> audio features via mapInPandas (REAL decode — the
    pure-NumPy RIFF/PCM16 parser above): (media_id, sample_rate, n_samples,
    mean_abs, rms), rounded to 6 so a precomputed oracle can check it.
    Fixed-size feature rows, same shuffle discipline as media_features."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            sr = np.zeros(n, dtype=np.int32)
            ns = np.zeros(n, dtype=np.int64)
            mean_abs = np.zeros(n, dtype=np.float64)
            rms = np.zeros(n, dtype=np.float64)
            for i, p in enumerate(pdf["payload"]):
                sr[i], samples = decode_wav(bytes(p))
                x = samples.astype(np.float64)
                ns[i] = x.size
                mean_abs[i] = np.abs(x).mean() if x.size else 0.0
                rms[i] = np.sqrt((x * x).mean()) if x.size else 0.0
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(np.int64),
                    "sample_rate": sr,
                    "n_samples": ns,
                    "mean_abs": np.round(mean_abs, 6),
                    "rms": np.round(rms, 6),
                }
            )

    wavs = df.filter(F.col("meta.format") == "wav").select("media_id", "payload")
    return wavs.mapInPandas(
        batches,
        schema="media_id long, sample_rate int, n_samples long, mean_abs double, rms double",
    )


def image_pixel_digest(decoded: DataFrame) -> DataFrame:
    """(media_id, height, width, px_sum, px_md5) from decode_image output —
    the digest runs JVM-side (aggregate + md5 over the canonical
    comma-joined pixel string), so a precomputed oracle verifies the REAL
    decode produced exactly the right pixels without shipping pixel arrays
    through the comparison."""
    joined = F.concat_ws(",", F.transform(F.col("pixels"), lambda x: x.cast("string")))
    return decoded.select(
        "media_id",
        "height",
        "width",
        F.aggregate("pixels", F.lit(0).cast("long"), lambda a, x: a + x).alias("px_sum"),
        F.md5(joined.cast("binary")).alias("px_md5"),
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
                length[i], mean[i], entropy[i] = payload_stats(p)
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
