"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

No reference analog (MiniGraph is scalar-uint-only, sys_types.h:7-15); this
is the training-data-pipeline surface the engine must carry at 100 TB:
media travel as `binary` columns with a typed metadata struct, and every
transform is an Arrow-batched mapInPandas / pandas UDF — never per-row
Python, never driver-side bytes.

Decode is REAL for PPM/BMP/PNG/baseline-JPEG images, RIFF PCM16 WAV
audio, and Y4M + Motion-JPEG-MP4 video — via the pure-NumPy codecs below
(PNG needs only stdlib zlib; zero external deps). Only H.264/HEVC sample
payloads genuinely need an external codec library absent from this
container: those rows raise
inside the task, and `fake=True` substitutes a deterministic fixture
decoder (bytes -> seeded uint8 array) so the Spark-side plumbing — schema,
batch shape, partitioning, UDF signatures — stays testable on any format.

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
# those formats (fake=False); PNG needs only stdlib zlib and baseline
# JPEG only NumPy, and MJPEG-MP4 rides on the JPEG codec (all below);
# only H.264/HEVC sample payloads stay honestly stubbed.

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


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1),
               colorspace: str = "C444") -> bytes:
    """(n, h, w, 3) uint8 YCbCr -> YUV4MPEG2 stream.

    Y4M is the standard uncompressed video container (mjpegtools/ffmpeg
    `yuv4mpegpipe`): one ASCII stream header, then per frame an ASCII FRAME
    marker followed by raw planar Y/Cb/Cr data. C444 stores full-resolution
    chroma; C422 halves chroma width; C420* variants halve both dimensions
    (subsampling here takes the top-left sample of each block — determinate,
    so the decode digest is reproducible)."""
    n, h, w, _ = frames.shape
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n".encode()
    )
    for f in range(n):
        fr = np.ascontiguousarray(frames[f], dtype=np.uint8)
        out += b"FRAME\n" + fr[:, :, 0].tobytes()
        for c in (1, 2):
            plane = fr[:, :, c]
            if colorspace == "C422":
                plane = plane[:, ::2]
            elif colorspace.startswith("C420"):
                plane = plane[::2, ::2]
            elif colorspace != "C444":
                raise ValueError(f"unsupported y4m colorspace {colorspace}")
            out += plane.tobytes()
    return bytes(out)


def decode_y4m(payload: bytes) -> np.ndarray:
    """YUV4MPEG2 -> (n_frames, h, w, 3) uint8 YCbCr.

    Parses the real container: stream-header tag soup (W/H/F/I/A/C tokens,
    unknown X tokens ignored), per-frame FRAME lines with optional
    parameters, planar plane layout. Subsampled chroma (C422, C420 and its
    siting variants — identical plane sizes, siting does not change plane
    parsing) is upsampled by nearest-neighbor repeat to full resolution so
    every frame decodes to a dense (h, w, 3) tensor. Compressed codecs
    (mp4/h264/vp9) genuinely need external decoders and are NOT handled
    here — but Y4M makes the video path real end-to-end, exactly as
    PPM/BMP/WAV did for images/audio."""
    nl = payload.index(b"\n")
    toks = payload[:nl].decode("ascii").split(" ")
    if toks[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    colorspace = "C420jpeg"  # the spec's default when no C tag is present
    for t in toks[1:]:
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            colorspace = t
    if w is None or h is None:
        raise ValueError("y4m header missing W/H")
    if colorspace == "C444":
        cw, ch = w, h
    elif colorspace == "C422":
        cw, ch = (w + 1) // 2, h
    elif colorspace.startswith("C420"):
        cw, ch = (w + 1) // 2, (h + 1) // 2
    else:
        raise ValueError(f"unsupported y4m colorspace {colorspace}")
    ysz, csz = w * h, cw * ch
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos:fnl].split(b" ")[0] != b"FRAME":
            raise ValueError("malformed y4m frame header")
        pos = fnl + 1
        y = np.frombuffer(payload, np.uint8, ysz, pos).reshape(h, w)
        cb = np.frombuffer(payload, np.uint8, csz, pos + ysz).reshape(ch, cw)
        cr = np.frombuffer(payload, np.uint8, csz, pos + ysz + csz).reshape(ch, cw)
        pos += ysz + 2 * csz
        if (ch, cw) != (h, w):  # nearest-neighbor chroma upsample
            cb = np.repeat(np.repeat(cb, -(-h // ch), 0)[:h], -(-w // cw), 1)[:, :w]
            cr = np.repeat(np.repeat(cr, -(-h // ch), 0)[:h], -(-w // cw), 1)[:, :w]
        frames.append(np.stack([y, cb, cr], axis=-1))
    return np.stack(frames) if frames else np.zeros((0, h, w, 3), np.uint8)


# --- PNG (RFC 2083 / W3C spec), pure stdlib-zlib + NumPy ------------------
# PNG is "compressed" only in the DEFLATE sense, and Python ships zlib —
# so unlike JPEG/MP4 (entropy coding + DCT / full container stacks, still
# honestly stubbed) a spec-correct PNG codec needs zero new dependencies.
# Scope: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
# 6 (RGBA — alpha discarded; this pipeline's contract is (h, w, 3) RGB),
# all five filter types, multi-IDAT streams, per-chunk CRC validation.
# Adam7 interlace raises NotImplementedError (no fixture uses it).

def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PaethPredictor over int arrays (left, up, upper-left)."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_filter_scanlines(
    raw: np.ndarray, bpp: int, filters: "list[int]"
) -> bytes:
    """Forward-filter (h, stride) int32 sample rows per the PNG spec —
    the exact inverse of decode_png's unfilter loop."""
    h = raw.shape[0]
    zero = np.zeros(raw.shape[1], dtype=np.int32)
    out = bytearray()
    for y in range(h):
        cur, prev = raw[y], (raw[y - 1] if y else zero)
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        f = filters[y]
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - (left + prev) // 2
        elif f == 4:
            filt = cur - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out += bytes([f]) + (filt % 256).astype(np.uint8).tobytes()
    return bytes(out)


def _png_assemble(
    samples: np.ndarray,
    w: int,
    h: int,
    ctype: int,
    bpp: int,
    filters: "list[int] | None" = None,
    plte: "np.ndarray | None" = None,
    idat_split: int = 1,
) -> bytes:
    """Build a full PNG byte stream from (h, w*bpp) uint8 samples.
    idat_split > 1 splits the compressed stream across that many IDAT
    chunks (spec-legal; exercises the decoder's concatenation path)."""
    import struct
    import zlib

    if filters is None:
        filters = [y % 5 for y in range(h)]
    body = zlib.compress(
        _png_filter_scanlines(samples.astype(np.int32), bpp, filters), 6
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", np.ascontiguousarray(plte, np.uint8).tobytes())
    step = -(-len(body) // idat_split)
    for i in range(0, max(len(body), 1), max(step, 1)):
        out += _png_chunk(b"IDAT", body[i : i + step])
    return out + _png_chunk(b"IEND", b"")


def encode_png(arr: np.ndarray, filters: "list[int] | None" = None) -> bytes:
    """(h, w, 3) uint8 RGB -> PNG (8-bit, color type 2). `filters` picks
    the per-row filter type (default: row y uses y % 5, so a round-trip
    exercises every unfilter path in decode_png)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    return _png_assemble(arr.reshape(h, w * 3), w, h, ctype=2, bpp=3,
                         filters=filters)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> (h, w, 3) uint8 RGB. Validates every chunk CRC; concatenates
    multi-IDAT streams before inflating; unfilters all five filter types.
    Gray broadcasts to 3 channels, palette indexes PLTE, RGBA drops alpha."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, idat, plte = 8, bytearray(), None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        kind = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(kind + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {kind!r} CRC mismatch")
        if kind == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif kind == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif kind == b"IDAT":
            idat += data
        elif kind == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None or ctype == 4:
        raise ValueError(f"unsupported PNG color type {ctype}")
    bpp = channels
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int32)
        if f == 0:
            cur = line
        elif f == 2:
            cur = line + prev
        elif f in (1, 3, 4):
            # left-dependent filters: sequential over pixels, vectorized
            # across the pixel's channels (rows are fixture-small; the
            # batch-level parallelism lives in mapInPandas above this)
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(0, stride, bpp):
                left = cur[x - bpp : x] if x else np.zeros(bpp, np.int32)
                up = prev[x : x + bpp]
                upleft = prev[x - bpp : x] if x else np.zeros(bpp, np.int32)
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, upleft)
                # reduce mod 256 NOW: the next pixel's `left` must read
                # reconstructed bytes, not the unreduced running sum
                cur[x : x + bpp] = (line[x : x + bpp] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        cur %= 256
        img[y], prev = cur.astype(np.uint8), cur
    px = img.reshape(h, w, bpp)
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[px[:, :, 0]]
    return px[:, :, :3].copy()  # RGB, or RGBA with alpha dropped


# --- JPEG (ITU-T T.81 baseline sequential DCT), pure NumPy ----------------
# Real entropy-coded baseline JPEG, zero new dependencies. The encoder
# emits its OWN canonical Huffman tables in DHT (the spec carries tables
# in-stream precisely so decoders never assume the Annex K examples): all
# symbols a table uses get equal-length codes — valid, deterministic,
# mildly suboptimal, and it keeps no 162-entry constant blobs in the repo.
# The decoder is table-driven from the stream (BITS/HUFFVAL canonical
# walk), handles grayscale and 3-component YCbCr at sampling factors <= 2
# (4:4:4 and 4:2:0 covered), multiple DQT/DHT payloads per marker, byte
# stuffing, and DRI/RSTn predictor resets. Progressive (SOF2) and
# arithmetic coding honestly raise.

def _zigzag_order() -> np.ndarray:
    """Raster index for each zigzag position (derived, not transcribed)."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            diag.reverse()  # even anti-diagonals run bottom-left -> top-right
        order.extend(i * 8 + j for i, j in diag)
    return np.array(order, dtype=np.int64)


_JPEG_ZZ = _zigzag_order()
_JPEG_UNZZ = np.argsort(_JPEG_ZZ)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix M: F = M @ f @ M.T, f = M.T @ F @ M."""
    n = np.arange(8)
    m = 0.5 * np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    m[0] /= np.sqrt(2)
    return m


_JPEG_DCT = _dct_matrix()


def _jpeg_category(v: int) -> int:
    return int(abs(v)).bit_length()


def _jpeg_extend(v: int, t: int) -> int:
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


class _JpegBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        for shift in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> shift) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def pad_to_byte(self) -> None:
        while self.n:
            self.write(1, 1)


def _jpeg_fixed_tables(symbols_used: set) -> tuple[list, list, dict]:
    """Equal-length canonical table over the symbols actually used:
    BITS counts, HUFFVAL list, and symbol -> (code, length). Length is the
    smallest L with nsym <= 2^L - 1, so the all-ones code stays unused
    (T.81 C.2 requires it free for marker-prefix safety)."""
    vals = sorted(symbols_used)
    L = 1
    while len(vals) > (1 << L) - 1:
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(vals)
    enc = {v: (i, L) for i, v in enumerate(vals)}
    return bits, vals, enc


def _jpeg_tokenize_block(coef_zz: np.ndarray, pred: int) -> tuple[int, list]:
    """(new DC pred, token list) — tokens are ('dc'|'ac', symbol, value
    bits, nbits)."""
    tokens = []
    diff = int(coef_zz[0]) - pred
    t = _jpeg_category(diff)
    bits_val = diff if diff >= 0 else diff + (1 << t) - 1
    tokens.append(("dc", t, bits_val, t))
    k = 1
    run = 0
    for k in range(1, 64):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            tokens.append(("ac", 0xF0, 0, 0))  # ZRL
            run -= 16
        s = _jpeg_category(v)
        bits_v = v if v >= 0 else v + (1 << s) - 1
        tokens.append(("ac", (run << 4) | s, bits_v, s))
        run = 0
    if run:
        tokens.append(("ac", 0x00, 0, 0))  # EOB
    return int(coef_zz[0]), tokens


def _jpeg_plane_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(nby, nbx, 64) zigzagged quantized coefficients of a level-shifted
    plane padded to 8-multiples by edge replication."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane.astype(np.float64) - 128.0,
                    ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    freq = np.einsum("ij,abjk,lk->abil", _JPEG_DCT, blocks, _JPEG_DCT)
    q = np.round(freq / qt[None, None]).astype(np.int32)
    return q.reshape(ph // 8, pw // 8, 64)[:, :, _JPEG_ZZ]


def encode_jpeg(
    arr: np.ndarray,
    quant: "int | np.ndarray" = 1,
    sampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG encoder. arr: (h, w, 3) uint8 RGB or (h, w) grayscale.
    quant: uniform scalar or explicit (8,8) table(s) — scalar 1 makes the
    DCT stage near-lossless (roundtrip error is float/round only).
    sampling: '444' or '420' (3-channel only)."""
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if sampling not in ("444", "420") or (gray and sampling == "420"):
        raise ValueError("sampling must be 444, or 420 for RGB input")
    qt_l = np.full((8, 8), int(quant), np.uint8) if np.isscalar(quant) else np.asarray(quant, np.uint8)
    qt_c = qt_l
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0
        if sampling == "420":
            ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
            cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]
    samp = [(1, 1)] if gray else ([(1, 1)] * 3 if sampling == "444" else [(2, 2), (1, 1), (1, 1)])
    qts = [qt_l] if gray else [qt_l, qt_c, qt_c]
    coefs = [_jpeg_plane_blocks(p, q.astype(np.float64)) for p, q in zip(planes, qts)]

    # MCU walk -> token stream (pass 1: symbol counts; pass 2: bits)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    dc_syms: dict = {0: set(), 1: set()}
    ac_syms: dict = {0: set(), 1: set()}
    mcus = []
    preds = [0] * len(planes)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                preds = [0] * len(planes)
                mcus.append(("rst",))
            n_mcu += 1
            for ci, (hi, vi) in enumerate(samp):
                cls = 0 if ci == 0 else 1
                for dv in range(vi):
                    for dh in range(hi):
                        by = min(my * vi + dv, coefs[ci].shape[0] - 1)
                        bx = min(mx * hi + dh, coefs[ci].shape[1] - 1)
                        preds[ci], toks = _jpeg_tokenize_block(
                            coefs[ci][by, bx], preds[ci]
                        )
                        for kind, sym, _bv, _nb in toks:
                            (dc_syms if kind == "dc" else ac_syms)[cls].add(sym)
                        mcus.append(("blk", cls, toks))
    tables = {}
    for cls in range(2 if len(planes) > 1 else 1):
        tables[("dc", cls)] = _jpeg_fixed_tables(dc_syms[cls] or {0})
        tables[("ac", cls)] = _jpeg_fixed_tables(ac_syms[cls] or {0})

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI
    dqt = bytes([0]) + bytes(qt_l.reshape(64)[_JPEG_ZZ])
    if not gray:
        dqt += bytes([1]) + bytes(qt_c.reshape(64)[_JPEG_ZZ])
    out += seg(0xDB, dqt)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    dht = b""
    for (kind, cls), (bits, vals, _enc) in sorted(tables.items()):
        dht += bytes([(0 if kind == "dc" else 0x10) | cls]) + bytes(bits) + bytes(vals)
    out += seg(0xC4, dht)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        cls = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (cls << 4) | cls])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    bw = _JpegBitWriter()
    rst_i = 0
    for item in mcus:
        if item[0] == "rst":
            bw.pad_to_byte()
            bw.out += bytes([0xFF, 0xD0 + (rst_i % 8)])
            rst_i += 1
            continue
        _, cls, toks = item
        for kind, sym, bv, nb in toks:
            _bits, _vals, enc = tables[(kind, cls)]
            code, length = enc[sym]
            bw.write(code, length)
            if nb:
                bw.write(bv, nb)
    bw.pad_to_byte()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _JpegBitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.d, self.p, self.acc, self.n = data, pos, 0, 0

    def bit(self) -> int:
        if self.n == 0:
            b = self.d[self.p]
            if b == 0xFF:
                if self.d[self.p + 1] != 0x00:
                    raise ValueError("marker inside entropy-coded segment")
                self.p += 2  # stuffed 0xFF00 -> literal 0xFF
            else:
                self.p += 1
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, t: int) -> int:
        v = 0
        for _ in range(t):
            v = (v << 1) | self.bit()
        return v

    def expect_rst(self, idx: int) -> None:
        self.n = 0  # discard pad bits to the byte boundary
        if self.d[self.p] != 0xFF or self.d[self.p + 1] != 0xD0 + (idx % 8):
            raise ValueError("missing RST marker at restart interval")
        self.p += 2


def _jpeg_huff_decoder(bits: list, vals: list):
    mincode, maxcode, valptr = [0] * 17, [-1] * 17, [0] * 17
    code = k = 0
    for L in range(1, 17):
        valptr[L], mincode[L] = k, code
        code += bits[L - 1]
        k += bits[L - 1]
        maxcode[L] = code - 1 if bits[L - 1] else -1
        code <<= 1

    def decode(br: _JpegBitReader) -> int:
        c = 0
        for L in range(1, 17):
            c = (c << 1) | br.bit()
            if bits[L - 1] and c <= maxcode[L]:
                return vals[valptr[L] + c - mincode[L]]
        raise ValueError("invalid Huffman code")

    return decode


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-JPEG decode -> (h, w, 3) uint8 RGB (grayscale replicated).
    Sequential DCT only; SOF markers other than SOF0 raise."""
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    p = 2
    qts: dict = {}
    huff: dict = {}
    comps: list = []
    h = w = 0
    dri = 0
    scan: list = []
    while True:
        if d[p] != 0xFF:
            raise ValueError(f"expected marker at byte {p}")
        m = d[p + 1]
        p += 2
        if m == 0xD9:  # EOI (only reachable pre-scan; scan loop exits below)
            break
        seglen = int.from_bytes(d[p : p + 2], "big")
        body = d[p + 2 : p + seglen]
        p += seglen
        if m == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                n = 64 * (2 if pq else 1)
                raw = body[i + 1 : i + 1 + n]
                vals = (
                    np.frombuffer(raw, ">u2") if pq else np.frombuffer(raw, np.uint8)
                ).astype(np.float64)
                qts[tq] = vals[_JPEG_UNZZ].reshape(8, 8)
                i += 1 + n
        elif m == 0xC0:  # SOF0 baseline
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = [
                {
                    "id": body[6 + 3 * i],
                    "hi": body[7 + 3 * i] >> 4,
                    "vi": body[7 + 3 * i] & 15,
                    "tq": body[8 + 3 * i],
                }
                for i in range(nc)
            ]
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"SOF{m - 0xC0}: only baseline sequential DCT (SOF0) supported"
            )
        elif m == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(cls, tid)] = _jpeg_huff_decoder(bits, vals)
                i += 17 + n
        elif m == 0xDD:  # DRI
            dri = int.from_bytes(body[:2], "big")
        elif m == 0xDA:  # SOS — entropy-coded data follows
            ns = body[0]
            scan = [
                {"id": body[1 + 2 * i], "td": body[2 + 2 * i] >> 4,
                 "ta": body[2 + 2 * i] & 15}
                for i in range(ns)
            ]
            break
        # APPn / COM / anything else: skipped via seglen

    if not comps or not scan:
        raise ValueError("missing SOF0/SOS")
    byid = {c["id"]: c for c in comps}
    order = [byid[s["id"]] | {"td": s["td"], "ta": s["ta"]} for s in scan]
    hmax = max(c["hi"] for c in comps)
    vmax = max(c["vi"] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * c["vi"] * 8, mcux * c["hi"] * 8), np.float64)
        for c in order
    ]
    br = _JpegBitReader(d, p)
    preds = [0] * len(order)
    rst_i = 0
    for m_i in range(mcuy * mcux):
        if dri and m_i and m_i % dri == 0:
            br.expect_rst(rst_i)
            rst_i += 1
            preds = [0] * len(order)
        my, mx = divmod(m_i, mcux)
        for ci, c in enumerate(order):
            dc_dec, ac_dec = huff[(0, c["td"])], huff[(1, c["ta"])]
            for dv in range(c["vi"]):
                for dh in range(c["hi"]):
                    zz = np.zeros(64, np.float64)
                    t = dc_dec(br)
                    preds[ci] += _jpeg_extend(br.receive(t), t)
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        s = ac_dec(br)
                        r, size = s >> 4, s & 15
                        if size == 0:
                            if s == 0xF0:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        zz[k] = _jpeg_extend(br.receive(size), size)
                        k += 1
                    block = (zz * qts[c["tq"]].reshape(64)[_JPEG_ZZ])[_JPEG_UNZZ].reshape(8, 8)
                    pix = _JPEG_DCT.T @ block @ _JPEG_DCT + 128.0
                    y0, x0 = (my * c["vi"] + dv) * 8, (mx * c["hi"] + dh) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
    up = []
    for c, pl in zip(order, planes):
        ry, rx = vmax // c["vi"], hmax // c["hi"]
        if ry > 1 or rx > 1:
            pl = np.repeat(np.repeat(pl, ry, axis=0), rx, axis=1)
        up.append(pl[:h, :w])
    if len(up) == 1:
        g = np.clip(np.round(up[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = up
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


_REAL_IMAGE_FORMATS = {
    "ppm": decode_ppm,
    "bmp": decode_bmp,
    "png": decode_png,
    "jpeg": decode_jpeg,
}


# --- MP4 (ISO/IEC 14496-12 BMFF container, Motion-JPEG samples) -----------
# The last formerly-stubbed format. A real box-structured MP4 whose video
# track carries per-frame baseline-JPEG samples ('jpeg' VisualSampleEntry,
# the classic Motion-JPEG layout) decodes with the pure-NumPy JPEG codec
# above plus a container walk: moov/trak/mdia/minf/stbl, sample sizes from
# stsz, chunk offsets from stco/co64, sample->chunk mapping from stsc.
# H.264/HEVC payloads still honestly raise — those need external codecs.

def _box(btype: bytes, payload: bytes) -> bytes:
    return (len(payload) + 8).to_bytes(4, "big") + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big") + payload)


_MP4_UNITY_MATRIX = (
    (0x10000).to_bytes(4, "big") + bytes(4) * 2
    + bytes(4) + (0x10000).to_bytes(4, "big") + bytes(4)
    + bytes(4) * 2 + (0x40000000).to_bytes(4, "big")
)


def encode_mjpeg_mp4(
    frames: np.ndarray, fps: int = 25, quant: "int | np.ndarray" = 1
) -> bytes:
    """(n, h, w, 3) uint8 RGB frames -> Motion-JPEG MP4 (one video track,
    one sample per frame, single chunk). Timescale 1000, constant frame
    duration."""
    n, h, w, _ = frames.shape
    samples = [encode_jpeg(f, quant=quant) for f in frames]
    sizes = [len(s) for s in samples]
    ftyp = _box(b"ftyp", b"isom" + (0x200).to_bytes(4, "big") + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(samples))
    first_sample_off = len(ftyp) + 8  # mdat payload start in the file
    dur = n * 1000 // fps

    name = b"minigraph mjpeg"
    stsd_entry = (
        (86 + 0).to_bytes(4, "big") + b"jpeg" + bytes(6) + (1).to_bytes(2, "big")
        + bytes(16)
        + w.to_bytes(2, "big") + h.to_bytes(2, "big")
        + (0x00480000).to_bytes(4, "big") * 2 + bytes(4) + (1).to_bytes(2, "big")
        + bytes([len(name)]) + name + bytes(31 - len(name))
        + (24).to_bytes(2, "big") + (0xFFFF).to_bytes(2, "big")
    )
    stbl = (
        _full(b"stsd", 0, 0, (1).to_bytes(4, "big") + stsd_entry)
        + _full(b"stts", 0, 0, (1).to_bytes(4, "big")
                + n.to_bytes(4, "big") + (1000 // fps).to_bytes(4, "big"))
        + _full(b"stsc", 0, 0, (1).to_bytes(4, "big")
                + (1).to_bytes(4, "big") + n.to_bytes(4, "big") + (1).to_bytes(4, "big"))
        + _full(b"stsz", 0, 0, bytes(4) + n.to_bytes(4, "big")
                + b"".join(s.to_bytes(4, "big") for s in sizes))
        + _full(b"stco", 0, 0, (1).to_bytes(4, "big")
                + first_sample_off.to_bytes(4, "big"))
    )
    minf = (
        _full(b"vmhd", 0, 1, bytes(8))
        + _box(b"dinf", _full(b"dref", 0, 0, (1).to_bytes(4, "big")
                              + _full(b"url ", 0, 1, b"")))
        + _box(b"stbl", stbl)
    )
    mdia = (
        _full(b"mdhd", 0, 0, bytes(8) + (1000).to_bytes(4, "big")
              + dur.to_bytes(4, "big") + (0x55C4).to_bytes(2, "big") + bytes(2))
        + _full(b"hdlr", 0, 0, bytes(4) + b"vide" + bytes(12) + b"VideoHandler\x00")
        + _box(b"minf", minf)
    )
    tkhd = (
        bytes(8) + (1).to_bytes(4, "big") + bytes(4) + dur.to_bytes(4, "big")
        + bytes(8) + bytes(2) * 2 + bytes(2) + bytes(2)
        + _MP4_UNITY_MATRIX
        + (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big")
    )
    mvhd = (
        bytes(8) + (1000).to_bytes(4, "big") + dur.to_bytes(4, "big")
        + (0x00010000).to_bytes(4, "big") + (0x0100).to_bytes(2, "big") + bytes(10)
        + _MP4_UNITY_MATRIX + bytes(24) + (2).to_bytes(4, "big")
    )
    moov = _box(
        b"moov",
        _full(b"mvhd", 0, 0, mvhd)
        + _box(b"trak", _full(b"tkhd", 0, 7, tkhd) + _box(b"mdia", mdia)),
    )
    return ftyp + mdat + moov


def _mp4_boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the boxes in [start, end)."""
    p = start
    while p + 8 <= end:
        size = int.from_bytes(data[p : p + 4], "big")
        btype = data[p + 4 : p + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            size = int.from_bytes(data[p + 8 : p + 16], "big")
            hdr = 16
        elif size == 0:  # to end of enclosing box
            size = end - p
        yield btype, p + hdr, p + size
        p += size


def _mp4_find(data: bytes, start: int, end: int, path: list):
    """Descend a box path (e.g. [b'moov', b'trak', ...]); returns (s, e) of
    the FIRST match or None."""
    if not path:
        return start, end
    for btype, s, e in _mp4_boxes(data, start, end):
        if btype == path[0]:
            got = _mp4_find(data, s, e, path[1:])
            if got is not None:
                return got
    return None


def decode_mjpeg_mp4(payload: bytes) -> np.ndarray:
    """Motion-JPEG MP4 -> (n, h, w, 3) uint8 RGB frames. Walks the BMFF
    sample tables (stsz/stco|co64/stsc) of the first video track and
    decodes each 'jpeg' sample with decode_jpeg; other codecs raise."""
    d = payload
    trak = None
    moov = _mp4_find(d, 0, len(d), [b"moov"])
    if moov is None:
        raise ValueError("not an MP4 (no moov box)")
    for btype, s, e in _mp4_boxes(d, *moov):
        if btype != b"trak":
            continue
        hd = _mp4_find(d, s, e, [b"mdia", b"hdlr"])
        if hd and d[hd[0] + 8 : hd[0] + 12] == b"vide":
            trak = (s, e)
            break
    if trak is None:
        raise ValueError("MP4 has no video track")
    stbl = _mp4_find(d, *trak, [b"mdia", b"minf", b"stbl"])
    if stbl is None:
        raise ValueError("video track missing stbl")
    boxes = {btype: (s, e) for btype, s, e in _mp4_boxes(d, *stbl)}

    s, _e = boxes[b"stsd"]
    fourcc = d[s + 12 : s + 16]
    if fourcc not in (b"jpeg", b"mjpa"):
        raise NotImplementedError(
            f"MP4 sample format {fourcc!r} needs external codecs; only "
            "Motion-JPEG ('jpeg'/'mjpa') decodes natively"
        )

    s, _e = boxes[b"stsz"]
    uniform = int.from_bytes(d[s + 4 : s + 8], "big")
    n = int.from_bytes(d[s + 8 : s + 12], "big")
    sizes = (
        [uniform] * n
        if uniform
        else [int.from_bytes(d[s + 12 + 4 * i : s + 16 + 4 * i], "big") for i in range(n)]
    )

    key = b"stco" if b"stco" in boxes else b"co64"
    s, _e = boxes[key]
    nch = int.from_bytes(d[s + 4 : s + 8], "big")
    width_b = 4 if key == b"stco" else 8
    chunk_offs = [
        int.from_bytes(d[s + 8 + width_b * i : s + 8 + width_b * (i + 1)], "big")
        for i in range(nch)
    ]

    s, _e = boxes[b"stsc"]
    nent = int.from_bytes(d[s + 4 : s + 8], "big")
    stsc = [
        (
            int.from_bytes(d[s + 8 + 12 * i : s + 12 + 12 * i], "big"),
            int.from_bytes(d[s + 12 + 12 * i : s + 16 + 12 * i], "big"),
        )
        for i in range(nent)
    ]

    frames = []
    si = 0
    for ci in range(1, nch + 1):
        spc = 0
        for first, cnt in stsc:
            if first <= ci:
                spc = cnt
        off = chunk_offs[ci - 1]
        for _ in range(spc):
            if si >= n:
                break
            frames.append(decode_jpeg(d[off : off + sizes[si]]))
            off += sizes[si]
            si += 1
    if si != n:
        raise ValueError(f"sample walk found {si} of {n} samples")
    return np.stack(frames)


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


def real_video_rows(n: int, seed: int = 42) -> list:
    """Deterministic video rows with REAL Y4M payloads — pure NumPy, shared
    by make_real_video and the driver's VALUES oracles. Cycles the three
    chroma layouts (C444/C422/C420jpeg) so the decoder's upsampling paths
    are all oracle-covered; frame counts and dimensions vary per row."""
    rng = np.random.default_rng(seed)
    colorspaces = ["C444", "C422", "C420jpeg"]
    rows = []
    for i in range(n):
        nf = 3 + (i % 5)
        h, w = 8 + (i % 3) * 4, 8 + (i % 4) * 4
        frames = rng.integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
        cs = colorspaces[i % len(colorspaces)]
        payload = encode_y4m(frames, fps=(25, 1), colorspace=cs)
        rows.append(
            (i, bytearray(payload), ("video", "y4m", w, h, nf, None, nf * 40))
        )
    return rows


def real_mp4_rows(n: int, seed: int = 42) -> list:
    """Deterministic video rows with REAL Motion-JPEG MP4 payloads — pure
    NumPy (BMFF mux + per-frame baseline JPEG), shared by make_real_mp4 and
    the driver's VALUES oracle. Frame counts, dims and quant vary per row
    so the sample-table walk and per-frame dequant paths are covered."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        nf = 2 + (i % 4)
        h, w = 16 + (i % 3) * 8, 16 + (i % 2) * 8
        frames = rng.integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
        payload = encode_mjpeg_mp4(frames, fps=25, quant=1 + (i % 2) * 3)
        rows.append(
            (i, bytearray(payload), ("video", "mp4", w, h, nf, None, nf * 40))
        )
    return rows


def make_real_mp4(spark, n: int, seed: int = 42) -> DataFrame:
    """Video table whose payloads are REAL Motion-JPEG MP4 encodings."""
    return spark.createDataFrame(real_mp4_rows(n, seed), schema=MEDIA_SCHEMA)


def make_real_video(spark, n: int, seed: int = 42) -> DataFrame:
    """Video table whose payloads are REAL Y4M streams."""
    return spark.createDataFrame(real_video_rows(n, seed), schema=MEDIA_SCHEMA)


def real_png_rows(n: int, seed: int = 42) -> list:
    """Deterministic media rows with REAL PNG payloads — pure stdlib zlib +
    NumPy, shared by make_real_png and the driver's VALUES oracle. Cycles
    the four supported color types (RGB / gray / palette / RGBA) and splits
    every other payload across 2 IDAT chunks, so the decoder's channel
    expansion, PLTE lookup, alpha drop and multi-IDAT paths are all
    oracle-covered; per-row filters cycle y % 5 (every unfilter path)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        h, w = 12 + (i % 3) * 6, 10 + (i % 4) * 7
        variant = i % 4
        split = 2 if i % 2 else 1
        if variant == 0:  # RGB, color type 2
            arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload = _png_assemble(arr.reshape(h, w * 3), w, h, 2, 3,
                                    idat_split=split)
        elif variant == 1:  # grayscale, color type 0
            g = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
            payload = _png_assemble(g.reshape(h, w), w, h, 0, 1,
                                    idat_split=split)
        elif variant == 2:  # palette, color type 3
            plte = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
            idx = rng.integers(0, 16, size=(h, w), dtype=np.uint8)
            payload = _png_assemble(idx.reshape(h, w), w, h, 3, 1,
                                    plte=plte, idat_split=split)
        else:  # RGBA, color type 6 (alpha dropped on decode)
            arr = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
            payload = _png_assemble(arr.reshape(h, w * 4), w, h, 6, 4,
                                    idat_split=split)
        rows.append(
            (i, bytearray(payload), ("image", "png", w, h, None, None, None))
        )
    return rows


def make_real_png(spark, n: int, seed: int = 42) -> DataFrame:
    """Image table whose payloads are REAL PNG encodings."""
    return spark.createDataFrame(real_png_rows(n, seed), schema=MEDIA_SCHEMA)


def real_jpeg_rows(n: int, seed: int = 42) -> list:
    """Deterministic media rows with REAL baseline-JPEG payloads — pure
    NumPy encoder above, shared by make_real_jpeg and the driver's VALUES
    oracle. Cycles RGB 4:4:4 / grayscale / RGB 4:2:0 / RGB 4:4:4 with a
    coarser quant table + restart markers, so the decoder's sampling
    grids, DC-prediction resets, dequant and color paths are all
    oracle-covered."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        h, w = 14 + (i % 3) * 7, 12 + (i % 4) * 6
        variant = i % 4
        if variant == 0:
            arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload = encode_jpeg(arr, quant=1)
        elif variant == 1:
            arr = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
            payload = encode_jpeg(arr, quant=1)
        elif variant == 2:
            yy, xx = np.mgrid[0:h, 0:w]
            arr = np.stack(
                [(yy * 3 + xx * 2) % 256, (yy * 5 + i) % 256, (xx * 7) % 256],
                axis=2,
            ).astype(np.uint8)
            payload = encode_jpeg(arr, quant=1, sampling="420")
        else:
            arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload = encode_jpeg(arr, quant=4, restart_interval=3)
        rows.append(
            (i, bytearray(payload), ("image", "jpeg", w, h, None, None, None))
        )
    return rows


def make_real_jpeg(spark, n: int, seed: int = 42) -> DataFrame:
    """Image table whose payloads are REAL baseline-JPEG encodings."""
    return spark.createDataFrame(real_jpeg_rows(n, seed), schema=MEDIA_SCHEMA)


def _resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w, _ = img.shape
    ys = np.arange(out_h) * h // out_h
    xs = np.arange(out_w) * w // out_w
    return img[ys][:, xs]


def decode_image(df: DataFrame, out_h: int = 32, out_w: int = 32, fake: bool = False) -> DataFrame:
    """payload -> decoded pixel tensor via mapInPandas, nearest-resized to
    (out_h, out_w). fake=False REALLY decodes PPM, BMP, PNG and
    baseline-JPEG payloads (pure NumPy + stdlib-zlib codecs above); exotic
    formats need PIL/cv2 (not in this container) and raise inside the task. fake=True uses the
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
                        f"decoding {fmt!r} requires an external codec (not in "
                        "this container); ppm/bmp/png/jpeg decode natively"
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
    """Video frame sampling.

    fake=False (default): REALLY decodes Y4M payloads (YCbCr tensors) and
    Motion-JPEG MP4 payloads (RGB tensors) with the pure-NumPy container
    parsers above, one row per sampled frame: (media_id, frame_idx,
    height, width, pixels array<int>). H.264/HEVC MP4s raise inside the
    task — those need external codecs. The payload is touched once per
    video and only
    fixed-size frame rows leave the partition (mapInPandas, no shuffle).

    fake=True: metadata-only face — one (media_id, frame_idx) row per
    sampled index computed from meta.n_frames, no bytes read (the cheap
    planning pass a 100 TB pipeline runs before paying for decode)."""
    if fake:
        vids = df.filter(F.col("meta.media_type") == "video").select(
            "media_id", F.col("meta.n_frames").alias("n_frames")
        )
        return vids.select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids, idxs, hs, ws, pix = [], [], [], [], []
            for mid, p, fmt in zip(pdf["media_id"], pdf["payload"], pdf["format"]):
                if fmt == "y4m":
                    frames = decode_y4m(bytes(p))  # YCbCr planes
                elif fmt == "mp4":
                    frames = decode_mjpeg_mp4(bytes(p))  # RGB frames
                else:
                    raise NotImplementedError(
                        f"decoding {fmt!r} video requires external codecs "
                        "(not in this container); y4m and Motion-JPEG mp4 "
                        "decode natively"
                    )
                for fi in range(0, frames.shape[0], every_n):
                    mids.append(mid)
                    idxs.append(fi)
                    hs.append(frames.shape[1])
                    ws.append(frames.shape[2])
                    pix.append(frames[fi].ravel().astype(np.int32))
            yield pd.DataFrame(
                {
                    "media_id": np.asarray(mids, dtype=np.int64),
                    "frame_idx": np.asarray(idxs, dtype=np.int32),
                    "height": np.asarray(hs, dtype=np.int32),
                    "width": np.asarray(ws, dtype=np.int32),
                    "pixels": pix,
                }
            )

    vids = df.filter(F.col("meta.media_type") == "video").select(
        "media_id", "payload", F.col("meta.format").alias("format")
    )
    return vids.mapInPandas(
        batches,
        schema="media_id long, frame_idx int, height int, width int, pixels array<int>",
    )


def frame_pixel_digest(frames: DataFrame) -> DataFrame:
    """(media_id, frame_idx, height, width, px_sum, px_md5) from
    frame_sample(fake=False) output — JVM-side digest, same canonical
    comma-joined-string convention as image_pixel_digest."""
    joined = F.concat_ws(",", F.transform(F.col("pixels"), lambda x: x.cast("string")))
    return frames.select(
        "media_id",
        "frame_idx",
        "height",
        "width",
        F.aggregate("pixels", F.lit(0).cast("long"), lambda a, x: a + x).alias("px_sum"),
        F.md5(joined.cast("binary")).alias("px_md5"),
    )


def video_digest(frames: DataFrame) -> DataFrame:
    """Per-video digest over per-frame digests: (media_id, n_frames, height,
    width, px_sum, video_md5) where video_md5 = md5 of the frame md5s
    concatenated in frame order. Entirely JVM-side: the per-frame rows
    collapse to one small row per video, so the digest — not pixels — is
    what any downstream shuffle moves."""
    per_frame = frame_pixel_digest(frames)
    ordered = F.array_sort(F.collect_list(F.struct("frame_idx", "px_md5")))
    return per_frame.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_frames"),
        F.first("height").alias("height"),
        F.first("width").alias("width"),
        F.sum("px_sum").alias("px_sum"),
        F.md5(
            F.concat_ws(",", F.transform(ordered, lambda s: s["px_md5"])).cast("binary")
        ).alias("video_md5"),
    )


def resize_image(df: DataFrame, out_h: int, out_w: int, fake: bool = False) -> DataFrame:
    """Decode + nearest-neighbor resize: decode to a canonical 64x64, then
    resample to (out_h, out_w). fake=False REALLY decodes PPM/BMP rows
    (non-image and compressed-format rows are filtered out up front so a
    mixed media table resizes its decodable images instead of raising);
    fake=True runs the fixture decoder on every row."""
    if not fake:
        df = df.filter(
            F.col("meta.format").isin(*sorted(_REAL_IMAGE_FORMATS))
        )
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
