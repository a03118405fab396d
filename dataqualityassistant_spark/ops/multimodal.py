"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs —
the pages table's ``html`` column is the textual instance of the same
pattern. The Spark-side machinery here is real and tested: schemas,
``mapInPandas`` batch iteration, selective column pruning so payloads never
cross the Arrow boundary unless the stage actually decodes them, and
partition-sized batching.

Decoder tiers for ``decode_images`` (first applicable wins):

1. **PIL** — any format, when the library is importable (not in this
   container);
2. **pure-numpy BMP** — uncompressed 24/32-bit BMP parsed from the public
   file-format spec (header fields + 4-byte-padded bottom-up pixel rows),
   always available, produces REAL pixel-derived dimensions and features;
3. **deterministic fake** (``allow_fake=True`` only) — payload-hash-derived
   dimensions + features, clearly marked so nobody mistakes them for visual
   content. With ``allow_fake=False`` undecodable payloads yield null
   feature rows instead.

Swapping in a richer decoder changes only the inner function — the Spark
plumbing (schema, batching, pruning) is identical.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real decoder, if the environment has it
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes, n_features: int = 16) -> tuple[int, int, list[float]]:
    """DETERMINISTIC FAKE decode: derives (width, height, features) from the
    payload bytes' crc. Stands in for a real image decode in environments
    without imaging libraries; marked fake so nobody mistakes the features
    for visual content."""
    h = zlib.crc32(payload)
    width = 64 + (h & 0x3FF)
    height = 64 + ((h >> 10) & 0x3FF)
    rng = np.random.RandomState(h & 0x7FFFFFFF)
    feats = rng.standard_normal(n_features).astype(np.float32)
    return int(width), int(height), feats.tolist()


def _pil_pixels(payload: bytes) -> "np.ndarray | None":
    """PIL tier shared by decode and resize: full RGB pixel array, or None
    for undecodable payloads."""
    import io as _io

    from PIL import Image

    try:
        img = Image.open(_io.BytesIO(payload)).convert("RGB")
        return np.asarray(img, dtype=np.uint8)
    except Exception:
        return None


def _pil_decode(payload: bytes, n_features: int) -> tuple[int, int, list[float]] | None:
    """Real decode: dimensions from the image header, features = a 4×4
    grayscale thumbnail (n_features=16) normalized to [0,1]. Returns None
    for undecodable payloads."""
    import io as _io

    from PIL import Image

    try:
        img = Image.open(_io.BytesIO(payload))
        w, h = img.size
        side = max(int(n_features ** 0.5), 1)
        thumb = np.asarray(img.convert("L").resize((side, side)), dtype=np.float32) / 255.0
        return int(w), int(h), thumb.reshape(-1)[:n_features].tolist()
    except Exception:
        return None


def _bmp_pixels(payload: bytes) -> "np.ndarray | None":
    """Pure-numpy pixel extraction for uncompressed (BI_RGB) 24/32-bit BMP
    — the one image format parseable from public spec knowledge without an
    imaging library. Layout: 14-byte file header ('BM', file size,
    pixel-data offset) + BITMAPINFOHEADER (width, height signed — positive
    means bottom-up rows — bpp, compression) + pixel rows padded to 4
    bytes, BGR channel order. Returns an ``h×w×3`` RGB uint8 array, or
    None for anything that isn't a well-formed uncompressed BMP."""
    try:
        if len(payload) < 54 or payload[:2] != b"BM":
            return None
        off = int.from_bytes(payload[10:14], "little")
        dib = int.from_bytes(payload[14:18], "little")
        width = int.from_bytes(payload[18:22], "little", signed=True)
        height = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        comp = int.from_bytes(payload[30:34], "little")
        if dib < 40 or comp != 0 or bpp not in (24, 32) or width <= 0 or height == 0:
            return None
        bottom_up = height > 0
        h = abs(height)
        ch = bpp // 8
        stride = ((width * ch + 3) // 4) * 4
        if off < 14 + dib or len(payload) < off + stride * h:
            return None
        raw = np.frombuffer(payload, dtype=np.uint8, offset=off, count=stride * h)
        px = raw.reshape(h, stride)[:, : width * ch].reshape(h, width, ch)
        if bottom_up:
            px = px[::-1]
        return px[:, :, :3][:, :, ::-1]  # BGR -> RGB
    except Exception:
        return None


def _bmp_decode(payload: bytes, n_features: int) -> tuple[int, int, list[float]] | None:
    """Features from :func:`_bmp_pixels`: ``side×side`` block-mean
    grayscale grid (gray = channel mean / 255), normalized to [0,1]."""
    try:
        rgb = _bmp_pixels(payload)
        if rgb is None:
            return None
        h, width = rgb.shape[:2]
        gray = rgb.astype(np.float32).mean(axis=2) / np.float32(255.0)
        side = max(int(n_features ** 0.5), 1)
        ys = np.linspace(0, h, side + 1).astype(int)
        xs = np.linspace(0, width, side + 1).astype(int)
        feats = [float(gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                           xs[j]:max(xs[j + 1], xs[j] + 1)].mean())
                 for i in range(side) for j in range(side)]
        return int(width), int(h), feats[:n_features]
    except Exception:
        return None


def decode_images(df: DataFrame, n_features: int = 16, allow_fake: bool = True) -> DataFrame:
    """media table → (media_id, width, height, features) via mapInPandas.

    Tiered decode per payload: PIL when importable (any format) → pure-numpy
    uncompressed BMP (always available, real pixels) → deterministic fake.
    With ``allow_fake=False`` the fake tier is disabled and undecodable
    payloads come back as null feature rows instead of fabricated ones.

    Column pruning happens HERE, not in Catalyst: the iterator receives only
    (media_id, payload) because we select them explicitly first — a binary
    column that isn't selected is never read from parquet or shipped through
    Arrow."""
    use_pil = _HAS_PIL

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, None, None, None))
                    continue
                raw = bytes(payload)
                decoded = _pil_decode(raw, n_features) if use_pil else None
                if decoded is None:
                    decoded = _bmp_decode(raw, n_features)
                if decoded is None:
                    if not allow_fake:
                        rows.append((mid, None, None, None))  # undecodable, no fake
                        continue
                    decoded = _fake_decode(raw, n_features)
                rows.append((mid, *decoded))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "features"])

    return df.select("media_id", "payload").mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
    ]
)


def _wav_pcm(payload: bytes) -> "tuple[int, int, np.ndarray] | None":
    """Pure-numpy/struct parser for RIFF/WAVE PCM-16 audio — like the BMP
    tier, the one audio format readable from public spec knowledge alone.
    Walks the RIFF chunks ('fmt ' for format, 'data' for samples); returns
    ``(sample_rate, n_channels, samples)`` with samples as float32 in
    [-1, 1] (interleaved frames averaged to mono), or None for anything
    that is not well-formed PCM-16 WAV."""
    try:
        if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos:pos + 4]
            size = int.from_bytes(payload[pos + 4:pos + 8], "little")
            body = payload[pos + 8:pos + 8 + size]
            if len(body) < size:
                return None  # truncated chunk (mid-download cut) — reject,
                # don't report confident stats from partial samples
            if cid == b"fmt " and len(body) >= 16:
                fmt = (
                    int.from_bytes(body[0:2], "little"),    # audio format
                    int.from_bytes(body[2:4], "little"),    # channels
                    int.from_bytes(body[4:8], "little"),    # sample rate
                    int.from_bytes(body[14:16], "little"),  # bits/sample
                )
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            return None
        audio_format, n_ch, rate, bits = fmt
        if audio_format != 1 or bits != 16 or n_ch < 1 or rate <= 0:
            return None
        n = (len(data) // (2 * n_ch)) * n_ch
        if n == 0:
            return None
        pcm = np.frombuffer(data, dtype="<i2", count=n).astype(np.float32) / 32768.0
        mono = pcm.reshape(-1, n_ch).mean(axis=1)
        return rate, n_ch, mono
    except Exception:
        return None


def decode_audio(df: DataFrame, allow_fake: bool = True) -> DataFrame:
    """media table → per-clip audio stats via mapInPandas: sample rate,
    channels, duration, RMS level, zero-crossing rate (the cheap
    speech-vs-noise signals). Tiers mirror :func:`decode_images`:
    pure-numpy PCM-16 WAV (real samples) → deterministic fake
    (``allow_fake=True`` only; NULL row otherwise)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, None, None, None, None, None))
                    continue
                raw = bytes(payload)
                parsed = _wav_pcm(raw)
                if parsed is None:
                    if not allow_fake:
                        rows.append((mid, None, None, None, None, None))
                        continue
                    h = zlib.crc32(raw)
                    rng = np.random.RandomState(h & 0x7FFFFFFF)
                    rows.append((mid, 16000, 1, float(len(raw)) / 32000.0,
                                 float(rng.uniform(0.05, 0.5)),
                                 float(rng.uniform(0.01, 0.3))))
                    continue
                rate, n_ch, mono = parsed
                rms = float(np.sqrt(np.mean(mono * mono)))
                zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if len(mono) > 1 else 0.0
                rows.append((mid, int(rate), int(n_ch),
                             float(len(mono)) / float(rate), rms, zcr))
            yield pd.DataFrame(rows, columns=[
                "media_id", "sample_rate", "n_channels", "duration_sec",
                "rms", "zero_crossing_rate"])

    return df.select("media_id", "payload").mapInPandas(batches, schema=AUDIO_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("thumbnail", T.BinaryType()),  # raw RGB, out_h*out_w*3
    ]
)


def _nn_resize(rgb: "np.ndarray", out_w: int, out_h: int) -> "np.ndarray":
    """Nearest-neighbor resize, pure numpy fancy-indexing (the resample
    every training pipeline starts with; swap for area/bilinear when an
    imaging library is present)."""
    h, w = rgb.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return rgb[ys][:, xs]


def resize_images(
    df: DataFrame, out_w: int = 32, out_h: int = 32, allow_fake: bool = True
) -> DataFrame:
    """media table → fixed-size raw-RGB thumbnails (``out_h×out_w×3``
    bytes) via mapInPandas — the resize stage of an image-training
    pipeline, emitting a uniform tensor-ready column.

    Pixel source tiers mirror :func:`decode_images`: PIL (any format) →
    pure-numpy BMP (real pixels, always available) → deterministic fake
    bytes (``allow_fake=True`` only; NULL thumbnail otherwise)."""
    use_pil = _HAS_PIL
    n_out = out_h * out_w * 3

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, None, None, None))
                    continue
                raw = bytes(payload)
                rgb = _pil_pixels(raw) if use_pil else None
                if rgb is None:
                    rgb = _bmp_pixels(raw)
                if rgb is None:
                    if not allow_fake:
                        rows.append((mid, None, None, None))
                        continue
                    w, h, _ = _fake_decode(raw, 1)
                    rng = np.random.RandomState(zlib.crc32(raw) & 0x7FFFFFFF)
                    thumb = rng.randint(0, 256, n_out, dtype=np.int64).astype(np.uint8)
                    rows.append((mid, w, h, bytearray(thumb.tobytes())))
                    continue
                h, w = rgb.shape[:2]
                thumb = np.ascontiguousarray(_nn_resize(rgb, out_w, out_h), dtype=np.uint8)
                rows.append((mid, int(w), int(h), bytearray(thumb.tobytes())))
            yield pd.DataFrame(
                rows, columns=["media_id", "src_width", "src_height", "thumbnail"])

    return df.select("media_id", "payload").mapInPandas(batches, schema=RESIZED_SCHEMA)


def sample_video_frames(df: DataFrame, every_n_bytes: int = 4096) -> DataFrame:
    """Frame-sampling stub: emits one row per sampled 'frame' offset
    (payload-length derived — a real implementation would demux). Shows the
    one-to-many mapInPandas shape (explode-like output)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("offset", T.LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, n in zip(pdf["media_id"], pdf["n_bytes"]):
                if n is None:
                    continue
                for i, off in enumerate(range(0, int(n), every_n_bytes)):
                    rows.append((mid, i, off))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "offset"])

    return df.select("media_id", "n_bytes").mapInPandas(batches, schema=schema)


def synthetic_media_df(spark, n_rows: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media fixture (binary payloads from a seeded RNG)."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n_rows):
        n = int(rng.randint(256, 8192))
        payload = rng.bytes(n)
        rows.append((i, kinds[i % 3], bytearray(payload), "application/octet-stream", n))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
