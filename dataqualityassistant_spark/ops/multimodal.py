"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs —
the pages table's ``html`` column is the textual instance of the same
pattern. The Spark-side machinery here is real and tested: schemas,
``mapInPandas`` batch iteration, selective column pruning so payloads never
cross the Arrow boundary unless the stage actually decodes them, and
partition-sized batching.

The *decoders* are stubs: the image/audio libraries are not in this
container, so ``decode_images`` uses a clearly-marked deterministic fake
(payload-hash-derived dimensions + features) unless PIL is importable, and
raises ``NotImplementedError`` when asked for a real decode without it.
Swapping in a real decoder changes only the inner function — the Spark
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


def decode_images(df: DataFrame, n_features: int = 16, allow_fake: bool = True) -> DataFrame:
    """media table → (media_id, width, height, features) via mapInPandas.

    Uses a real PIL decode when the library is importable; otherwise the
    clearly-marked deterministic fake (this container has no imaging libs),
    unless ``allow_fake=False`` in which case it refuses rather than return
    fabricated features.

    Column pruning happens HERE, not in Catalyst: the iterator receives only
    (media_id, payload) because we select them explicitly first — a binary
    column that isn't selected is never read from parquet or shipped through
    Arrow."""
    if not _HAS_PIL and not allow_fake:
        raise NotImplementedError(
            "real image decode requires an imaging library (PIL) not present "
            "in this environment; pass allow_fake=True for the deterministic stub"
        )
    use_pil = _HAS_PIL

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, None, None, None))
                    continue
                decoded = _pil_decode(bytes(payload), n_features) if use_pil else None
                if decoded is None:
                    if use_pil and not allow_fake:
                        rows.append((mid, None, None, None))  # undecodable, no fake
                        continue
                    decoded = _fake_decode(bytes(payload), n_features)
                rows.append((mid, *decoded))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "features"])

    return df.select("media_id", "payload").mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


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
