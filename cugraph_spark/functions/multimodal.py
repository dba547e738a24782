"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns
with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over
``mapInPandas``. The media codec libraries (Pillow, ffmpeg, librosa)
are not in this container, so the *decode kernel itself* is stubbed —
``decode=strict`` raises ``NotImplementedError``, ``decode=fake``
substitutes a deterministic bytes→feature hash — while all the
Spark-side plumbing (schema, batching, partitioning, UDF signatures,
metadata propagation) is real and tested.

Schema convention::

    media: struct<
        data: binary,            -- opaque encoded payload
        mime: string,            -- image/png, audio/wav, video/mp4 ...
        width: int, height: int, -- images/video (NULL for audio)
        duration_ms: long,       -- audio/video (NULL for images)
        sha256: string           -- payload hash (row invariant)
    >
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "data binary, mime string, width int, height int, duration_ms long, sha256 string"
)


def attach_media(
    df: DataFrame,
    data_col: str,
    mime: str,
    width=None,
    height=None,
    duration_ms=None,
    out_col: str = "media",
) -> DataFrame:
    """Wrap a binary column into the typed media struct, stamping the
    payload sha256 (the materialization invariant)."""
    return df.withColumn(
        out_col,
        F.struct(
            F.col(data_col).alias("data"),
            F.lit(mime).alias("mime"),
            (F.lit(width) if width is None else F.lit(int(width))).cast("int").alias("width"),
            (F.lit(height) if height is None else F.lit(int(height))).cast("int").alias("height"),
            (F.lit(duration_ms) if duration_ms is None else F.lit(int(duration_ms))).cast("long").alias("duration_ms"),
            F.sha2(F.col(data_col), 256).alias("sha256"),
        ),
    )


def _fake_decode(data: bytes, n_features: int) -> np.ndarray:
    """Deterministic bytes → feature vector stand-in for a real decoder:
    sha256-seeded uniform features. Stable across partitions/machines."""
    h = hashlib.sha256(data).digest()
    seed = int.from_bytes(h[:8], "big") % (2**32)
    rng = np.random.RandomState(seed)
    return rng.rand(n_features).astype(np.float32)


def extract_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    n_features: int = 16,
    decode: str = "fake",
) -> DataFrame:
    """[id, features: array<float>] via Arrow-batched mapInPandas.

    ``decode='strict'`` raises NotImplementedError (no codec libs in
    this container); ``decode='fake'`` uses the deterministic stand-in
    so the batching/schema path is fully exercised.
    """
    if decode not in ("fake", "strict"):
        raise ValueError(decode)
    src = df.select(F.col(id_col).alias("id"), F.col(media_col + ".data").alias("data"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "strict":
                raise NotImplementedError(
                    "real media decoding requires codec libraries not present "
                    "in this environment; use decode='fake' for plumbing tests"
                )
            feats = [
                _fake_decode(bytes(d), n_features).tolist() for d in pdf["data"]
            ]
            yield pd.DataFrame({"id": pdf["id"], "features": feats})

    out = src.mapInPandas(run, schema="id long, features array<float>")
    return out.withColumnRenamed("id", id_col)


def resize_images(
    df: DataFrame,
    media_col: str = "media",
    width: int = 224,
    height: int = 224,
    decode: str = "fake",
) -> DataFrame:
    """Resize stub: with decode='fake' the payload passes through
    unchanged and only the declared dimensions update (a real impl
    would re-encode); the metadata/schema path is real."""
    if decode == "strict":
        raise NotImplementedError("image resize requires codec libraries")
    m = media_col
    return df.withColumn(
        m,
        F.struct(
            F.col(f"{m}.data").alias("data"),
            F.col(f"{m}.mime").alias("mime"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col(f"{m}.duration_ms").alias("duration_ms"),
            F.col(f"{m}.sha256").alias("sha256"),
        ),
    )


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    every_ms: int = 1000,
    n_features: int = 8,
    decode: str = "fake",
) -> DataFrame:
    """Frame sampling stub for video: emits one feature row per sampled
    timestamp (duration_ms // every_ms rows, ≥1), features from the
    deterministic fake decoder keyed by (payload, frame index). The
    explode/batch shape matches a real frame sampler."""
    if decode == "strict":
        raise NotImplementedError("video frame sampling requires codec libraries")
    src = df.select(
        F.col(id_col).alias("id"),
        F.col(media_col + ".data").alias("data"),
        F.coalesce(F.col(media_col + ".duration_ms"), F.lit(0)).alias("dur"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, feats = [], [], []
            for i, d, dur in zip(pdf["id"], pdf["data"], pdf["dur"]):
                n = max(int(dur) // every_ms, 1)
                for fidx in range(n):
                    ids.append(i)
                    frames.append(fidx)
                    feats.append(
                        _fake_decode(bytes(d) + fidx.to_bytes(4, "big"), n_features).tolist()
                    )
            yield pd.DataFrame({"id": ids, "frame": frames, "features": feats})

    out = src.mapInPandas(run, schema="id long, frame int, features array<float>")
    return out.withColumnRenamed("id", id_col)
