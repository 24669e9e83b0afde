"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema conventions, Arrow-batched decode
UDFs, partition sizing, frame sampling — is real and tested; the actual
codec step is STUBBED (image/audio libraries are not in this container):
`decode_image` uses PIL if importable, else a clearly-marked
deterministic fake derived from the bytes, and raises
NotImplementedError only in `strict` mode.

Schema conventions:
    media struct: content binary, meta struct<format string, width int,
    height int, n_frames int, sample_rate int, duration_ms long>
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - PIL not in this image
    from PIL import Image  # noqa: F401
    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

MEDIA_META = T.StructType([
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])


def attach_media_meta(df: DataFrame, content_col: str, fmt: str) -> DataFrame:
    """Wrap a raw binary column into the media convention."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def _fake_decode(content: bytes, out_dim: int) -> np.ndarray:
    """Deterministic stand-in for a codec: features from the content
    digest.  STUB — replace with PIL/librosa decode in a full image."""
    h = hashlib.sha256(content or b"").digest()
    raw = np.frombuffer((h * (out_dim * 4 // len(h) + 1))[: out_dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def image_features(df: DataFrame, content_col: str = "content", out_dim: int = 16,
                   strict: bool = False) -> DataFrame:
    """Decode + feature-extract images into array<float>.

    Arrow-batched mapInPandas; each batch decodes vectorized.  With PIL
    present this resizes to 8x8 grayscale and flattens; otherwise the
    deterministic fake keeps the plumbing testable.
    """
    if strict and not _HAS_PIL:
        raise NotImplementedError("image decode requires PIL; not in this container")
    fields = list(df.schema.fields) + [T.StructField("features", T.ArrayType(T.FloatType()))]

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for content in pdf[content_col]:
                b = bytes(content) if content is not None else b""
                feats.append([float(x) for x in _fake_decode(b, out_dim)])
            out = pdf.copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(fn, schema=T.StructType(fields))


def frame_sample(df: DataFrame, content_col: str = "content", every_n: int = 10,
                 max_frames: int = 8) -> DataFrame:
    """Video frame sampling plumbing: emits one row per sampled frame
    (frame_idx, frame_content).  Codec STUBBED: frames are deterministic
    byte slices standing in for decoded frames.
    """
    fields = list(df.schema.fields) + [
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_content", T.BinaryType()),
    ]

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            contents = [bytes(c) if c is not None else b""
                        for c in pdf[content_col]]
            n_frames = np.minimum(
                np.maximum([len(c) // max(every_n, 1) for c in contents], 1),
                max_frames)
            # vectorized row replication: one repeat + per-frame slices
            idx = np.repeat(np.arange(len(pdf)), n_frames)
            out = pdf.iloc[idx].reset_index(drop=True)
            frame_idx = np.concatenate([np.arange(n) for n in n_frames])
            out["frame_idx"] = frame_idx.astype(np.int32)
            out["frame_content"] = [
                contents[i][fi * every_n:(fi + 1) * every_n]
                for i, fi in zip(idx, frame_idx)
            ]
            yield out

    return df.mapInPandas(fn, schema=T.StructType(fields))


def audio_features(df: DataFrame, content_col: str = "content", out_dim: int = 8,
                   strict: bool = False) -> DataFrame:
    """Audio feature extraction plumbing (decode STUBBED like images)."""
    if strict:
        raise NotImplementedError("audio decode requires librosa/soundfile; not in this container")
    return image_features(df, content_col, out_dim)
