"""Multimodal column plumbing (build brief): image/audio/video as opaque
``binary`` columns with typed metadata.

The container has no image/audio libraries, so the DECODE kernels are
deterministic fakes / explicit NotImplementedError stubs — but the
Spark-side contract (schemas, Arrow batch shape, mapInPandas signatures,
partitioning) is real and tested.  Swapping in PIL/librosa is a
one-function change inside the UDF.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),       # image | audio | video
    StructField("payload", BinaryType(), True),     # opaque bytes
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

FEATURES = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("feature", ArrayType(FloatType()), False),
])


def fake_feature(payload: bytes, dim: int = 8) -> list:
    """Deterministic stand-in for an image/audio encoder: md5 bytes of
    the payload, scaled to [0,1).  Same input -> same feature, any
    partitioning."""
    h = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """binary payload -> feature vector via Arrow-batched mapInPandas.

    Batch shape is the production contract: the UDF sees a pandas frame
    of (media_id, kind, payload) and returns (media_id, kind, feature).
    A real encoder (GPU or CPU) replaces `fake_feature` only.
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": [fake_feature(p, dim) for p in pdf["payload"]],
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, schema=FEATURES)


def decode_image(payload: bytes):  # pragma: no cover - explicit stub
    """Real image decode (PIL) — unavailable in this container."""
    raise NotImplementedError(
        "image decode needs PIL/opencv; wire it into extract_features' "
        "batch loop — the Spark plumbing (schema/batching) is already real")


def sample_video_frames(payload: bytes, every_ms: int = 1000):  # pragma: no cover
    """Real frame sampling (ffmpeg) — unavailable in this container."""
    raise NotImplementedError("frame sampling needs ffmpeg/av")
