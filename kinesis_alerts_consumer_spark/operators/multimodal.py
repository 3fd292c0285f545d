"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed in Arrow batches.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub (deterministic fake keyed on the bytes' md5 —
swap ``_fake_decode`` for PIL/ffmpeg in production). Everything
Spark-side is real and tested: the media struct schema, Arrow-batched
``mapInPandas`` plumbing, batch shapes, partition sizing, and the
feature-table contract downstream operators consume.

Scale notes: binary payloads dominate row width, so
- feature extraction projects AWAY the payload as early as possible
  (the returned frame carries features + metadata only);
- ``repartition`` before the decode keeps Arrow batches balanced when
  payload sizes are skewed;
- decode parallelism is per-partition Python workers with Arrow
  transfer — the canonical Spark pattern for opaque-binary UDF work.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# One media item: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("feat_mean", DoubleType()),
        StructField("feat_std", DoubleType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[float, float]:
    """STUB decode: deterministic pseudo-features from the payload
    bytes (md5-seeded). Replace with a real codec (PIL, torchaudio,
    pyav) where available — only this function changes; the Spark
    plumbing (schema, batching, partitioning) stays identical."""
    digest = hashlib.md5(payload).digest()
    mean = int.from_bytes(digest[:4], "big") / 2**32
    std = int.from_bytes(digest[4:8], "big") / 2**32
    return mean, std


def extract_features(media: DataFrame, target_partitions: int | None = None) -> DataFrame:
    """Binary media -> per-item feature rows via Arrow-batched
    ``mapInPandas``. Projects the payload away in the output."""
    if target_partitions:
        media = media.repartition(target_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(bytes(p)) if p is not None else (None, None)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0
                                for p in pdf["payload"]],
                    "checksum": [
                        hashlib.md5(bytes(p)).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feat_mean": [f[0] for f in feats],
                    "feat_std": [f[1] for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame offset.
    The offsets are real column logic (sequence over duration); the
    frame DECODE is the stubbed step downstream."""
    return media.filter(F.col("mime").startswith("video/")).select(
        "media_id",
        "mime",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_offset_ms"),
    )


def resize_plan(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Image resize planning as pure column math (aspect-preserving
    target dims); the pixel work is the stubbed decode step."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side)
        / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return media.filter(F.col("mime").startswith("image/")).select(
        "media_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )
