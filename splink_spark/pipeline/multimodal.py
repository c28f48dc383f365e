"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The decode/feature-extract kernels are STUBBED (image/audio libraries are not
in this container — see the NotImplementedError / deterministic-fake paths,
clearly marked) but the Spark-side plumbing is real and tested: schemas,
Arrow batch shape via ``mapInPandas``, partition-preserving transforms — the
parts that matter for running this over 100 TB of media.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(DoubleType()), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def _decode_image(content: bytes) -> list[float]:
    """STUB: real implementation needs an image library (PIL/cv2), absent in
    this container. Deterministic fake: 4 moments of the byte histogram."""
    if content is None:
        return None
    n = len(content)
    if n == 0:
        return [0.0, 0.0, 0.0, 0.0]
    s = sum(content)
    mean = s / n
    var = sum((b - mean) ** 2 for b in content[:4096]) / min(n, 4096)
    return [float(n), mean, var, float(content[0])]


def extract_features(media: DataFrame) -> DataFrame:
    """Feature-extract each media blob via Arrow-batched ``mapInPandas`` —
    the real 100 TB shape: batch-at-a-time, no row-wise Python dispatch,
    partition-parallel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image(c) if c is not None else None for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB: decode→resize→re-encode needs an image library; fails loudly."""
    raise NotImplementedError(
        "image resize requires an image decode library not present in this "
        "container; the mapInPandas plumbing pattern is extract_features()"
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video: one row per sampled frame. Decode is STUBBED
    (deterministic frame offsets from duration metadata only)."""
    frames = F.sequence(
        F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms)
    )
    return (
        media.where(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(frames).alias("frame_offset_ms"),
        )
    )


def documents_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter for testing: wrap text documents as fake binary media rows."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").cast("binary").alias("content"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("bigint").alias("duration_ms"),
    )
