"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata struct
(modality, format, width/height/duration, …). Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages — the only
place Python touches the data path, and it's vectorized per batch.

The actual codec decode is STUBBED (`decode_stub`) because no image/audio
libraries exist in this container: it derives deterministic fake features
from the bytes so the Spark-side plumbing (schema, batch shape, partitioning)
is real and testable. Swap ``decode_stub`` for a real decoder (PIL/ffmpeg)
in production — the plan shape does not change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("format", StringType()),
        StructField("payload", StringType()),  # binary hex in this stub path
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_digest", StringType()),
        # double (not float) so stubbed features are engine-portable exactly
        StructField("features", ArrayType(DoubleType())),
    ]
)


def decode_stub(payload: bytes, n_features: int = 8) -> list[float]:
    """Deterministic fake decoder: md5 the payload, fold hex pairs into
    [0, 1) floats. Replace with a real codec in production.
    """
    digest = hashlib.md5(payload).hexdigest()
    return [
        int(digest[2 * i : 2 * i + 2], 16) / 255.0 for i in range(n_features)
    ]


def attach_binary_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Build a media table from the documents fixture: payload = utf-8 bytes
    of the text (stands in for image/audio bytes), modality round-robins.
    """
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("modality"),
        F.lit("raw").alias("format"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def extract_features(media: DataFrame, n_features: int = 8) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary payloads.

    mapInPandas processes whole record batches (not rows); partitioning of
    the input is preserved — at scale, repartition upstream by size so each
    task decodes a bounded byte volume.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_digest": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "features": payloads.map(
                        lambda b: decode_stub(bytes(b), n_features)
                    ),
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)
