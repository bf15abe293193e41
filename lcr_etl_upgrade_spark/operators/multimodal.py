"""L5 multimodal-column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video payloads are ``binary`` columns with a metadata
struct (media_type, width/height or sample_rate/duration, byte length).
Spark-side plumbing — schema, binaryFile source, partition sizing,
mapInPandas batch shape — is real and tested; the actual codec step is
STUBBED (decode libraries aren't in this container): ``decode_stub='fake'``
produces a deterministic feature vector from the bytes so downstream
operators (dedup, similarity) are exercisable end-to-end, and
``decode_stub='raise'`` marks the production seam with NotImplementedError.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """L5 source: spark.read.format('binaryFile') — one row per file with
    path/length/content; the public Spark pattern for raw media ingestion."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def _fake_features(payload: bytes | None) -> list[float] | None:
    """Deterministic stand-in for a codec+model feature extractor: sha256
    bytes -> FEATURE_DIM floats in [0, 1). Lets partitioning/UDF/batch
    shape be tested end-to-end without image/audio libs."""
    if payload is None:
        return None
    digest = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65536.0
        for i in range(FEATURE_DIM)
    ]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decode_stub: str = "fake",
) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches; the payload
    never round-trips through the driver).

    decode_stub='fake'  -> deterministic hash features (testable plumbing)
    decode_stub='raise' -> NotImplementedError at the codec seam (the
                           production implementation would call the real
                           decoder here, per batch, vectorized)
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media decode requires codec libraries not present in "
                    "this environment; plug the real decoder in here"
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": pdf[payload_col].map(_fake_features),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def resize_stub(
    df: DataFrame, width: int, height: int, payload_col: str = "payload"
) -> DataFrame:
    """Resize seam: passes metadata through with the new dimensions; the
    payload transform is the stubbed codec step."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        ),
    )


def frame_sample_stub(
    df: DataFrame, every_n: int, id_col: str = "media_id"
) -> DataFrame:
    """Frame-sampling seam for video payloads: emits (media_id, frame_idx)
    rows for every_n-th frame index derived from metadata; the frame
    payload decode is the stubbed step."""
    n_frames = F.greatest(
        (F.col("meta.n_bytes") / F.lit(1024)).cast("int"), F.lit(1)
    )
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias(
            "frame_idx"
        ),
    )
