"""L5 multimodal queries — the Spark-side plumbing under oracle check.

The codec step is a documented stub (no image/audio libs in this
container), but everything AROUND it is real and now hash-verified:
binary payload columns, the mapInPandas Arrow batch path, the metadata
struct, and frame-index sampling. The deterministic fake extractor
(sha256 -> 16 fixed-point features, operators/multimodal.py:_fake_features)
is restated in DuckDB SQL, so the whole pipeline — bytes in, features
out — hash-matches an independent engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.plans.registry import query
from lcr_etl_upgrade_spark.sources.testdata import load_table


@query(
    "multimodal_feature_extract",
    oracle="""
    SELECT doc_id, i AS feature_idx,
           ROUND(CAST(('0x' || substr(sha256(text), 4*i + 1, 4)) AS INT)
                 / 65536.0, 6) AS feature_r
    FROM documents, range(0, 16) t(i)
    WHERE doc_id < 200
    ORDER BY doc_id, feature_idx
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> mapInPandas feature extraction (fake codec),
    features exploded to scalar rows so DuckDB can verify every value:
    feature i = int16 big-endian of sha256(payload)[2i:2i+2] / 65536."""
    from lcr_etl_upgrade_spark.operators.multimodal import extract_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    frame = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    feats = extract_features(frame, payload_col="payload", id_col="doc_id")
    return (
        feats.select(
            "doc_id", F.posexplode("features").alias("feature_idx", "feature")
        )
        .select(
            "doc_id",
            F.col("feature_idx").cast("long").alias("feature_idx"),
            F.round(F.col("feature").cast("double"), 6).alias("feature_r"),
        )
        .orderBy("doc_id", "feature_idx")
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id,
             GREATEST(CAST(FLOOR(octet_length(encode(text)) / 1024.0) AS INT), 1)
               AS n_frames
      FROM documents WHERE doc_id < 200
    )
    SELECT media_id,
           CAST(unnest(range(0, n_frames, 2)) AS INT) AS frame_idx
    FROM media
    ORDER BY media_id, frame_idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-index sampling over the metadata struct (every 2nd frame;
    frame count derived from payload byte length) — the video-sampling
    plumbing with the decode step stubbed out."""
    from lcr_etl_upgrade_spark.operators.multimodal import frame_sample_stub

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    frame = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    ).withColumn(
        "meta",
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.length("payload").cast("long").alias("n_bytes"),
        ),
    )
    return frame_sample_stub(frame, every_n=2).orderBy("media_id", "frame_idx")
