"""L5 multimodal queries — binary payloads through REAL codecs, oracled.

``multimodal_feature_extract`` builds genuine container bytes per doc —
a binary PPM (P6 header + RGB raster) for even doc_ids, a RIFF/WAVE
PCM-16 file (fmt + data chunks) for odd ones — from a deterministic
pixel/sample formula, then decodes them with the dependency-free
parsers in operators/multimodal.py (pure ``struct``; header grammar and
chunk walk for real). The oracle restates the FORMULA math in DuckDB,
so any decode defect (misread header, wrong endianness, off-by-one in
the raster) hash-mismatches an engine that never saw the bytes.

Rich formats (JPEG/MP3) stay behind the documented stub seam; the fake
sha256 extractor is still exercised in pytest
(tests/test_text_multimodal.py) as the downstream-plumbing stand-in.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lcr_etl_upgrade_spark.plans.registry import query
from lcr_etl_upgrade_spark.sources.testdata import load_table

# synthetic-media geometry: small enough to keep the sf0.01 check quick,
# big enough that a raster/chunk off-by-one shifts every statistic
_IMG_W, _IMG_H = 8, 4  # 96 RGB bytes
_WAV_RATE, _WAV_N = 8000, 64  # 64 PCM-16 samples


@F.pandas_udf(T.BinaryType())
def _synth_media(doc_id: pd.Series) -> pd.Series:
    """Writer side of the codec round-trip: even ids -> PPM with pixel
    j = (id*7 + j*13) % 256; odd ids -> WAV with sample
    i = ((id*31 + i*17) % 65536) - 32768. Real container bytes, formula
    restatable in SQL."""
    from lcr_etl_upgrade_spark.operators.multimodal import (
        encode_ppm,
        encode_wav_pcm16,
    )

    def build(d: int) -> bytes:
        if d % 2 == 0:
            px = bytes((d * 7 + j * 13) % 256 for j in range(_IMG_W * _IMG_H * 3))
            return encode_ppm(_IMG_W, _IMG_H, px)
        samples = [((d * 31 + i * 17) % 65536) - 32768 for i in range(_WAV_N)]
        return encode_wav_pcm16(_WAV_RATE, samples)

    return doc_id.map(build)


@query(
    "multimodal_feature_extract",
    oracle=f"""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 200),
    img AS (
      SELECT s.doc_id AS media_id, 'image' AS kind,
             {_IMG_W} AS width, {_IMG_H} AS height,
             CAST(NULL AS INTEGER) AS sample_rate,
             CAST(NULL AS BIGINT) AS n_samples,
             ROUND(AVG(CASE WHEN s.j % 3 = 0 THEN s.v END), 6) AS mean_c0,
             ROUND(AVG(CASE WHEN s.j % 3 = 1 THEN s.v END), 6) AS mean_c1,
             ROUND(AVG(CASE WHEN s.j % 3 = 2 THEN s.v END), 6) AS mean_c2,
             MIN(s.v) AS vmin, MAX(s.v) AS vmax,
             CAST(NULL AS DOUBLE) AS rms_r
      FROM (SELECT doc_id, CAST(u AS BIGINT) AS j,
                   (doc_id * 7 + CAST(u AS BIGINT) * 13) % 256 AS v
            FROM ids, unnest(range(0, {_IMG_W * _IMG_H * 3})) t(u)
            WHERE doc_id % 2 = 0) s
      GROUP BY s.doc_id
    ),
    aud AS (
      SELECT q.doc_id AS media_id, 'audio' AS kind,
             CAST(NULL AS INTEGER) AS width, CAST(NULL AS INTEGER) AS height,
             {_WAV_RATE} AS sample_rate, CAST({_WAV_N} AS BIGINT) AS n_samples,
             CAST(NULL AS DOUBLE) AS mean_c0, CAST(NULL AS DOUBLE) AS mean_c1,
             CAST(NULL AS DOUBLE) AS mean_c2,
             MIN(q.s) AS vmin, MAX(q.s) AS vmax,
             ROUND(SQRT(AVG(CAST(q.s AS DOUBLE) * q.s)), 6) AS rms_r
      FROM (SELECT doc_id,
                   ((doc_id * 31 + CAST(u AS BIGINT) * 17) % 65536) - 32768 AS s
            FROM ids, unnest(range(0, {_WAV_N})) t(u)
            WHERE doc_id % 2 = 1) q
      GROUP BY q.doc_id
    )
    SELECT * FROM img UNION ALL SELECT * FROM aud ORDER BY media_id
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-codec round-trip: synthesize PPM/WAV container bytes per doc
    (pandas UDF writer), decode them with the pure-struct parsers inside
    mapInPandas (header grammar, chunk walk, int16 unpack), and emit
    typed features. DuckDB recomputes the expected statistics from the
    pixel/sample formula alone — it never parses the bytes — so the
    hash-match proves the decoder read the containers correctly."""
    from lcr_etl_upgrade_spark.operators.multimodal import extract_media_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = docs.select(
        F.col("doc_id").alias("media_id"), _synth_media("doc_id").alias("payload")
    )
    feats = extract_media_features(media, payload_col="payload", id_col="media_id")
    return feats.select(
        "media_id",
        "kind",
        "width",
        "height",
        "sample_rate",
        "n_samples",
        F.round("mean_c0", 6).alias("mean_c0"),
        F.round("mean_c1", 6).alias("mean_c1"),
        F.round("mean_c2", 6).alias("mean_c2"),
        "vmin",
        "vmax",
        F.round("rms", 6).alias("rms_r"),
    ).orderBy("media_id")


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
