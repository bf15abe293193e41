"""L5 multimodal queries — binary payloads through REAL codecs, oracled.

``multimodal_feature_extract`` builds genuine container bytes per doc —
binary PPM (P6 header + RGB raster), RIFF/WAVE PCM-16 (fmt + data
chunks), REAL baseline JPEG (DQT/SOF0/DHT/Huffman scan via
``jpeg_lite.encode_jpeg_flat``), and MPEG audio frame headers — from a
deterministic formula, then decodes them with the dependency-free
parsers (pure ``struct``/numpy; header grammar, chunk walk, entropy
decode + IDCT for real). The oracle restates the FORMULA math in
DuckDB, so any decode defect (misread header, wrong endianness,
off-by-one in the raster, a broken Huffman walk or color conversion)
hash-mismatches an engine that never saw the bytes.

Only MP3 sample (MDCT) decode stays behind the documented seam; the
fake sha256 extractor is still exercised in pytest
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
# MPEG1 Layer III bitrate table (kbps) and MPEG1 sample rates — restated
# as list literals in the oracle SQL
_MP3_V1L3 = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_RATES = (44100, 48000, 32000)


@F.pandas_udf(T.BinaryType())
def _synth_media(doc_id: pd.Series) -> pd.Series:
    """Writer side of the codec round-trip, one container per id%4:
    0 -> PPM with pixel j = (id*7 + j*13) % 256;
    1 -> WAV with sample i = ((id*31 + i*17) % 65536) - 32768;
    2 -> REAL baseline JPEG (DQT/SOF0/DHT/SOS + Huffman scan) of a flat
         color: width = 100 + id%50, height = 50 + id%30, Y = (id*5)%256,
         Cb = (id*3)%256, Cr = (id*11)%256 — flat + all-8s quant makes
         the DC-only decode EXACT, so the expected RGB is the BT.601
         clamp/round formula, restatable in SQL with no DCT math (none
         of the 50 ids lands on a .5 rounding tie — pinned by
         tests/test_text_multimodal.py);
    3 -> MP3 frame header with bitrate idx 1 + id%14, rate idx id%3,
         stereo, followed by id%100 zero bytes (so est_duration =
         (4 + id%100)*8 / bitrate).
    Real container bytes; every expected feature restatable in SQL."""
    from lcr_etl_upgrade_spark.jpeg_lite import encode_jpeg_flat
    from lcr_etl_upgrade_spark.operators.multimodal import (
        encode_ppm,
        encode_wav_pcm16,
    )

    def build(d: int) -> bytes:
        m = d % 4
        if m == 0:
            px = bytes((d * 7 + j * 13) % 256 for j in range(_IMG_W * _IMG_H * 3))
            return encode_ppm(_IMG_W, _IMG_H, px)
        if m == 1:
            samples = [((d * 31 + i * 17) % 65536) - 32768 for i in range(_WAV_N)]
            return encode_wav_pcm16(_WAV_RATE, samples)
        if m == 2:
            return encode_jpeg_flat(
                100 + d % 50,
                50 + d % 30,
                (d * 5) % 256,
                (d * 3) % 256,
                (d * 11) % 256,
            )
        bidx, sidx = 1 + d % 14, d % 3
        header = bytes([0xFF, 0xFB, (bidx << 4) | (sidx << 2), 0x00])
        return header + bytes(d % 100)

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
             CAST(NULL AS DOUBLE) AS rms_r,
             CAST(NULL AS INTEGER) AS components,
             CAST(NULL AS INTEGER) AS bitrate_kbps,
             CAST(NULL AS DOUBLE) AS est_duration_r
      FROM (SELECT doc_id, CAST(u AS BIGINT) AS j,
                   (doc_id * 7 + CAST(u AS BIGINT) * 13) % 256 AS v
            FROM ids, unnest(range(0, {_IMG_W * _IMG_H * 3})) t(u)
            WHERE doc_id % 4 = 0) s
      GROUP BY s.doc_id
    ),
    aud AS (
      SELECT q.doc_id AS media_id, 'audio' AS kind,
             CAST(NULL AS INTEGER) AS width, CAST(NULL AS INTEGER) AS height,
             {_WAV_RATE} AS sample_rate, CAST({_WAV_N} AS BIGINT) AS n_samples,
             CAST(NULL AS DOUBLE) AS mean_c0, CAST(NULL AS DOUBLE) AS mean_c1,
             CAST(NULL AS DOUBLE) AS mean_c2,
             MIN(q.s) AS vmin, MAX(q.s) AS vmax,
             ROUND(SQRT(AVG(CAST(q.s AS DOUBLE) * q.s)), 6) AS rms_r,
             CAST(NULL AS INTEGER) AS components,
             CAST(NULL AS INTEGER) AS bitrate_kbps,
             CAST(NULL AS DOUBLE) AS est_duration_r
      FROM (SELECT doc_id,
                   ((doc_id * 31 + CAST(u AS BIGINT) * 17) % 65536) - 32768 AS s
            FROM ids, unnest(range(0, {_WAV_N})) t(u)
            WHERE doc_id % 4 = 1) q
      GROUP BY q.doc_id
    ),
    jpg AS (
      SELECT media_id, 'image' AS kind, width, height,
             CAST(NULL AS INTEGER) AS sample_rate,
             CAST(NULL AS BIGINT) AS n_samples,
             -- flat image: per-channel mean IS the channel value
             r AS mean_c0, g AS mean_c1, b AS mean_c2,
             CAST(LEAST(r, g, b) AS BIGINT) AS vmin,
             CAST(GREATEST(r, g, b) AS BIGINT) AS vmax,
             CAST(NULL AS DOUBLE) AS rms_r,
             3 AS components,
             CAST(NULL AS INTEGER) AS bitrate_kbps,
             CAST(NULL AS DOUBLE) AS est_duration_r
      FROM (
        SELECT doc_id AS media_id,
               CAST(100 + doc_id % 50 AS INTEGER) AS width,
               CAST(50 + doc_id % 30 AS INTEGER) AS height,
               LEAST(255, GREATEST(0, ROUND(
                 yy + 1.402 * (cr - 128)))) AS r,
               LEAST(255, GREATEST(0, ROUND(
                 yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)))) AS g,
               LEAST(255, GREATEST(0, ROUND(
                 yy + 1.772 * (cb - 128)))) AS b
        FROM (SELECT doc_id,
                     CAST(doc_id * 5 % 256 AS DOUBLE) AS yy,
                     CAST(doc_id * 3 % 256 AS DOUBLE) AS cb,
                     CAST(doc_id * 11 % 256 AS DOUBLE) AS cr
              FROM ids WHERE doc_id % 4 = 2) p
      ) c
    ),
    mp3 AS (
      SELECT media_id, 'audio' AS kind,
             CAST(NULL AS INTEGER) AS width, CAST(NULL AS INTEGER) AS height,
             CAST(list_extract([{", ".join(map(str, _MP3_RATES))}],
                  CAST(media_id % 3 AS INTEGER) + 1) AS INTEGER)
               AS sample_rate,
             CAST(NULL AS BIGINT) AS n_samples,
             CAST(NULL AS DOUBLE) AS mean_c0, CAST(NULL AS DOUBLE) AS mean_c1,
             CAST(NULL AS DOUBLE) AS mean_c2,
             CAST(NULL AS BIGINT) AS vmin, CAST(NULL AS BIGINT) AS vmax,
             CAST(NULL AS DOUBLE) AS rms_r,
             CAST(NULL AS INTEGER) AS components,
             kbps AS bitrate_kbps,
             ROUND((4 + media_id % 100) * 8.0 / (kbps * 1000.0), 9)
               AS est_duration_r
      FROM (SELECT doc_id AS media_id,
                   CAST(list_extract([{", ".join(map(str, _MP3_V1L3))}],
                        CAST(doc_id % 14 AS INTEGER) + 1) AS INTEGER) AS kbps
            FROM ids WHERE doc_id % 4 = 3) b
    )
    SELECT * FROM img UNION ALL SELECT * FROM aud
    UNION ALL SELECT * FROM jpg UNION ALL SELECT * FROM mp3
    ORDER BY media_id
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-codec round-trip over FOUR container formats: synthesize
    PPM/WAV/JPEG/MP3 bytes per doc (pandas UDF writer), decode them
    inside mapInPandas (header grammar, chunk walk, int16 unpack, and
    for JPEG the full jpeg_lite pipeline — Huffman entropy decode,
    dequant, IDCT, 4:2:0 upsample, BT.601 — plus the MPEG frame
    header), and emit typed features. DuckDB recomputes the expected
    statistics from the pixel/sample/geometry/bitrate formulas alone —
    it never parses the bytes — so the hash-match proves the decoders
    read the containers correctly."""
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
        "components",
        "bitrate_kbps",
        F.round("est_duration_sec", 9).alias("est_duration_r"),
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
