"""L4 text analysis and L5 multimodal plumbing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.operators.text import (
    fingerprint,
    language_id,
    quality_features,
    token_count_expr,
)


def test_token_count(spark):
    df = spark.createDataFrame([("one two  three",), ("solo",)], ["text"])
    got = [r.n for r in df.select(token_count_expr(F.col("text")).alias("n")).collect()]
    assert got == [3, 1]


def test_quality_features(spark):
    df = spark.createDataFrame([("the cat, the dog!",)], ["text"])
    row = quality_features(df).collect()[0]
    assert row.n_tokens == 4
    assert row.stopword_ratio == 0.5  # "the" twice out of 4 tokens
    assert row.punct_ratio == pytest.approx(2 / 17)


def test_language_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat is in the house and it is warm"),
            (1, "der hund ist nicht in das haus und die katze"),
            (2, "le chat est dans la maison et les chiens"),
            (3, "zzz qqq xxx"),  # no stopword hits anywhere
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.lang_pred for r in language_id(df).collect()}
    assert got[0] == "en" and got[1] == "de" and got[2] == "fr"
    assert got[3] == "und"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(0, "Hello  World"), (1, "hello world"), (2, "different")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in fingerprint(df).collect()}
    assert rows[0].content_md5 != rows[1].content_md5        # raw differs
    assert rows[0].normalized_fp == rows[1].normalized_fp    # normalized equal
    assert rows[0].normalized_fp != rows[2].normalized_fp


def test_multimodal_feature_extraction(spark):
    from lcr_etl_upgrade_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
    )

    df = spark.createDataFrame(
        [(0, bytearray(b"payload-a")), (1, bytearray(b"payload-a")), (2, bytearray(b"payload-b"))],
        "media_id long, payload binary",
    )
    got = {r.media_id: r.features for r in extract_features(df).collect()}
    assert len(got[0]) == FEATURE_DIM
    assert got[0] == got[1]            # deterministic: same bytes, same features
    assert got[0] != got[2]
    assert all(0.0 <= v < 1.0 for v in got[0])


def test_multimodal_raise_stub_marks_codec_seam(spark):
    from lcr_etl_upgrade_spark.operators.multimodal import extract_features

    df = spark.createDataFrame([(0, bytearray(b"x"))], "media_id long, payload binary")
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        extract_features(df, decode_stub="raise").collect()


def test_frame_sample_stub(spark):
    from lcr_etl_upgrade_spark.operators.multimodal import frame_sample_stub

    df = spark.createDataFrame(
        [(0, (None, None, None, 4096))],
        "media_id long, meta struct<width:int,height:int,sample_rate:int,n_bytes:bigint>",
    )
    got = [r.frame_idx for r in frame_sample_stub(df, every_n=2).collect()]
    assert got == [0, 2]  # 4 'frames', every 2nd


def test_binary_file_source(spark, tmp_path):
    from lcr_etl_upgrade_spark.operators.multimodal import read_binary_files

    d = tmp_path / "media"
    d.mkdir()
    (d / "a.bin").write_bytes(b"\x00\x01payload-a")
    (d / "b.bin").write_bytes(b"payload-b")
    (d / "skip.txt").write_bytes(b"nope")
    df = read_binary_files(spark, str(d), glob="*.bin")
    rows = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in df.collect()}
    assert set(rows) == {"a.bin", "b.bin"}
    assert rows["a.bin"] == b"\x00\x01payload-a"
