"""streaming.joins — stream-stream interval join and stream-static
enrichment, driven the same way as the windowed-operator tests
(file-source readStream + memory sink + processAllAvailable), with
stream==batch parity as the correctness anchor."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.streaming.joins import (
    interval_join,
    stream_static_join,
)

T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def _impressions(spark):
    rows = [
        (1, T0, "ad_a"),
        (1, T0 + dt.timedelta(hours=3), "ad_b"),
        (2, T0, "ad_c"),
        (3, T0, "ad_d"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, imp_ts timestamp, ad string"
    )


def _clicks(spark):
    rows = [
        (1, T0 + dt.timedelta(minutes=10), "p1"),  # joins ad_a
        (1, T0 + dt.timedelta(hours=3, minutes=5), "p2"),  # joins ad_b
        (2, T0 - dt.timedelta(minutes=5), "p3"),  # BEFORE imp: no join
        (2, T0 + dt.timedelta(hours=2), "p4"),  # beyond 1h bound: no join
    ]
    return spark.createDataFrame(
        rows, "user_id long, click_ts timestamp, page string"
    )


EXPECTED_INNER = {
    (1, "ad_a", "p1"),
    (1, "ad_b", "p2"),
}


def test_interval_join_batch(spark):
    out = interval_join(
        _impressions(spark),
        _clicks(spark),
        ["user_id"],
        "imp_ts",
        "click_ts",
        upper="1 hour",
    )
    got = {(r.user_id, r.ad, r.page) for r in out.collect()}
    assert got == EXPECTED_INNER


def test_interval_join_left_outer_batch(spark):
    out = interval_join(
        _impressions(spark),
        _clicks(spark),
        ["user_id"],
        "imp_ts",
        "click_ts",
        upper="1 hour",
        how="leftOuter",
    )
    got = {(r.user_id, r.ad, r.page) for r in out.collect()}
    assert got == EXPECTED_INNER | {
        (2, "ad_c", None),
        (3, "ad_d", None),
    }


def test_interval_join_stream_stream(spark, tmp_path):
    """BOTH sides are file-source streams; the joined output must equal
    the batch result (stream==batch parity) — and the query plan must be
    a genuine stream-stream join (state-store-backed), not a collapsed
    static join."""
    imp_dir, click_dir = str(tmp_path / "imp"), str(tmp_path / "click")
    imp_b, click_b = _impressions(spark), _clicks(spark)
    imp_b.write.parquet(imp_dir)
    click_b.write.parquet(click_dir)
    imp_s = spark.readStream.schema(imp_b.schema).parquet(imp_dir)
    click_s = spark.readStream.schema(click_b.schema).parquet(click_dir)
    out = interval_join(
        imp_s, click_s, ["user_id"], "imp_ts", "click_ts", upper="1 hour"
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.ad, r.page)
            for r in spark.sql("select * from ss_join").collect()
        }
    finally:
        q.stop()
    assert got == EXPECTED_INNER


def test_interval_join_contract_errors(spark):
    a = _impressions(spark)
    b = _clicks(spark)
    with pytest.raises(ValueError, match="inner|leftOuter"):
        interval_join(a, b, ["user_id"], "imp_ts", "click_ts", how="full")
    with pytest.raises(ValueError, match="distinct column names"):
        interval_join(a, a, ["user_id"], "imp_ts", "imp_ts")
    with pytest.raises(ValueError, match="both sides"):
        interval_join(
            a,
            a.withColumnRenamed("imp_ts", "other_ts"),
            ["user_id"],
            "imp_ts",
            "other_ts",
        )


def test_stream_static_join_enriches_with_broadcast(spark, tmp_path):
    src = str(tmp_path / "ev")
    batch = _impressions(spark)
    batch.write.parquet(src)
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = stream_static_join(stream, dim, ["user_id"])
    q = (
        out.writeStream.format("memory")
        .queryName("st_join")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.ad, r.tier)
            for r in spark.sql("select * from st_join").collect()
        }
    finally:
        q.stop()
    assert got == {
        (1, "ad_a", "gold"),
        (1, "ad_b", "gold"),
        (2, "ad_c", "silver"),
        (3, "ad_d", None),
    }


def test_stream_static_join_broadcast_opt_out(spark):
    """broadcast=False must leave the hint off so Spark's size-based
    planning decides — a forced broadcast of a LARGE dim risks OOM."""
    from pyspark.sql import functions as F

    stream = spark.createDataFrame([(1, "x")], "user_id long, ad string")
    dim = spark.createDataFrame([(1, "gold")], "user_id long, tier string")
    hinted = stream_static_join(stream, dim, ["user_id"])
    unhinted = stream_static_join(stream, dim, ["user_id"], broadcast=False)
    assert "strategy=broadcast" in (
        hinted._jdf.queryExecution().logical().toString()
    )
    assert "strategy=broadcast" not in (
        unhinted._jdf.queryExecution().logical().toString()
    )
    # result parity regardless of the hint
    assert hinted.collect() == unhinted.collect()
