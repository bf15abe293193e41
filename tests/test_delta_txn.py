"""Idempotent (setTransaction-stamped) writes + the exactly-once
foreachBatch sink, composed end-to-end with the delta_cdf_lite source."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.delta_lite import (
    delete_rows,
    read_delta_lite,
    replay_log,
    write_delta_lite,
)
from lcr_etl_upgrade_spark.sinks.registry import exactly_once_delta_sink
from lcr_etl_upgrade_spark.streaming.cdf_source import DeltaCdfLiteDataSource


def _rows(spark, path, cols):
    df = read_delta_lite(spark, path)
    return Counter(tuple(r[c] for c in cols) for r in df.collect())


def test_txn_replay_is_skipped(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(5).select("id")
    v0 = write_delta_lite(df, path, mode="append", txn=("app", 0))
    assert v0 == 0
    # exact replay: no new commit, no new rows
    v_again = write_delta_lite(df, path, mode="append", txn=("app", 0))
    assert v_again == 0
    assert replay_log(spark, path).version == 0
    assert _rows(spark, path, ["id"]) == Counter({(i,): 1 for i in range(5)})
    # a LOWER version replays too (watermark is monotone)
    assert write_delta_lite(
        spark.range(99).select("id"), path, mode="append", txn=("app", -1)
    ) == 0
    # a higher version applies and advances the watermark
    v1 = write_delta_lite(
        spark.range(5, 8).select("id"), path, mode="append", txn=("app", 1)
    )
    assert v1 == 1
    state = replay_log(spark, path)
    assert int(state.txns["app"]["version"]) == 1
    # a DIFFERENT app id is independent
    v2 = write_delta_lite(
        spark.range(8, 9).select("id"), path, mode="append", txn=("other", 0)
    )
    assert v2 == 2
    assert _rows(spark, path, ["id"]) == Counter(
        {(i,): 1 for i in range(9)}
    )


def test_exactly_once_sink_dedupes_batch_replay(spark, tmp_path):
    out = str(tmp_path / "out")
    sink = exactly_once_delta_sink(out, "pipeline-x")
    batch = spark.range(4).select("id")
    sink(batch, 0)
    sink(batch, 0)  # the crash-replay the stream checkpoint can't stop
    sink(spark.range(4, 6).select("id"), 1)
    sink(spark.range(4, 6).select("id"), 1)
    assert _rows(spark, out, ["id"]) == Counter({(i,): 1 for i in range(6)})


def test_delta_to_delta_cdc_roundtrip(spark, tmp_path):
    """delta_cdf_lite source -> filter to inserts -> exactly-once delta
    sink: the target accumulates exactly the source's inserted rows,
    across a stream restart with new source commits in between."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    write_delta_lite(spark.range(6).select("id"), src)  # v0
    delete_rows(spark, src, F.col("id") >= 4)  # v1
    spark.dataSource.register(DeltaCdfLiteDataSource)

    def run_once():
        stream = (
            spark.readStream.format("delta_cdf_lite")
            .option("path", src)
            .load()
        )
        inserts = stream.filter(
            F.col("_change_type") == "insert"
        ).select("id")
        q = (
            inserts.writeStream.foreachBatch(
                exactly_once_delta_sink(dst, "cdc-copy")
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert _rows(spark, dst, ["id"]) == Counter(
        {(i,): 1 for i in range(6)}
    )
    write_delta_lite(
        spark.range(10, 12).select("id"), src, mode="append"
    )  # v2 while the stream is down
    run_once()
    assert _rows(spark, dst, ["id"]) == Counter(
        {(i,): 1 for i in list(range(6)) + [10, 11]}
    )
