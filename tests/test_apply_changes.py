"""apply_changes — the CDC-apply consumer (r12): change feed out of
table A, ONE transactional merge into replica B per window; after every
window the replica must equal the source snapshot (the replication
invariant), including across whole-window replays (idempotence)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.delta_lite import (
    delete_rows,
    latest_version,
    merge_rows,
    read_delta_changes,
    read_delta_lite,
    update_rows,
    write_delta_lite,
)
from lcr_etl_upgrade_spark.operators.merge import apply_changes
from tests.test_cdf_write_validator import _enable_cdf


def _ms(spark, path):
    return Counter(
        (r["id"], r["v"], r["tag"])
        for r in read_delta_lite(spark, path).collect()
    )


def _seed(spark, n=20):
    return spark.range(0, n).select(
        "id",
        (F.col("id") % 7).cast("int").alias("v"),
        F.lit("base").alias("tag"),
    )


def test_replication_via_apply_changes(spark, tmp_path):
    src_path = str(tmp_path / "src")
    dst_path = str(tmp_path / "dst")
    write_delta_lite(_seed(spark), src_path)
    _enable_cdf(src_path)
    write_delta_lite(read_delta_lite(spark, src_path), dst_path)
    cursor = latest_version(src_path)

    def sync():
        nonlocal cursor
        latest = latest_version(src_path)
        if latest > cursor:
            ch = read_delta_changes(spark, src_path, cursor + 1, latest)
            apply_changes(dst_path, ch, ["id"])
            cursor = latest
        assert _ms(spark, dst_path) == _ms(spark, src_path)

    # window 1: one update commit
    update_rows(spark, src_path, "id % 3 = 0", {"v": F.lit(99)})
    sync()
    # window 2: delete + append (two commits, one window)
    delete_rows(spark, src_path, F.col("id") > 15)
    write_delta_lite(
        spark.range(30, 35).select(
            "id", F.lit(1).cast("int").alias("v"), F.lit("app").alias("tag")
        ),
        src_path,
        mode="append",
    )
    sync()
    # window 3: a MERGE touching the same keys multiple ways
    upd = spark.range(10, 40).select(
        F.col("id").alias("k"), (F.col("id") * 2).cast("int").alias("nv")
    )
    merge_rows(
        spark, src_path, upd, "t.id = s.k",
        matched=(
            ("delete", "s.k % 5 = 0"),
            ("update", None, {"v": "s.nv", "tag": "'m'"}),
        ),
        not_matched=(
            ("insert", "s.k < 37", {"id": "s.k", "v": "s.nv", "tag": "'mi'"}),
        ),
    )
    sync()
    # window 4: same key modified in TWO commits inside one window —
    # the sequence dedupe must apply only the later state
    update_rows(spark, src_path, "id = 2", {"v": F.lit(111)})
    delete_rows(spark, src_path, F.col("id") == 2)
    sync()
    assert (2,) not in {
        (r["id"],) for r in read_delta_lite(spark, dst_path).collect()
    }


def test_apply_changes_idempotent_replay(spark, tmp_path):
    src_path = str(tmp_path / "src")
    dst_path = str(tmp_path / "dst")
    write_delta_lite(_seed(spark, 10), src_path)
    _enable_cdf(src_path)
    write_delta_lite(read_delta_lite(spark, src_path), dst_path)
    v0 = latest_version(src_path)
    update_rows(spark, src_path, "id < 5", {"v": F.lit(42)})
    delete_rows(spark, src_path, F.col("id") == 7)
    hi = latest_version(src_path)
    ch = read_delta_changes(spark, src_path, v0 + 1, hi)
    apply_changes(dst_path, ch, ["id"])
    once = _ms(spark, dst_path)
    assert once == _ms(spark, src_path)
    # whole-window replay (the at-least-once crash contract)
    apply_changes(dst_path, ch, ["id"])
    assert _ms(spark, dst_path) == once


def test_apply_changes_missing_key_refuses(spark, tmp_path):
    src_path = str(tmp_path / "src")
    dst_path = str(tmp_path / "dst")
    write_delta_lite(_seed(spark, 5), src_path)
    _enable_cdf(src_path)
    write_delta_lite(read_delta_lite(spark, src_path), dst_path)
    update_rows(spark, src_path, "id = 1", {"v": F.lit(5)})
    ch = read_delta_changes(spark, src_path, 1, latest_version(src_path))
    with pytest.raises(ValueError, match="key column"):
        apply_changes(dst_path, ch, ["nope"])


def test_streaming_replication(spark, tmp_path):
    """Full CDC replication as a STREAM: the delta_cdf_lite source out
    of table A, apply_changes into replica B per micro-batch, across
    availableNow restarts from one checkpoint. Replica equals source
    after every drain — the streaming spelling of the batch loop above
    (whole-batch replays are idempotent by apply_changes' contract)."""
    from lcr_etl_upgrade_spark.streaming.cdf_source import (
        DeltaCdfLiteDataSource,
    )

    spark.dataSource.register(DeltaCdfLiteDataSource)
    src_path = str(tmp_path / "src")
    dst_path = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    write_delta_lite(_seed(spark), src_path)
    _enable_cdf(src_path)
    # replica starts as a copy of the pre-CDF snapshot (the stream
    # serves changes from the enablement version onward)
    write_delta_lite(read_delta_lite(spark, src_path), dst_path)

    def drain():
        stream = (
            spark.readStream.format("delta_cdf_lite")
            .option("path", src_path)
            .load()
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, _bid: df.isEmpty()
                or apply_changes(dst_path, df, ["id"])
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert _ms(spark, dst_path) == _ms(spark, src_path)

    update_rows(spark, src_path, "id % 4 = 0", {"v": F.lit(77)})
    delete_rows(spark, src_path, F.col("id") >= 18)
    drain()
    merge_rows(
        spark,
        src_path,
        spark.range(12, 25).select(
            F.col("id").alias("k"), (F.col("id") + 7).cast("int").alias("nv")
        ),
        "t.id = s.k",
        matched=(
            ("delete", "s.k % 2 = 1"),
            ("update", None, {"v": "s.nv"}),
        ),
        not_matched=(
            ("insert", None, {"id": "s.k", "v": "s.nv", "tag": "'st'"}),
        ),
    )
    drain()
    write_delta_lite(
        spark.range(50, 55).select(
            "id", F.lit(0).cast("int").alias("v"), F.lit("a").alias("tag")
        ),
        src_path,
        mode="append",
    )
    drain()
