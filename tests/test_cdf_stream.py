"""The delta_cdf_lite streaming source + the arrow materializer.

cdf_arrow is differential-tested against the Spark batch reader
(identical multisets per window); the streaming source is driven
end-to-end into a parquet sink across appends, deletes and an engine
OPTIMIZE, including a checkpointed restart.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.cdf_arrow import arrow_changes, change_schema
from lcr_etl_upgrade_spark.delta_lite import (
    delete_rows,
    optimize,
    read_delta_changes,
    write_delta_lite,
)
from lcr_etl_upgrade_spark.streaming.cdf_source import DeltaCdfLiteDataSource

COLS = ["id", "g", "_change_type", "_commit_version"]


def _table(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(
        spark.range(8).select("id", (F.col("id") % 2).alias("g")), path
    )  # v0
    write_delta_lite(
        spark.range(8, 12).select("id", (F.col("id") % 2).alias("g")),
        path,
        mode="append",
    )  # v1
    delete_rows(spark, path, F.col("id") % 3 == 0)  # v2
    return path


def _spark_side(spark, path, lo, hi):
    df = read_delta_changes(spark, path, lo, hi)
    return Counter(tuple(r[c] for c in COLS) for r in df.collect())


def _arrow_side(path, lo, hi):
    schema = change_schema(path)
    names = [f.name for f in schema.fields]
    idx = [names.index(c) for c in COLS]
    return Counter(tuple(t[i] for i in idx) for t in arrow_changes(path, lo, hi))


def test_arrow_changes_match_spark_reader(spark, tmp_path):
    path = _table(spark, tmp_path)
    for lo, hi in [(0, 0), (1, 1), (2, 2), (0, 2), (1, 2)]:
        assert _arrow_side(path, lo, hi) == _spark_side(
            spark, path, lo, hi
        ), (lo, hi)


def test_arrow_changes_partitioned_and_mapped(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(
        spark.range(10).select("id", (F.col("id") % 2).alias("g")),
        path,
        partition_by=("g",),
        column_mapping="name",
    )
    delete_rows(spark, path, F.col("id") < 3)
    for lo, hi in [(0, 1), (1, 1)]:
        assert _arrow_side(path, lo, hi) == _spark_side(
            spark, path, lo, hi
        ), (lo, hi)


def _run_stream_once(spark, path, checkpoint, out_dir):
    stream = (
        spark.readStream.format("delta_cdf_lite")
        .option("path", path)
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_source_end_to_end_with_restart(spark, tmp_path):
    path = _table(spark, tmp_path)
    spark.dataSource.register(DeltaCdfLiteDataSource)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def sink_rows():
        df = spark.read.parquet(out)
        return Counter(tuple(r[c] for c in COLS) for r in df.collect())

    _run_stream_once(spark, path, ckpt, out)
    assert sink_rows() == _spark_side(spark, path, 0, 2)

    # new commits while the stream is DOWN: an append and an OPTIMIZE
    # (which must contribute nothing)
    write_delta_lite(
        spark.range(100, 103).select("id", F.lit(7).cast("long").alias("g")),
        path,
        mode="append",
    )  # v3
    optimize(spark, path, target_file_bytes=1 << 30)  # v4, dataChange=false
    _run_stream_once(spark, path, ckpt, out)
    # restart resumed AFTER the checkpointed version: exactly the v3
    # inserts arrived, nothing replayed, nothing from the optimize
    expected = _spark_side(spark, path, 0, 2) + Counter(
        {(i, 7, "insert", 3): 1 for i in range(100, 103)}
    )
    assert sink_rows() == expected


def test_streaming_source_requires_path(spark):
    spark.dataSource.register(DeltaCdfLiteDataSource)
    with pytest.raises(Exception, match="path"):
        spark.readStream.format("delta_cdf_lite").load().printSchema()


def test_arrow_reader_replays_checkpointed_histories(spark, tmp_path):
    """The pre-window STATE may come from a checkpoint (pyarrow-shimmed
    replay_log): after write_checkpoint + cleanup_log the early JSON
    commits are gone, yet changes for retained commits still read and
    still match the Spark reader."""
    from lcr_etl_upgrade_spark.delta_lite import cleanup_log, write_checkpoint

    path = _table(spark, tmp_path)  # v0..v2
    write_checkpoint(spark, path)
    removed = cleanup_log(spark, path)
    assert any(r.endswith(".json") for r in removed)
    write_delta_lite(
        spark.range(50, 53).select("id", F.lit(9).cast("long").alias("g")),
        path,
        mode="append",
    )  # v3
    assert _arrow_side(path, 3, 3) == _spark_side(spark, path, 3, 3)
    got = _arrow_side(path, 3, 3)
    assert got == Counter({(i, 9, "insert", 3): 1 for i in range(50, 53)})


def test_arrow_reader_refuses_unrecoverable_windows(spark, tmp_path):
    import os

    path = _table(spark, tmp_path)
    os.remove(
        os.path.join(path, "_delta_log", "00000000000000000000.json")
    )
    # no checkpoint exists: the pre-window state is unreconstructable
    with pytest.raises(ValueError, match="not found|missing"):
        arrow_changes(path, 1, 2)


def test_arrow_matches_spark_on_dv_restore(spark, tmp_path):
    """Regression (fuzzer find, seed 20260817 case 16): a DV-CLEARING
    restore commit must emit only the restored rows as inserts on the
    arrow side too — keep_dv=None means keep-ALL in materialize_rows,
    so an empty new-DV side must skip its delete task, not pass None."""
    import json
    import os

    path = str(tmp_path / "t")
    write_delta_lite(
        spark.range(6)
        .coalesce(1)
        .select("id", (F.col("id") % 2).alias("g")),
        path,
    )  # v0: one file
    delete_rows(spark, path, F.col("id") < 2)  # v1: DV marks 0,1
    log = os.path.join(path, "_delta_log")
    with open(os.path.join(log, "00000000000000000001.json")) as fh:
        add = next(json.loads(ln)["add"] for ln in fh if '"add"' in ln)
    restore = [
        {"remove": {"path": add["path"], "dataChange": True,
                    "deletionTimestamp": 9,
                    "deletionVector": add["deletionVector"]}},
        {"add": {**{k: v for k, v in add.items()
                    if k != "deletionVector"}, "dataChange": True}},
    ]
    with open(os.path.join(log, "00000000000000000002.json"), "w") as fh:
        for a in restore:
            fh.write(json.dumps(a) + "\n")
    assert _arrow_side(path, 2, 2) == _spark_side(spark, path, 2, 2)
    assert _arrow_side(path, 2, 2) == Counter(
        {(0, 0, "insert", 2): 1, (1, 1, "insert", 2): 1}
    )


def test_arrow_matches_spark_with_ustorage_dvs(spark, tmp_path):
    """Deletion vectors in u-storage .bin files (inline_threshold=0
    forces the file path) flow through BOTH change readers and
    OPTIMIZE's materialization identically."""
    from lcr_etl_upgrade_spark.delta_lite import optimize, read_delta_lite

    path = str(tmp_path / "t")
    write_delta_lite(
        spark.range(200).select("id", (F.col("id") % 2).alias("g")), path
    )  # v0
    delete_rows(spark, path, F.col("id") % 3 == 0, inline_threshold=0)  # v1
    delete_rows(spark, path, F.col("id") % 4 == 0, inline_threshold=0)  # v2
    for lo, hi in [(1, 1), (2, 2), (0, 2)]:
        assert _arrow_side(path, lo, hi) == _spark_side(
            spark, path, lo, hi
        ), (lo, hi)
    live_before = spark.createDataFrame(
        read_delta_lite(spark, path).collect()
    ).count()
    res = optimize(spark, path)  # materializes the u-storage DVs
    assert read_delta_lite(spark, path).count() == live_before
    assert read_delta_changes(
        spark, path, res["version"], res["version"]
    ).count() == 0


def test_streaming_source_serves_cdc_change_files(spark, tmp_path):
    """A CDF-ENABLED table's delete commits carry cdc actions; the
    partition-planned streaming source must deliver those rows FROM the
    change files (ctype read per row), identically to the batch
    readers."""
    import json
    import os

    from lcr_etl_upgrade_spark.delta_lite import replay_log

    path = str(tmp_path / "t")
    write_delta_lite(
        spark.range(12).select("id", (F.col("id") % 2).alias("g"))
        .coalesce(1),
        path,
    )  # v0
    # enable CDF (protocol 1/7 + config), then delete -> cdc actions
    state = replay_log(spark, path)
    meta = dict(state.metadata)
    meta["configuration"] = {"delta.enableChangeDataFeed": "true"}
    with open(os.path.join(
            path, "_delta_log", f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 7,
            "writerFeatures": ["appendOnly", "invariants",
                               "changeDataFeed"],
        }}) + "\n")
        fh.write(json.dumps({"metaData": meta}) + "\n")
    v = delete_rows(spark, path, F.col("id") >= 9)  # v2, writes cdc
    with open(os.path.join(path, "_delta_log",
                           f"{v:020d}.json")) as fh:
        assert any("cdc" in json.loads(l) for l in fh if l.strip())

    spark.dataSource.register(DeltaCdfLiteDataSource)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _run_stream_once(spark, path, ckpt, out)
    got = Counter(
        tuple(r[c] for c in COLS)
        for r in spark.read.parquet(out).collect()
    )
    assert got == _spark_side(spark, path, 0, v)
    # the delete rows specifically came through as change-file deletes
    assert all(
        got[(i, i % 2, "delete", v)] == 1 for i in range(9, 12)
    )
