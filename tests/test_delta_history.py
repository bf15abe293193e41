"""commitInfo headers + table_history (DESCRIBE HISTORY parity)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.delta_lite import (
    delete_rows,
    optimize,
    read_delta_changes,
    table_history,
    write_delta_lite,
)


def test_history_lists_operations_newest_first(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(20).select("id").coalesce(1), path)
    write_delta_lite(
        spark.range(20, 40).select("id").coalesce(1), path, mode="append"
    )
    delete_rows(spark, path, F.col("id") < 5)
    optimize(spark, path)
    hist = table_history(path)
    assert [h["version"] for h in hist] == [3, 2, 1, 0]
    assert [h["operation"] for h in hist] == [
        "OPTIMIZE", "DELETE", "WRITE", "WRITE",
    ]
    assert hist[2]["operationParameters"] == {"mode": "append"}
    assert all(h["timestamp"] > 0 for h in hist)
    # timestamps are monotone non-decreasing oldest -> newest
    ts = [h["timestamp"] for h in reversed(hist)]
    assert ts == sorted(ts)


def test_cdf_timestamp_is_log_authoritative(spark, tmp_path):
    """The change feed's _commit_timestamp comes from commitInfo, not
    the commit file's mtime — surviving file copies and touch."""
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(3).select("id"), path)
    before = [
        r["_commit_timestamp"]
        for r in read_delta_changes(spark, path, 0, 0).collect()
    ]
    os.utime(
        os.path.join(path, "_delta_log", "00000000000000000000.json"),
        (1, 1),  # bogus mtime: 1970
    )
    after = [
        r["_commit_timestamp"]
        for r in read_delta_changes(spark, path, 0, 0).collect()
    ]
    assert sorted(before) == sorted(after)
    assert all(t.year > 2000 for t in after)


def test_history_fallback_for_foreign_commits(spark, tmp_path):
    import json

    path = str(tmp_path / "t")
    write_delta_lite(spark.range(3).select("id"), path)
    # a foreign commit without commitInfo (metadata-only)
    log = os.path.join(path, "_delta_log")
    with open(os.path.join(log, "00000000000000000000.json")) as fh:
        meta = next(
            json.loads(ln)["metaData"] for ln in fh if '"metaData"' in ln
        )
    with open(os.path.join(log, "00000000000000000001.json"), "w") as fh:
        fh.write(json.dumps({"metaData": meta}) + "\n")
    hist = table_history(path)
    assert hist[0]["version"] == 1
    assert hist[0]["operation"] is None
    assert hist[0]["timestamp"] > 0  # mtime fallback
