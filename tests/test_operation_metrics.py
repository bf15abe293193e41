"""commitInfo.operationMetrics (r12, delta-spark DESCRIBE HISTORY
parity): UPDATE / DELETE / MERGE record their row counts, computed with
ZERO extra passes — updated rows via observe() riding the staging
write, deleted rows from DV-cardinality growth, merge deletes by
conservation (removed_live - rewritten), inserts/copies from the add
stats already being parsed."""

from __future__ import annotations

from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.delta_lite import (
    delete_rows,
    merge_rows,
    table_history,
    update_rows,
    write_delta_lite,
)


def _df(spark, n=20):
    return spark.range(0, n).select(
        "id", (F.col("id") % 3).cast("int").alias("v")
    )


def _metrics(path):
    return table_history(path)[0]["operationMetrics"]


def test_update_metrics(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(_df(spark).coalesce(2), path)
    update_rows(spark, path, "id % 5 = 0", {"v": F.lit(9)})
    m = _metrics(path)
    assert m["numUpdatedRows"] == "4"
    assert m["numCopiedRows"] == "16"
    assert m["numRemovedFiles"] == "2"
    assert int(m["numAddedFiles"]) >= 1


def test_delete_metrics_count_only_newly_masked(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(_df(spark).coalesce(1), path)
    delete_rows(spark, path, F.col("id") < 5)
    m = _metrics(path)
    assert m["numDeletedRows"] == "5"
    assert m["numDeletionVectorsAdded"] == "1"
    # overlapping second delete: only the NEW rows count
    delete_rows(spark, path, F.col("id") < 8)
    assert _metrics(path)["numDeletedRows"] == "3"


def test_merge_metrics(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(_df(spark, 10).coalesce(2), path)
    src = spark.range(5, 15).select(
        F.col("id").alias("k"), F.lit(7).cast("int").alias("nv")
    )
    merge_rows(
        spark,
        path,
        src,
        "t.id = s.k",
        matched=(
            ("update", "s.k % 2 = 0", {"v": "s.nv"}),  # 6, 8
            ("delete", None),  # 5, 7, 9
        ),
        not_matched=(
            ("insert", "s.k < 13", {"id": "s.k", "v": "s.nv"}),  # 10-12
        ),
    )
    m = _metrics(path)
    assert m["numSourceRows"] == "10"
    assert m["numTargetRowsUpdated"] == "2"
    assert m["numTargetRowsDeleted"] == "3"
    assert m["numTargetRowsInserted"] == "3"
    assert int(m["numTargetFilesRemoved"]) >= 1
    assert int(m["numTargetFilesAdded"]) >= 1
    # every value is a string, delta-spark's encoding
    assert all(isinstance(v, str) for v in m.values())


def test_merge_metrics_not_matched_by_source(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(_df(spark, 8).coalesce(1), path)
    src = spark.range(0, 2).select(F.col("id").alias("k"))
    merge_rows(
        spark,
        path,
        src,
        "t.id = s.k",
        matched=(("update", None, {"v": F.lit(1)}),),
        not_matched_by_source=(
            ("update", "t.id < 4", {"v": F.lit(2)}),  # 2, 3
            ("delete", None),  # 4..7
        ),
    )
    m = _metrics(path)
    assert m["numTargetRowsUpdated"] == "4"  # 0,1 matched + 2,3 by-source
    assert m["numTargetRowsDeleted"] == "4"
    assert m["numTargetRowsInserted"] == "0"


def test_optimize_and_restore_metrics(spark, tmp_path):
    from lcr_etl_upgrade_spark.delta_lite import optimize, restore_table

    path = str(tmp_path / "t")
    write_delta_lite(_df(spark).repartition(4), path)
    res = optimize(spark, path, target_file_bytes=1 << 30)
    m = _metrics(path)
    assert m["numRemovedFiles"] == str(res["rewritten"])
    assert m["numAddedFiles"] == str(res["added"])
    res2 = restore_table(spark, path, 0)
    m2 = _metrics(path)
    assert m2["numRestoredFiles"] == str(res2["added"])
    assert m2["numRemovedFiles"] == str(res2["removed"])
