"""EL sync stage: audit enrichment, observed counts, 3-way reconciliation,
parallel per-table orchestration with per-table error isolation."""

from __future__ import annotations

from lcr_etl_upgrade_spark.sync import sync_table, sync_tables_parallel

AS_OF = "2026-01-01 00:00:00"


def test_sync_table_reconciles(spark, tmp_path):
    out = str(tmp_path / "raw")
    df = spark.createDataFrame([(i, f"v{i}") for i in range(10)], ["id", "v"])
    result = sync_table(
        df,
        "t1",
        sink=lambda d: d.write.mode("overwrite").parquet(out),
        verify_reader=lambda: spark.read.parquet(out),
        source_count=10,
        as_of=AS_OF,
    )
    assert result.reconciled
    assert result.reconciliation == "3-way"
    assert (result.source_count, result.written_count, result.verified_count) == (10, 10, 10)
    written = spark.read.parquet(out)
    assert written.count() == 10
    row = written.collect()[0]
    assert row.CREATED_BY == "ETL_PROCESS"
    assert str(row.ETL_CREATED_DATE) == AS_OF


def test_sync_table_detects_mismatch(spark, tmp_path):
    out = str(tmp_path / "raw2")
    df = spark.createDataFrame([(1,), (2,)], ["id"])
    result = sync_table(
        df,
        "t2",
        sink=lambda d: d.write.mode("overwrite").parquet(out),
        verify_reader=lambda: spark.read.parquet(out),
        source_count=99,  # out-of-band count disagrees
        as_of=AS_OF,
    )
    assert not result.reconciled
    assert result.reconciliation == "none"


def test_sync_table_without_independent_count_not_reconciled(spark, tmp_path):
    """Omitting both source_count and verify_reader must surface 'no
    independent count' — never a silently-true reconciliation."""
    out = str(tmp_path / "raw3")
    df = spark.createDataFrame([(1,), (2,)], ["id"])
    result = sync_table(
        df,
        "t3",
        sink=lambda d: d.write.mode("overwrite").parquet(out),
        as_of=AS_OF,
    )
    assert result.source_count is None
    assert result.written_count == 2
    assert result.reconciliation == "none"
    assert not result.reconciled


def test_sync_table_two_way_via_verify_only(spark, tmp_path):
    out = str(tmp_path / "raw4")
    df = spark.createDataFrame([(1,), (2,)], ["id"])
    result = sync_table(
        df,
        "t4",
        sink=lambda d: d.write.mode("overwrite").parquet(out),
        verify_reader=lambda: spark.read.parquet(out),
        as_of=AS_OF,
    )
    assert result.reconciliation == "2-way"
    assert result.reconciled


def test_sync_tables_parallel_isolates_failures(spark, tmp_path):
    ok_out = str(tmp_path / "ok")
    good = spark.createDataFrame([(1,), (2,), (3,)], ["id"])
    bad = spark.createDataFrame([(1,)], ["id"])

    def boom(_df):
        raise RuntimeError("sink exploded")

    results = sync_tables_parallel(
        {
            "good": (good, lambda d: d.write.mode("overwrite").parquet(ok_out)),
            "bad": (bad, boom),
        },
        max_workers=2,
        as_of=AS_OF,
    )
    # no verify_reader/source_count in the parallel jobs map => written
    # count stands alone; reconciliation honestly reports 'none'
    assert results["good"].error is None and results["good"].written_count == 3
    assert results["good"].reconciliation == "none"
    assert not results["bad"].reconciled
    assert "sink exploded" in results["bad"].error
    # the good table's output landed despite the bad one failing
    assert spark.read.parquet(ok_out).count() == 3


def test_sync_tables_parallel_with_reconciliation(spark, tmp_path):
    """The parallel path accepts per-table verify_readers/source_counts,
    so parallel syncs can report real reconciliation instead of being
    structurally stuck at 'none'."""
    from pyspark.sql import functions as F

    from lcr_etl_upgrade_spark.sync import sync_tables_parallel

    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    df_a = spark.range(5).select(F.col("id"))
    df_b = spark.range(3).select(F.col("id"))
    jobs = {
        "a": (df_a, lambda d: d.write.mode("overwrite").parquet(out_a)),
        "b": (df_b, lambda d: d.write.mode("overwrite").parquet(out_b)),
    }
    results = sync_tables_parallel(
        jobs,
        verify_readers={
            "a": lambda: spark.read.parquet(out_a),
            "b": lambda: spark.read.parquet(out_b),
        },
        source_counts={"a": 5, "b": 3},
    )
    assert results["a"].reconciliation == "3-way"
    assert results["b"].reconciliation == "3-way"
    assert results["a"].written_count == 5
    assert results["b"].verified_count == 3
