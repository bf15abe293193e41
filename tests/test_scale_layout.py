"""Physical-layout scale levers: partition pruning and bucketed
(shuffle-free) joins — the two storage-side tools that matter most at
100 TB, verified by inspecting the executed plan, not just results.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning_hits_only_selected_partitions(spark, tmp_path):
    """A filter on the partition column must prune at planning time:
    the scan's PartitionFilters carry the predicate and the row count
    comes from the one selected partition only."""
    out = str(tmp_path / "events_by_type")
    df = spark.createDataFrame(
        [(i, "click" if i % 3 else "view", float(i)) for i in range(300)],
        "event_id long, event_type string, value double",
    )
    df.write.partitionBy("event_type").mode("overwrite").parquet(out)

    reread = spark.read.parquet(out).filter(F.col("event_type") == "view")
    assert reread.count() == 100

    plan = _executed_plan(reread)
    # datasource v1 parquet scan reports pruned partition predicates
    assert "PartitionFilters" in plan and "event_type" in plan
    # the data-column filter must NOT appear as a post-scan filter on rows
    # (pruning happens before reading, so no Filter node over event_type)
    scan_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "view" in scan_line or "isnotnull(event_type" in scan_line


def test_bucketed_join_runs_without_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key co-locate: the sort-merge join
    consumes bucket layout directly — NO Exchange (shuffle) in the plan.
    This is the 'pre-partition your biggest joins' lever from the brief."""
    import shutil

    # bucketBy requires managed tables; clear both catalog entry and any
    # orphaned warehouse location from a previous interrupted run
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    orders = spark.createDataFrame(
        [(i, f"p{i % 5}") for i in range(1000)], "o_orderkey long, prio string"
    )
    lineitem = spark.createDataFrame(
        [(i % 1000, float(i)) for i in range(5000)],
        "l_orderkey long, amount double",
    )
    from lcr_etl_upgrade_spark.sinks.registry import write_bucketed

    write_bucketed(orders, "b_orders", 8, ["o_orderkey"], ["o_orderkey"])
    write_bucketed(
        lineitem, "b_lineitem", 8, ["l_orderkey"], ["l_orderkey"]
    )
    joined = (
        spark.table("b_lineitem")
        .join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("prio")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # correctness first
    got = {r.prio: r.n for r in joined.collect()}
    assert sum(got.values()) == 5000

    # the join itself must not shuffle either side: with both tables
    # bucketed into the same bucket count on the join keys, a sort-merge
    # join consumes the bucket layout directly. Disable broadcast so the
    # small test tables take the same path big tables would.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _executed_plan(
            spark.table("b_lineitem").join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange" not in plan, plan
