"""table_detail (DESCRIBE DETAIL parity) and convert_to_delta
(CONVERT TO DELTA: metadata-only onboarding of existing parquet —
the 100 TB point is that no data file is read row-wise or moved)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lcr_etl_upgrade_spark.delta_lite import (
    convert_to_delta,
    delete_rows,
    read_delta_lite,
    replay_log,
    table_detail,
    write_delta_lite,
)


def test_table_detail(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 10).select(
        "id", (F.col("id") % 2).cast("string").alias("p")
    )
    write_delta_lite(df, path, partition_by=("p",))
    d = table_detail(spark, path)
    assert d["format"] == "delta"
    assert d["partitionColumns"] == ["p"]
    assert d["numFiles"] == len(replay_log(spark, path).files)
    assert d["sizeInBytes"] > 0
    assert d["version"] == 0
    assert d["minWriterVersion"] in (2, 7)
    write_delta_lite(df, path, mode="append")
    d2 = table_detail(spark, path)
    assert d2["version"] == 1
    assert d2["numFiles"] > d["numFiles"]
    assert d2["lastModified"] >= d["lastModified"]


def test_convert_flat_parquet(spark, tmp_path):
    raw = str(tmp_path / "raw")
    df = spark.range(0, 100).select(
        "id", (F.col("id") * 2).alias("v")
    )
    df.repartition(4).write.parquet(raw)
    v = convert_to_delta(spark, raw)
    assert v == 0
    got = Counter(
        (r["id"], r["v"]) for r in read_delta_lite(spark, raw).collect()
    )
    assert got == Counter((i, i * 2) for i in range(100))
    # it is a REAL delta table now: stats present, writes work
    st = replay_log(spark, raw)
    assert all("stats" in (st.adds.get(r) or {}) for r in st.files)
    delete_rows(spark, raw, F.col("id") < 10)
    assert read_delta_lite(spark, raw).count() == 90
    write_delta_lite(
        spark.range(1000, 1002).select("id", (F.col("id") * 2).alias("v")),
        raw,
        mode="append",
    )
    assert read_delta_lite(spark, raw).count() == 92
    # refuses a second conversion
    with pytest.raises(ValueError, match="already has a _delta_log"):
        convert_to_delta(spark, raw)


def test_convert_partitioned_parquet(spark, tmp_path):
    raw = str(tmp_path / "raw")
    df = spark.range(0, 40).select(
        "id",
        (F.col("id") % 4).cast("int").alias("bucket"),
    )
    df.write.partitionBy("bucket").parquet(raw)
    v = convert_to_delta(
        spark,
        raw,
        partition_schema=T.StructType(
            [T.StructField("bucket", T.IntegerType())]
        ),
    )
    assert v == 0
    got = read_delta_lite(spark, raw)
    assert got.count() == 40
    # partition pruning works off the converted layout
    assert got.filter("bucket = 1").count() == 10
    st = replay_log(spark, raw)
    assert st.partition_columns == ["bucket"]
    for rel, pv in st.files.items():
        assert "bucket" in pv and pv["bucket"] is not None
    # partitioned layout without the schema refuses... (flat read of a
    # hive dir infers partition col INTO the schema, which clashes)
    raw2 = str(tmp_path / "raw2")
    df.write.partitionBy("bucket").parquet(raw2)
    with pytest.raises(ValueError):
        convert_to_delta(spark, raw2)


def test_convert_empty_dir_refuses(spark, tmp_path):
    raw = str(tmp_path / "nothing")
    import os

    os.makedirs(raw)
    with pytest.raises(ValueError, match="no parquet files"):
        convert_to_delta(spark, raw)
