"""Source/sink registries (S1-S8 / K1-K5 semantics, local formats)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import types as T

from lcr_etl_upgrade_spark.sinks import get_sink, write
from lcr_etl_upgrade_spark.sinks.registry import write_single_text_file
from lcr_etl_upgrade_spark.sources.registry import (
    read_csv,
    read_json,
    read_watermark_text,
)


def test_parquet_sink_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    write(df, "parquet_overwrite", path)
    assert spark.read.parquet(path).count() == 2
    write(df, "parquet_append", path)
    assert spark.read.parquet(path).count() == 4
    # K3 truncate-then-load: end state is exactly the new batch
    write(df, "parquet_truncate_load", path)
    assert spark.read.parquet(path).count() == 2


def test_unknown_sink_raises():
    with pytest.raises(KeyError, match="unknown sink"):
        get_sink("snowflake")  # not a thing locally


def test_csv_declared_schema_no_inference(spark, tmp_path):
    path = str(tmp_path / "c")
    spark.createDataFrame([("1", "x"), ("oops", "y")], ["n", "s"]).write.mode(
        "overwrite"
    ).csv(path, header=True)
    schema = T.StructType(
        [T.StructField("n", T.IntegerType()), T.StructField("s", T.StringType())]
    )
    got = {r.s: r.n for r in read_csv(spark, path, schema).collect()}
    assert got["x"] == 1
    assert got["y"] is None  # PERMISSIVE: malformed cell -> null, row kept


def test_json_multiline_permissive(spark, tmp_path):
    path = str(tmp_path / "j")
    (tmp_path / "j").mkdir()
    (tmp_path / "j" / "data.json").write_text(
        '[{"a": 1, "meta": {"k": "v"}},\n {"a": 2, "meta": null}]'
    )
    got = read_json(spark, path, multi_line=True).orderBy("a").collect()
    assert [r.a for r in got] == [1, 2]
    assert got[0].meta.k == "v"


def test_watermark_text_roundtrip(spark, tmp_path):
    path = str(tmp_path / "wm")
    df = spark.createDataFrame([("2024-06-01 00:00:00",)], ["value"])
    write_single_text_file(df, path)
    assert read_watermark_text(spark, path) == "2024-06-01 00:00:00"
    import glob

    assert len(glob.glob(f"{path}/part-*")) == 1  # coalesce(1): single file


def test_delta_sink_resolves_without_delta_spark(spark):
    """delta-spark is not installed here, but the delta sinks no longer
    gate on it: they resolve to the protocol-native delta_lite writer
    (roundtrip + semantics covered in tests/test_delta_lite.py)."""
    from lcr_etl_upgrade_spark.sinks.registry import _DeltaLiteSink

    assert isinstance(get_sink("delta_overwrite"), _DeltaLiteSink)
    assert isinstance(get_sink("delta_append"), _DeltaLiteSink)


def test_csv_corrupt_record_capture(spark, tmp_path):
    """PERMISSIVE + _corrupt_record: malformed lines are quarantined
    whole, not silently nulled (SURVEY.md §4 error-tolerance upgrade)."""
    from pyspark.sql import types as T

    from lcr_etl_upgrade_spark.sources.registry import read_csv

    p = tmp_path / "dirty.csv"
    p.write_text("id,amount\n1,10.5\nnot_a_number_row,xx\n3,7.25\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("amount", T.DoubleType(), True),
        ]
    )
    df = read_csv(spark, str(p), schema=schema, capture_corrupt=True).cache()
    good = df.filter(df._corrupt_record.isNull())
    bad = df.filter(df._corrupt_record.isNotNull())
    assert sorted(r.id for r in good.collect()) == [1, 3]
    assert [r._corrupt_record for r in bad.collect()] == ["not_a_number_row,xx"]
    df.unpersist()


def test_json_corrupt_record_capture(spark, tmp_path):
    from pyspark.sql import types as T

    from lcr_etl_upgrade_spark.sources.registry import read_json

    p = tmp_path / "dirty.jsonl"
    p.write_text('{"id": 1, "v": "a"}\n{broken json!!\n{"id": 3, "v": "c"}\n')
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("v", T.StringType(), True),
        ]
    )
    df = read_json(spark, str(p), schema=schema, capture_corrupt=True).cache()
    assert sorted(r.id for r in df.filter(df._corrupt_record.isNull()).collect()) == [1, 3]
    assert df.filter(df._corrupt_record.isNotNull()).count() == 1
    df.unpersist()


def test_orc_roundtrip_with_declared_schema(spark, tmp_path):
    from lcr_etl_upgrade_spark.sources.registry import read_orc

    path = str(tmp_path / "o")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.DecimalType(38, 0)),
            T.StructField("flag", T.BooleanType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, Decimal(10), True), (2, None, False)], schema
    )
    write(df, "orc_overwrite", path)
    back = read_orc(spark, path, schema)
    assert back.schema == schema  # declared, not inferred
    assert {r.id: (r.amount, r.flag) for r in back.collect()} == {
        1: (Decimal(10), True),
        2: (None, False),
    }
    write(df, "orc_append", path)
    assert read_orc(spark, path).count() == 4


def test_orc_predicate_pushdown_reaches_scan(spark, tmp_path):
    from lcr_etl_upgrade_spark.sources.registry import read_orc

    path = str(tmp_path / "op")
    spark.range(100).selectExpr("id", "id % 7 as k").write.mode("overwrite").orc(path)
    plan = (
        read_orc(spark, path)
        .filter("id > 90")
        .select("id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,90)" in plan


def test_avro_gated_or_working(spark, tmp_path):
    """Avro roundtrips either way: through the spark-avro datasource when
    on the classpath, else through the container-native avro_lite
    fallback (tests/test_avro_lite.py covers that path in depth) — the
    NotImplementedError branch remains only for environments where the
    fallback itself is unavailable."""
    from lcr_etl_upgrade_spark.sources.registry import read_avro

    path = str(tmp_path / "a")
    df = spark.createDataFrame([(1, "x")], ["id", "v"])
    try:
        write(df, "avro_overwrite", path)
    except NotImplementedError as exc:
        assert "spark-avro" in str(exc)
        with pytest.raises(NotImplementedError, match="spark-avro"):
            read_avro(spark, str(tmp_path / "missing"))
        return
    assert read_avro(spark, path).collect() == df.collect()


def test_text_documents_whole_file_and_lines(spark, tmp_path):
    from lcr_etl_upgrade_spark.sources.registry import read_text_documents

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "doc1.txt").write_text("alpha beta\ngamma")
    (corpus / "doc2.txt").write_text("delta")
    whole = read_text_documents(spark, str(corpus), whole_file=True)
    by_path = {r.doc_path.rsplit("/", 1)[-1]: r.text for r in whole.collect()}
    assert by_path == {"doc1.txt": "alpha beta\ngamma", "doc2.txt": "delta"}
    lines = read_text_documents(spark, str(corpus), whole_file=False)
    assert sorted(r.text for r in lines.collect()) == [
        "alpha beta",
        "delta",
        "gamma",
    ]


def test_avro_gate_matches_only_missing_datasource():
    """raise_if_missing_avro must rewrap ONLY the missing-datasource
    condition; an unrelated Avro failure whose text contains 'find'
    passes through untouched (no misleading classpath remedy)."""
    from lcr_etl_upgrade_spark.sources.registry import raise_if_missing_avro

    # unrelated error mentioning both words: NOT rewrapped
    raise_if_missing_avro(
        Exception("could not find field 'x' in avro record schema")
    )

    # the real condition by message (both historical wordings)
    for msg in (
        "[DATA_SOURCE_NOT_FOUND] Failed to find the data source: avro.",
        "Failed to find data source: avro. Please find packages at ...",
    ):
        with pytest.raises(NotImplementedError, match="spark-avro"):
            raise_if_missing_avro(Exception(msg))

    # the real condition by error class, terse message
    class _CondExc(Exception):
        def getCondition(self):
            return "DATA_SOURCE_NOT_FOUND"

    with pytest.raises(NotImplementedError, match="spark-avro"):
        raise_if_missing_avro(_CondExc("avro"))


def test_capture_corrupt_requires_schema(spark, tmp_path):
    """capture_corrupt=True with no declared schema must refuse loudly —
    it used to be silently ignored, dropping the requested quarantine."""
    from lcr_etl_upgrade_spark.sources.registry import read_csv, read_json

    p = str(tmp_path / "x.csv")
    with open(p, "w") as fh:
        fh.write("a,b\n1,2\n")
    with pytest.raises(ValueError, match="requires a declared schema"):
        read_csv(spark, p, capture_corrupt=True)
    with pytest.raises(ValueError, match="requires a declared schema"):
        read_json(spark, p, capture_corrupt=True)


def test_jdbc_partition_column_requires_bounds():
    """partition_column without bounds used to ship the literal string
    'None' to the JVM and die with a NumberFormatException at load."""
    from lcr_etl_upgrade_spark.sources.registry import JdbcSource

    src = JdbcSource(url="jdbc:derby:memory:x", table="t",
                     partition_column="id")
    with pytest.raises(ValueError, match="requires lower_bound"):
        src.load(None)
