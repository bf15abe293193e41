"""ALTER TABLE command family (r12): add/rename/drop column as pure
metaData commits (rename/drop require column mapping; time travel keeps
reading old versions under the old shape), and ADD CONSTRAINT with
existing-data validation (the delta-spark rule; an unvalidated
constraint would retroactively fail later rewrites)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lcr_etl_upgrade_spark.delta_lite import (
    add_check_constraint,
    add_columns,
    drop_check_constraint,
    drop_column,
    read_delta_lite,
    rename_column,
    replay_log,
    table_history,
    update_rows,
    write_delta_lite,
)


def _t(spark, path, mapping=None, n=6):
    df = spark.range(0, n).select(
        "id", (F.col("id") % 3).cast("int").alias("v")
    )
    write_delta_lite(df, path, column_mapping=mapping)
    return df


def test_add_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    _t(spark, path)
    v = add_columns(
        spark, path, [T.StructField("w", T.StringType(), True)]
    )
    assert v == 1
    got = {r["id"]: r["w"] for r in read_delta_lite(spark, path).collect()}
    assert set(got.values()) == {None}
    write_delta_lite(
        spark.range(10, 12).select(
            "id", F.lit(1).cast("int").alias("v"), F.lit("x").alias("w")
        ),
        path,
        mode="append",
    )
    got = {r["id"]: r["w"] for r in read_delta_lite(spark, path).collect()}
    assert got[10] == "x" and got[0] is None
    assert table_history(path)[1]["operation"] == "ADD COLUMNS"
    with pytest.raises(ValueError, match="already exists"):
        add_columns(spark, path, [T.StructField("w", T.LongType(), True)])
    with pytest.raises(ValueError, match="case"):
        add_columns(spark, path, [T.StructField("W2", T.LongType(), True)])
        add_columns(spark, path, [T.StructField("w2", T.LongType(), True)])
    with pytest.raises(ValueError, match="non-nullable"):
        add_columns(spark, path, [T.StructField("q", T.LongType(), False)])
    with pytest.raises(ValueError, match="retroactively"):
        add_columns(
            spark, path,
            [T.StructField(
                "g", T.IntegerType(), True,
                metadata={"delta.generationExpression": "v + 1"},
            )],
        )


def test_add_columns_mapped_fresh_ids(spark, tmp_path):
    path = str(tmp_path / "t")
    _t(spark, path, mapping="name")
    before_max = int(
        replay_log(spark, path).metadata["configuration"][
            "delta.columnMapping.maxColumnId"
        ]
    )
    add_columns(spark, path, [T.StructField("w", T.LongType(), True)])
    st = replay_log(spark, path)
    meta = st.schema["w"].metadata
    assert int(meta["delta.columnMapping.id"]) > before_max
    assert st.schema["w"].metadata["delta.columnMapping.physicalName"]


def test_rename_column_metadata_only(spark, tmp_path):
    path = str(tmp_path / "t")
    _t(spark, path, mapping="name")
    v = rename_column(spark, path, "v", "val")
    got = {r["id"]: r["val"] for r in read_delta_lite(spark, path).collect()}
    assert got == {i: i % 3 for i in range(6)}
    # time travel reads the OLD name at the old version
    old = read_delta_lite(spark, path, version=v - 1)
    assert "v" in old.columns and "val" not in old.columns
    # physical identity kept: same physicalName before and after
    st = replay_log(spark, path)
    assert st.schema["val"].metadata["delta.columnMapping.physicalName"]
    # appends under the new name work
    write_delta_lite(
        spark.range(10, 11).select("id", F.lit(7).cast("int").alias("val")),
        path,
        mode="append",
    )
    assert read_delta_lite(spark, path).filter("id = 10").first()["val"] == 7


def test_rename_refusals(spark, tmp_path):
    path = str(tmp_path / "t")
    _t(spark, path)  # unmapped
    with pytest.raises(NotImplementedError, match="columnMapping"):
        rename_column(spark, path, "v", "val")
    path2 = str(tmp_path / "t2")
    _t(spark, path2, mapping="name")
    add_check_constraint(spark, path2, "vpos", "v >= 0")
    with pytest.raises(ValueError, match="referenced by"):
        rename_column(spark, path2, "v", "val")
    with pytest.raises(ValueError, match="already exists"):
        rename_column(spark, path2, "id", "v")


def test_rename_partition_column(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 8).select(
        "id", (F.col("id") % 2).cast("string").alias("p")
    )
    write_delta_lite(df, path, partition_by=("p",), column_mapping="name")
    rename_column(spark, path, "p", "part")
    st = replay_log(spark, path)
    assert st.partition_columns == ["part"]
    got = read_delta_lite(spark, path).filter("part = '1'").count()
    assert got == 4


def test_drop_column_never_resurrects(spark, tmp_path):
    path = str(tmp_path / "t")
    _t(spark, path, mapping="name")
    v = drop_column(spark, path, "v")
    assert read_delta_lite(spark, path).columns == ["id"]
    # time travel still shows the dropped column
    assert "v" in read_delta_lite(spark, path, version=v - 1).columns
    # re-adding the SAME logical name draws a fresh physical column:
    # the old data must NOT come back
    add_columns(spark, path, [T.StructField("v", T.IntegerType(), True)])
    got = {r["id"]: r["v"] for r in read_delta_lite(spark, path).collect()}
    assert set(got.values()) == {None}
    assert table_history(path)[1]["operation"] == "DROP COLUMNS"


def test_drop_refusals(spark, tmp_path):
    path = str(tmp_path / "t")
    _t(spark, path)
    with pytest.raises(NotImplementedError, match="columnMapping"):
        drop_column(spark, path, "v")
    path2 = str(tmp_path / "t2")
    df = spark.range(0, 4).select(
        "id", (F.col("id") % 2).cast("string").alias("p")
    )
    write_delta_lite(df, path2, partition_by=("p",), column_mapping="name")
    with pytest.raises(ValueError, match="partition"):
        drop_column(spark, path2, "p")
    path3 = str(tmp_path / "t3")
    write_delta_lite(
        spark.range(0, 3).select("id"), path3, column_mapping="name"
    )
    with pytest.raises(ValueError, match="last remaining"):
        drop_column(spark, path3, "id")


def test_add_constraint_validates_and_enforces(spark, tmp_path):
    path = str(tmp_path / "t")
    _t(spark, path)
    v = add_check_constraint(spark, path, "v_ok", "v >= 0")
    st = replay_log(spark, path)
    assert st.metadata["configuration"]["delta.constraints.v_ok"] == "v >= 0"
    assert int(st.protocol["minWriterVersion"]) in (3, 7) or (
        "checkConstraints" in set(st.protocol.get("writerFeatures") or ())
    )
    top = table_history(path)[0]
    assert top["operation"] == "ADD CONSTRAINT"
    # later writes enforce it
    bad = spark.range(20, 21).select("id", F.lit(-5).cast("int").alias("v"))
    with pytest.raises(ValueError, match="constraint"):
        write_delta_lite(bad, path, mode="append")
    with pytest.raises(ValueError, match="constraint"):
        update_rows(spark, path, "id = 1", {"v": F.lit(-9)})
    # violating EXISTING data refuses the add
    with pytest.raises(ValueError, match="existing row"):
        add_check_constraint(spark, path, "v_big", "v > 100")
    with pytest.raises(ValueError, match="already exists"):
        add_check_constraint(spark, path, "V_OK", "v >= 0")
    with pytest.raises(ValueError, match="analyze"):
        add_check_constraint(spark, path, "broken", "nope > 1")
    # drop lifts enforcement
    drop_check_constraint(spark, path, "v_ok")
    write_delta_lite(bad, path, mode="append")
    assert read_delta_lite(spark, path).filter("v = -5").count() == 1
    with pytest.raises(ValueError, match="no constraint"):
        drop_check_constraint(spark, path, "v_ok")


def test_cdf_window_across_rename_refuses(spark, tmp_path):
    """A change-feed window crossing a RENAME/DROP commit refuses with
    the split-the-read remedy (per-commit schemas cannot union)."""
    from lcr_etl_upgrade_spark.delta_lite import read_delta_changes

    path = str(tmp_path / "t")
    _t(spark, path, mapping="name")
    write_delta_lite(
        spark.range(10, 12).select("id", F.lit(0).cast("int").alias("v")),
        path,
        mode="append",
    )
    v = rename_column(spark, path, "v", "val")
    write_delta_lite(
        spark.range(20, 22).select("id", F.lit(1).cast("int").alias("val")),
        path,
        mode="append",
    )
    with pytest.raises(Exception, match="[Ss]chema"):
        read_delta_changes(spark, path, 1, v + 1).collect()
    # split reads on either side work
    assert read_delta_changes(spark, path, 1, v - 1).count() == 2
    assert read_delta_changes(spark, path, v + 1, v + 1).count() == 2
