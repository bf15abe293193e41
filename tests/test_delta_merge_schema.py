"""write_delta_lite(merge_schema=True): schema evolution on append.

Invariants: new columns join the table schema as NULLABLE in the same
commit (old files read them as null); omitted nullable columns are
absent from the new files and read back as null; type changes, case
clashes, omitted non-nullable columns and invariant-bearing new columns
refuse; column-mapped tables assign FRESH ids above maxColumnId to the
new columns while existing assignments stay byte-stable; losing the
commit race on a schema-evolving append refuses instead of retrying.

delta-spark mergeSchema parity, re-expressed on the public protocol.
"""

from __future__ import annotations

import json
import os
from collections import Counter

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lcr_etl_upgrade_spark.delta_lite import (
    read_delta_lite,
    replay_log,
    write_delta_lite,
)


def _rows(spark, path, cols, version=None):
    df = read_delta_lite(spark, path, version=version)
    return Counter(tuple(r[c] for c in cols) for r in df.collect())


def test_new_column_joins_schema_old_rows_null(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 5).select("id"), path)
    write_delta_lite(
        spark.range(5, 8).select("id", F.lit("x").alias("tag")),
        path,
        mode="append",
        merge_schema=True,
    )
    state = replay_log(spark, path)
    assert [f.name for f in state.schema.fields] == ["id", "tag"]
    tag = state.schema["tag"]
    assert tag.nullable is True
    got = _rows(spark, path, ("id", "tag"))
    want = Counter({(i, None): 1 for i in range(5)})
    want.update({(i, "x"): 1 for i in range(5, 8)})
    assert got == want
    # time travel to the pre-evolution version keeps the OLD schema
    v0 = read_delta_lite(spark, path, version=0)
    assert v0.columns == ["id"]


def test_without_flag_still_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 5).select("id"), path)
    with pytest.raises(ValueError, match="merge_schema=True"):
        write_delta_lite(
            spark.range(5, 8).select("id", F.lit("x").alias("tag")),
            path,
            mode="append",
        )


def test_omitted_nullable_column_reads_null(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(
        spark.createDataFrame(
            [(i, "a") for i in range(4)], "id long, s string"
        ),
        path,
    )
    write_delta_lite(
        spark.range(10, 12).select("id"),
        path,
        mode="append",
        merge_schema=True,
    )
    got = _rows(spark, path, ("id", "s"))
    want = Counter({(i, "a"): 1 for i in range(4)})
    want.update({(i, None): 1 for i in (10, 11)})
    assert got == want
    # schema unchanged: nothing was added
    assert [f.name for f in replay_log(spark, path).schema.fields] == [
        "id", "s",
    ]


def test_omitted_non_nullable_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a")],
        T.StructType([
            T.StructField("id", T.LongType(), False),
            T.StructField("s", T.StringType(), True),
        ]),
    )
    write_delta_lite(df, path)
    with pytest.raises(ValueError, match="non-nullable"):
        write_delta_lite(
            spark.createDataFrame([("b",)], "s string"),
            path,
            mode="append",
            merge_schema=True,
        )


def test_case_clash_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 3).select("id"), path)
    with pytest.raises(ValueError, match="case"):
        write_delta_lite(
            spark.range(3, 5).select("id", F.lit(1).alias("ID2"),
                                     F.lit(2).alias("Id")),
            path,
            mode="append",
            merge_schema=True,
        )


def test_type_change_still_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(
        spark.range(0, 3).select("id", F.lit(1).alias("v")), path
    )
    with pytest.raises(ValueError, match="type mismatch"):
        write_delta_lite(
            spark.range(3, 5).select(
                "id", F.lit("s").alias("v"), F.lit(0.5).alias("w")
            ),
            path,
            mode="append",
            merge_schema=True,
        )


def test_merge_schema_on_overwrite_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    with pytest.raises(ValueError, match="append"):
        write_delta_lite(
            spark.range(0, 3).select("id"), path, merge_schema=True
        )


def test_partition_column_required(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(
        spark.range(0, 6).select(
            "id", (F.col("id") % 2).cast("string").alias("p")
        ),
        path,
        partition_by=("p",),
    )
    with pytest.raises(ValueError, match="partition columns"):
        write_delta_lite(
            spark.range(6, 8).select("id"),
            path,
            mode="append",
            merge_schema=True,
        )


def test_mapped_table_fresh_ids_stable_existing(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(
        spark.range(0, 4).select("id"), path, column_mapping="name"
    )
    before = replay_log(spark, path)
    id_before = before.schema["id"].metadata
    max_before = int(
        before.metadata["configuration"]["delta.columnMapping.maxColumnId"]
    )
    write_delta_lite(
        spark.range(4, 6).select("id", F.lit(7).alias("v")),
        path,
        mode="append",
        merge_schema=True,
    )
    after = replay_log(spark, path)
    # existing assignment byte-stable
    assert after.schema["id"].metadata == id_before
    v_meta = after.schema["v"].metadata
    assert int(v_meta["delta.columnMapping.id"]) > max_before
    assert v_meta["delta.columnMapping.physicalName"].startswith("col-")
    assert int(
        after.metadata["configuration"]["delta.columnMapping.maxColumnId"]
    ) >= int(v_meta["delta.columnMapping.id"])
    got = _rows(spark, path, ("id", "v"))
    want = Counter({(i, None): 1 for i in range(4)})
    want.update({(i, 7): 1 for i in (4, 5)})
    assert got == want


def test_mapped_omitted_column_staged_as_null(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(
        spark.createDataFrame(
            [(i, "a") for i in range(3)], "id long, s string"
        ),
        path,
        column_mapping="id",
    )
    write_delta_lite(
        spark.range(10, 12).select("id"),
        path,
        mode="append",
        merge_schema=True,
    )
    got = _rows(spark, path, ("id", "s"))
    want = Counter({(i, "a"): 1 for i in range(3)})
    want.update({(i, None): 1 for i in (10, 11)})
    assert got == want


def test_evolving_append_refuses_lost_race(spark, tmp_path, monkeypatch):
    import lcr_etl_upgrade_spark.delta_lite as dl

    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 3).select("id"), path)
    # simulate losing the version race: the first commit attempt finds
    # the slot taken (as if a concurrent writer won between replay and
    # commit) — a plain append would retry; an evolving one must refuse
    real = dl._write_commit_file
    calls = {"n": 0}

    def racing(commit_path, actions):
        calls["n"] += 1
        if calls["n"] == 1:
            raise FileExistsError(commit_path)
        real(commit_path, actions)

    monkeypatch.setattr(dl, "_write_commit_file", racing)
    with pytest.raises(FileExistsError, match="single-writer"):
        write_delta_lite(
            spark.range(3, 5).select("id", F.lit(1).alias("v")),
            path,
            mode="append",
            merge_schema=True,
        )
    assert calls["n"] == 1  # refused, never retried
    # nothing half-committed: table still reads at the old schema
    assert read_delta_lite(spark, path).columns == ["id"]
    # and the staged parquet files were rolled back
    stray = [
        f for f in os.listdir(path)
        if f.endswith(".parquet")
        and f not in {
            os.path.basename(r)
            for r in replay_log(spark, path).files
        }
    ]
    assert stray == []


def test_checkpoint_after_evolution_roundtrips(spark, tmp_path):
    from lcr_etl_upgrade_spark.delta_lite import write_checkpoint

    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 3).select("id"), path)
    write_delta_lite(
        spark.range(3, 5).select("id", F.lit(2.5).alias("x")),
        path,
        mode="append",
        merge_schema=True,
    )
    write_checkpoint(spark, path)
    # drop the pre-checkpoint commits: replay must come from the
    # checkpoint alone and still carry the evolved schema
    got = _rows(spark, path, ("id", "x"))
    want = Counter({(i, None): 1 for i in range(3)})
    want.update({(i, 2.5): 1 for i in (3, 4)})
    assert got == want
    state = replay_log(spark, path)
    assert [f.name for f in state.schema.fields] == ["id", "x"]


def test_sink_mergeschema_option_passes_through(spark, tmp_path):
    """delta-spark's mergeSchema WRITE OPTION works through the sink
    registry's delta_lite path too — the same sink config evolves the
    schema under either runtime."""
    from lcr_etl_upgrade_spark.sinks.registry import write

    path = str(tmp_path / "t")
    write(spark.range(0, 3).select("id"), "delta_overwrite", path)
    with pytest.raises(ValueError, match="merge_schema=True"):
        write(
            spark.range(3, 5).select("id", F.lit(1).alias("v")),
            "delta_append",
            path,
        )
    write(
        spark.range(3, 5).select("id", F.lit(1).alias("v")),
        "delta_append",
        path,
        mergeSchema="true",
    )
    got = {
        (r["id"], r["v"])
        for r in read_delta_lite(spark, path).collect()
    }
    assert got == {(0, None), (1, None), (2, None), (3, 1), (4, 1)}
