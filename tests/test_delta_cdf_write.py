"""CDF writer obligations + generated columns.

delete_rows on a table with delta.enableChangeDataFeed=true writes the
newly-deleted rows as _change_data/ parquet + cdc actions in the same
commit (the protocol's requirement for the remove+add-same-path shape,
where naive derivation double-counts); both readers serve the change
files and the snapshot algebra closes over them. Generated columns
(delta.generationExpression) are computed when omitted and validated
when provided, through the same write-time observer as CHECK
constraints.
"""

from __future__ import annotations

import json
import os
from collections import Counter

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lcr_etl_upgrade_spark.delta_lite import (
    delete_rows,
    read_delta_changes,
    read_delta_lite,
    replay_log,
    restore_table,
    write_delta_lite,
)


def _enable_cdf(path: str) -> None:
    import pyspark

    spark = pyspark.sql.SparkSession.getActiveSession()
    state = replay_log(spark, path)
    meta = dict(state.metadata)
    config = dict(meta.get("configuration") or {})
    config["delta.enableChangeDataFeed"] = "true"
    meta["configuration"] = config
    proto = state.protocol or {"minReaderVersion": 1, "minWriterVersion": 2}
    feats = set(proto.get("writerFeatures") or ())
    feats |= {"changeDataFeed", "appendOnly", "invariants"}
    log = os.path.join(path, "_delta_log")
    with open(os.path.join(log, f"{state.version + 1:020d}.json"),
              "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": proto.get("minReaderVersion", 1),
            "minWriterVersion": 7,
            **(
                {"readerFeatures": proto["readerFeatures"]}
                if proto.get("readerFeatures") else {}
            ),
            "writerFeatures": sorted(feats),
        }}) + "\n")
        fh.write(json.dumps({"metaData": meta}) + "\n")


def _snap(spark, path, cols, version=None):
    df = read_delta_lite(spark, path, version=version)
    return Counter(tuple(r[c] for c in cols) for r in df.collect())


def test_delete_writes_change_files(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 20).select("id").coalesce(2), path)
    _enable_cdf(path)
    v = delete_rows(spark, path, F.col("id") % 3 == 0)
    # the commit carries cdc actions and the files exist
    with open(os.path.join(path, "_delta_log",
                           f"{v:020d}.json")) as fh:
        actions = [json.loads(l) for l in fh if l.strip()]
    cdc = [a["cdc"] for a in actions if "cdc" in a]
    assert cdc, "CDF-enabled delete must write cdc actions"
    for c in cdc:
        assert c["path"].startswith("_change_data/")
        assert os.path.exists(os.path.join(path, c["path"]))
        assert c["dataChange"] is False
    # the reader serves the change files: exactly the deleted rows
    ch = read_delta_changes(spark, path, v, v).collect()
    assert all(r["_change_type"] == "delete" for r in ch)
    assert Counter(r["id"] for r in ch) == Counter(range(0, 20, 3))
    # arrow oracle agrees
    from lcr_etl_upgrade_spark.cdf_arrow import arrow_changes

    arrows = Counter(
        t[0] for t in arrow_changes(path, v, v) if t[1] == "delete"
    )
    assert arrows == Counter(range(0, 20, 3))
    # snapshot algebra
    assert _snap(spark, path, ["id"]) == Counter(
        {(i,): 1 for i in range(20) if i % 3}
    )


def test_second_delete_reports_newly_deleted_only(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 12).select("id").coalesce(1), path)
    _enable_cdf(path)
    v1 = delete_rows(spark, path, F.col("id") < 4)
    # second predicate overlaps the first: only 4..5 are NEW deletes
    v2 = delete_rows(spark, path, F.col("id") < 6)
    ch = read_delta_changes(spark, path, v2, v2).collect()
    assert Counter(r["id"] for r in ch) == Counter({4: 1, 5: 1})
    ch1 = read_delta_changes(spark, path, v1, v1).collect()
    assert Counter(r["id"] for r in ch1) == Counter(range(4))


def test_partitioned_cdf_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(
        spark.range(0, 20).select(
            "id", (F.col("id") % 2).cast("string").alias("p")
        ),
        path,
        partition_by=("p",),
    )
    _enable_cdf(path)
    v = delete_rows(spark, path, F.col("id") >= 16)
    ch = read_delta_changes(spark, path, v, v).collect()
    got = Counter((r["id"], r["p"]) for r in ch)
    assert got == Counter(
        {(i, str(i % 2)): 1 for i in range(16, 20)}
    )
    # change files live under hive partition dirs of _change_data
    with open(os.path.join(path, "_delta_log",
                           f"{v:020d}.json")) as fh:
        actions = [json.loads(l) for l in fh if l.strip()]
    for a in actions:
        if "cdc" in a:
            assert a["cdc"]["partitionValues"] in ({"p": "0"}, {"p": "1"})


def test_cdf_disabled_delete_writes_no_change_files(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 10).select("id").coalesce(1), path)
    v = delete_rows(spark, path, F.col("id") < 3)
    with open(os.path.join(path, "_delta_log",
                           f"{v:020d}.json")) as fh:
        assert not any(
            "cdc" in json.loads(l) for l in fh if l.strip()
        )
    assert not os.path.isdir(os.path.join(path, "_change_data"))
    # derivation (DV diff) still serves the rows
    ch = read_delta_changes(spark, path, v, v).collect()
    assert Counter(r["id"] for r in ch) == Counter(range(3))


def test_restore_refuses_dv_revert_on_cdf_table(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 10).select("id").coalesce(1), path)
    _enable_cdf(path)
    delete_rows(spark, path, F.col("id") < 5)
    with pytest.raises(NotImplementedError, match="change files"):
        restore_table(spark, path, 1)
    # pure add/remove restores stay allowed (derivation exact)
    path2 = str(tmp_path / "t2")
    write_delta_lite(spark.range(0, 5).select("id"), path2)
    write_delta_lite(
        spark.range(5, 8).select("id"), path2, mode="append"
    )
    _enable_cdf(path2)
    res = restore_table(spark, path2, 0)
    assert res["version"] is not None
    assert _snap(spark, path2, ["id"]) == Counter(
        {(i,): 1 for i in range(5)}
    )


def _generated_table(spark, path, partitioned=False):
    schema = T.StructType([
        T.StructField("ts", T.LongType(), True),
        T.StructField(
            "bucket", T.LongType(), True,
            {"delta.generationExpression": "ts % 4"},
        ),
    ])
    df = spark.createDataFrame(
        [(i, i % 4) for i in range(8)], schema
    )
    write_delta_lite(
        df, path, partition_by=("bucket",) if partitioned else ()
    )


def test_generated_column_computed_when_omitted(spark, tmp_path):
    path = str(tmp_path / "t")
    _generated_table(spark, path)
    write_delta_lite(
        spark.createDataFrame([(100,), (101,)], "ts long"),
        path,
        mode="append",
    )
    rows = {
        (r["ts"], r["bucket"])
        for r in read_delta_lite(spark, path).collect()
    }
    assert (100, 0) in rows and (101, 1) in rows


def test_generated_partition_column_computed(spark, tmp_path):
    path = str(tmp_path / "t")
    _generated_table(spark, path, partitioned=True)
    write_delta_lite(
        spark.createDataFrame([(102,)], "ts long"), path, mode="append"
    )
    state = replay_log(spark, path)
    assert state.partition_columns == ["bucket"]
    rows = {
        (r["ts"], r["bucket"])
        for r in read_delta_lite(spark, path).collect()
    }
    assert (102, 2) in rows


def test_generated_column_validated_when_provided(spark, tmp_path):
    path = str(tmp_path / "t")
    _generated_table(spark, path)
    with pytest.raises(ValueError, match="generated\\(bucket\\)"):
        write_delta_lite(
            spark.createDataFrame(
                [(100, 3)], "ts long, bucket long"
            ),
            path,
            mode="append",
        )
    # matching values pass
    write_delta_lite(
        spark.createDataFrame([(100, 0)], "ts long, bucket long"),
        path,
        mode="append",
    )


def test_generated_violation_on_create_too(spark, tmp_path):
    schema = T.StructType([
        T.StructField("ts", T.LongType(), True),
        T.StructField(
            "bucket", T.LongType(), True,
            {"delta.generationExpression": "ts % 4"},
        ),
    ])
    bad = spark.createDataFrame([(5, 0)], schema)
    with pytest.raises(ValueError, match="generated\\(bucket\\)"):
        write_delta_lite(bad, str(tmp_path / "t"))


def test_vacuum_keeps_live_change_files(spark, tmp_path):
    """cdc files are referenced only by their commit's cdc actions
    (checkpoints never carry cdc — it is transient log state): vacuum
    must count those references or it reclaims live change data out
    from under CDF readers. Once cleanup_log drops the commit, the
    window is unreadable anyway and the orphaned cdc files go too."""
    from lcr_etl_upgrade_spark.delta_lite import (
        cleanup_log,
        vacuum,
        write_checkpoint,
    )

    path = str(tmp_path / "t")
    write_delta_lite(spark.range(0, 10).select("id").coalesce(1), path)
    _enable_cdf(path)
    v = delete_rows(spark, path, F.col("id") < 4)
    cdc_dir = os.path.join(path, "_change_data")
    before = sorted(os.listdir(cdc_dir))
    assert before
    assert vacuum(spark, path) == []
    assert sorted(os.listdir(cdc_dir)) == before
    # the window still serves from the change files post-vacuum
    ch = read_delta_changes(spark, path, v, v).collect()
    assert sorted(r["id"] for r in ch) == [0, 1, 2, 3]
    # advance a version so the delete commit sits BELOW the checkpoint,
    # then cleanup retires its JSON -> the cdc files are genuinely
    # orphaned (their window is unreadable) and vacuum reclaims them
    write_delta_lite(
        spark.range(50, 52).select("id"), path, mode="append"
    )
    write_checkpoint(spark, path)
    gone = cleanup_log(spark, path)
    assert f"{v:020d}.json" in gone
    removed = vacuum(spark, path)
    assert any(r.startswith("_change_data/") for r in removed)


def test_mapped_cdf_delete_roundtrip(spark, tmp_path):
    """Column mapping x CDF: the change files carry PHYSICAL column
    names (like the data files beside them) and both readers rename to
    logical on the way out; partitionValues in the cdc action use the
    physical partition key."""
    path = str(tmp_path / "t")
    write_delta_lite(
        spark.range(0, 12).select(
            "id", (F.col("id") % 2).cast("string").alias("p")
        ),
        path,
        partition_by=("p",),
        column_mapping="name",
    )
    _enable_cdf(path)
    v = delete_rows(spark, path, F.col("id") >= 8)
    with open(os.path.join(path, "_delta_log",
                           f"{v:020d}.json")) as fh:
        actions = [json.loads(l) for l in fh if l.strip()]
    cdc = [a["cdc"] for a in actions if "cdc" in a]
    assert cdc
    for c in cdc:
        for k in c["partitionValues"]:
            assert k.startswith("col-")  # physical partition key
    ch = read_delta_changes(spark, path, v, v).collect()
    assert Counter((r["id"], r["p"]) for r in ch) == Counter(
        {(i, str(i % 2)): 1 for i in range(8, 12)}
    )
    from lcr_etl_upgrade_spark.cdf_arrow import arrow_changes, change_schema

    names = [f.name for f in change_schema(path).fields]
    i_id, i_p = names.index("id"), names.index("p")
    arrows = Counter(
        (t[i_id], t[i_p]) for t in arrow_changes(path, v, v)
    )
    assert arrows == Counter({(i, str(i % 2)): 1 for i in range(8, 12)})
