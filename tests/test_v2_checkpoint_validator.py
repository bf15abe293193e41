"""The independent checkpoint-WRITE validator (round-10 verdict ask #2)
must pass every layout the engine's write_checkpoint emits — and fail
loudly on deliberate corruptions (the detection-power half).

tools/v2_checkpoint_validator.py imports NOTHING from
lcr_etl_upgrade_spark: pyarrow + json only, with its own restatement of
the protocol's JSON log replay. These tests author tables through the
ENGINE (the thing under validation) and judge the written bytes with
the INDEPENDENT implementation.
"""

from __future__ import annotations

import json
import os

from lcr_etl_upgrade_spark.delta_lite import (
    delete_rows,
    enable_v2_checkpoint,
    write_checkpoint,
    write_delta_lite,
)
from tools.v2_checkpoint_validator import validate_table


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def test_classic_plain_layout(spark, tmp_path):
    path = str(tmp_path / "plain")
    write_delta_lite(_df(spark, [(1, "a"), (2, "b")]), path)
    write_delta_lite(_df(spark, [(3, "c")]), path, mode="append")
    write_checkpoint(spark, path)
    r = validate_table(path)
    assert r["ok"], r
    assert r["layout"] == "classic"
    assert r["n_files"] >= 2


def test_classic_feature_aware_dv_layout(spark, tmp_path):
    path = str(tmp_path / "dv")
    write_delta_lite(_df(spark, [(i, f"n{i}") for i in range(10)]), path)
    delete_rows(spark, path, "id < 3")
    write_checkpoint(spark, path)
    r = validate_table(path)
    assert r["ok"], r
    assert r["layout"] == "classic"


def test_v2_sidecar_layout(spark, tmp_path):
    path = str(tmp_path / "v2")
    write_delta_lite(_df(spark, [(1, "a")]), path)
    write_delta_lite(_df(spark, [(2, "b")]), path, mode="append")
    enable_v2_checkpoint(spark, path)
    write_checkpoint(spark, path)
    r = validate_table(path)
    assert r["ok"], r
    assert r["layout"] == "v2"
    assert r["n_files"] >= 2


def test_v2_empty_table_manifest_only(spark, tmp_path):
    path = str(tmp_path / "v2empty")
    write_delta_lite(_df(spark, []), path)
    enable_v2_checkpoint(spark, path)
    write_checkpoint(spark, path)
    r = validate_table(path)
    assert r["ok"], r
    assert r["layout"] == "v2"
    # an empty-df overwrite still commits (empty) part files; the
    # validator only cares that whatever file set exists round-trips
    assert r["n_files"] >= 0


def test_v2_mapped_dv_layout(spark, tmp_path):
    path = str(tmp_path / "v2mapped")
    write_delta_lite(
        _df(spark, [(i, f"n{i}") for i in range(8)]), path,
        column_mapping="name",
    )
    delete_rows(spark, path, "id = 4")
    enable_v2_checkpoint(spark, path)
    write_checkpoint(spark, path)
    r = validate_table(path)
    assert r["ok"], r
    assert r["layout"] == "v2"


def test_v2_rowtracking_foreign_adds(spark, tmp_path):
    """rowTracking per-file state (baseRowId/defaultRowCommitVersion)
    plus stats/tags must survive into the checkpoint losslessly — the
    INDEPENDENT replay is the judge, not the engine's reader."""
    path = tmp_path / "rt"
    (path / "_delta_log").mkdir(parents=True)
    sub = path / "stage"
    spark.range(5).coalesce(1).write.parquet(str(sub))
    f = next(n for n in os.listdir(sub) if n.endswith(".parquet"))
    os.rename(sub / f, path / "part-0.parquet")
    meta = {
        "id": "0000", "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps({"type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}}]}),
        "partitionColumns": [], "configuration": {},
    }
    with open(path / "_delta_log" / f"{0:020d}.json", "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["v2Checkpoint"],
            "writerFeatures": ["v2Checkpoint", "rowTracking"],
        }}) + "\n")
        fh.write(json.dumps({"metaData": {
            **meta, "configuration": {"delta.checkpointPolicy": "v2"},
        }}) + "\n")
        fh.write(json.dumps({"add": {
            "path": "part-0.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True,
            "baseRowId": 17, "defaultRowCommitVersion": 0,
            "stats": json.dumps({"numRecords": 5}),
            "tags": {"k": "v"}}}) + "\n")
        fh.write(json.dumps({"txn": {
            "appId": "app-1", "version": 9}}) + "\n")
        fh.write(json.dumps({"domainMetadata": {
            "domain": "delta.rowTracking",
            "configuration": json.dumps({"rowIdHighWaterMark": 21}),
            "removed": False}}) + "\n")
    write_checkpoint(spark, str(path))
    r = validate_table(str(path))
    assert r["ok"], r
    assert r["layout"] == "v2"


# ---- detection power: deliberate corruptions must be flagged -------------


def _v2_table(spark, tmp_path, name="t"):
    path = str(tmp_path / name)
    write_delta_lite(_df(spark, [(1, "a"), (2, "b")]), path)
    enable_v2_checkpoint(spark, path)
    write_checkpoint(spark, path)
    return path


def test_detects_wrong_last_checkpoint_size(spark, tmp_path):
    path = _v2_table(spark, tmp_path)
    lc = os.path.join(path, "_delta_log", "_last_checkpoint")
    rec = json.load(open(lc))
    rec["size"] += 1
    json.dump(rec, open(lc, "w"))
    r = validate_table(path)
    assert not r["ok"] and any("C1" in v for v in r["violations"]), r


def test_detects_dangling_sidecar(spark, tmp_path):
    path = _v2_table(spark, tmp_path)
    sc_dir = os.path.join(path, "_delta_log", "_sidecars")
    for f in os.listdir(sc_dir):
        os.remove(os.path.join(sc_dir, f))
    r = validate_table(path)
    assert not r["ok"] and any("C4" in v for v in r["violations"]), r


def test_detects_v2_actions_under_classic_name(spark, tmp_path):
    path = _v2_table(spark, tmp_path)
    log = os.path.join(path, "_delta_log")
    man = next(f for f in os.listdir(log)
               if ".checkpoint." in f and f.count(".") > 2)
    v = int(man.split(".")[0])
    os.rename(os.path.join(log, man),
              os.path.join(log, f"{v:020d}.checkpoint.parquet"))
    r = validate_table(path)
    assert not r["ok"], r


def test_detects_state_divergence(spark, tmp_path):
    """Appending an extra add to a pre-checkpoint commit makes the JSON
    replay diverge from the checkpoint: C6 must fire."""
    path = _v2_table(spark, tmp_path)
    log = os.path.join(path, "_delta_log")
    with open(os.path.join(log, f"{1:020d}.json"), "a") as fh:
        fh.write(json.dumps({"add": {
            "path": "ghost.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True}}) + "\n")
    r = validate_table(path)
    assert not r["ok"] and any("C6" in v for v in r["violations"]), r


def test_detects_policy_v2_with_classic_layout(spark, tmp_path):
    """A feature-listed policy=v2 table whose checkpoint came out
    classic (a layout-switch bug class) must be flagged by C3."""
    path = str(tmp_path / "clv2")
    write_delta_lite(_df(spark, [(1, "a")]), path)
    write_checkpoint(spark, path)  # classic, correctly (no feature yet)
    enable_v2_checkpoint(spark, path)
    # simulate the buggy writer: point _last_checkpoint at the OLD
    # classic checkpoint as if it had been written after enablement
    log = os.path.join(path, "_delta_log")
    cp = next(f for f in os.listdir(log) if f.endswith(".checkpoint.parquet"))
    v_new = 1  # version after the enable commit
    os.rename(os.path.join(log, cp),
              os.path.join(log, f"{v_new:020d}.checkpoint.parquet"))
    json.dump({"version": v_new, "size": 3},
              open(os.path.join(log, "_last_checkpoint"), "w"))
    r = validate_table(path)
    assert not r["ok"] and any("C3" in v for v in r["violations"]), r
