"""The independent CDC-WRITE validator (round-11 verdict ask #3) must
pass every _change_data layout the engine emits — and fail loudly on
deliberate corruptions (the detection-power half).

tools/cdf_write_validator.py imports NOTHING from lcr_etl_upgrade_spark:
pyarrow + json only, with its own restatement of the protocol's
file-action replay (path -> rowcount/DV-cardinality). These tests author
tables through the ENGINE (the thing under validation) and judge the
written bytes with the INDEPENDENT implementation.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.delta_lite import (
    delete_rows,
    optimize,
    replay_log,
    restore_table,
    write_delta_lite,
)
from tools.cdf_write_validator import validate_table


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 3).alias("v"),
        (F.col("id") % 2).cast("string").alias("s"),
    )


def _enable_cdf(path):
    """Flip delta.enableChangeDataFeed=true with a protocol upgrade —
    the same shape tools/delta_cdf_fuzz.py authors."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    st = replay_log(spark, path)
    meta = dict(st.metadata)
    cfg = dict(meta.get("configuration") or {})
    cfg["delta.enableChangeDataFeed"] = "true"
    meta["configuration"] = cfg
    proto = st.protocol or {"minReaderVersion": 1, "minWriterVersion": 2}
    feats = set(proto.get("writerFeatures") or ())
    feats |= {"changeDataFeed", "appendOnly", "invariants"}
    if (meta.get("configuration") or {}).get("delta.columnMapping.mode"):
        feats.add("columnMapping")
    pact = {
        "minReaderVersion": proto.get("minReaderVersion", 1),
        "minWriterVersion": 7,
        "writerFeatures": sorted(feats),
    }
    if proto.get("readerFeatures"):
        pact["readerFeatures"] = proto["readerFeatures"]
    with open(
        os.path.join(path, "_delta_log", f"{st.version + 1:020d}.json"),
        "w",
    ) as fh:
        fh.write(json.dumps({"protocol": pact}) + "\n")
        fh.write(json.dumps({"metaData": meta}) + "\n")


def _cdf_table(spark, path, partitioned=False, mapping=None):
    write_delta_lite(
        _df(spark, 0, 20),
        path,
        partition_by=("s",) if partitioned else (),
        column_mapping=mapping,
    )
    _enable_cdf(path)
    delete_rows(spark, path, F.col("id") % 4 == 0)
    write_delta_lite(_df(spark, 20, 30), path, mode="append")
    delete_rows(spark, path, F.col("id") % 5 == 0)


def _latest_commit(path):
    log = os.path.join(path, "_delta_log")
    f = sorted(x for x in os.listdir(log) if x.endswith(".json"))[-1]
    return os.path.join(log, f)


def _commit_actions(cpath):
    return [json.loads(l) for l in open(cpath) if l.strip()]


def _write_commit(cpath, actions):
    with open(cpath, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


# ---- green on everything the engine writes --------------------------------


def test_green_plain_cdf_table(spark, tmp_path):
    path = str(tmp_path / "t")
    _cdf_table(spark, path)
    assert validate_table(path) == []


def test_green_partitioned_cdf_table(spark, tmp_path):
    path = str(tmp_path / "t")
    _cdf_table(spark, path, partitioned=True)
    assert validate_table(path) == []


def test_green_column_mapped_cdf_table(spark, tmp_path):
    path = str(tmp_path / "t")
    _cdf_table(spark, path, mapping="name")
    assert validate_table(path) == []


def test_green_partitioned_and_mapped(spark, tmp_path):
    path = str(tmp_path / "t")
    _cdf_table(spark, path, partitioned=True, mapping="name")
    assert validate_table(path) == []


def test_green_optimize_and_restore_on_cdf_table(spark, tmp_path):
    path = str(tmp_path / "t")
    _cdf_table(spark, path)
    optimize(spark, path, target_file_bytes=1 << 20)
    write_delta_lite(_df(spark, 30, 40), path, mode="append")
    assert validate_table(path) == []


def test_green_non_cdf_table(spark, tmp_path):
    # no cdc actions anywhere: validator must stay silent (deletes on a
    # non-CDF table derive their changes, no change files)
    path = str(tmp_path / "t")
    write_delta_lite(_df(spark, 0, 20), path)
    delete_rows(spark, path, F.col("id") < 5)
    write_delta_lite(_df(spark, 20, 25), path, mode="append")
    assert validate_table(path) == []


# ---- red on deliberate corruptions -----------------------------------------


def _cdc_commit(path):
    """(commit path, actions, index of first cdc action)."""
    log = os.path.join(path, "_delta_log")
    for f in sorted(os.listdir(log)):
        if not f.endswith(".json"):
            continue
        cpath = os.path.join(log, f)
        actions = _commit_actions(cpath)
        for i, a in enumerate(actions):
            if "cdc" in a:
                return cpath, actions, i
    raise AssertionError("no cdc commit found")


def test_flags_size_lie(spark, tmp_path):
    path = str(tmp_path / "t")
    _cdf_table(spark, path)
    cpath, actions, i = _cdc_commit(path)
    actions[i]["cdc"]["size"] = int(actions[i]["cdc"]["size"]) + 1
    _write_commit(cpath, actions)
    v = validate_table(path)
    assert any(x["check"] == "W1" and "size" in x["detail"] for x in v), v


def test_flags_missing_change_file(spark, tmp_path):
    path = str(tmp_path / "t")
    _cdf_table(spark, path)
    _, actions, i = _cdc_commit(path)
    import urllib.parse

    rel = urllib.parse.unquote(actions[i]["cdc"]["path"])
    os.remove(os.path.join(path, rel))
    v = validate_table(path)
    assert any(
        x["check"] == "W1" and "missing" in x["detail"] for x in v
    ), v


def test_flags_datachange_true_cdc(spark, tmp_path):
    path = str(tmp_path / "t")
    _cdf_table(spark, path)
    cpath, actions, i = _cdc_commit(path)
    actions[i]["cdc"]["dataChange"] = True
    _write_commit(cpath, actions)
    v = validate_table(path)
    assert any(
        x["check"] == "W1" and "dataChange=true" in x["detail"] for x in v
    ), v


def test_flags_foreign_change_type(spark, tmp_path):
    path = str(tmp_path / "t")
    _cdf_table(spark, path)
    _, actions, i = _cdc_commit(path)
    import urllib.parse

    rel = urllib.parse.unquote(actions[i]["cdc"]["path"])
    full = os.path.join(path, rel)
    tbl = pq.read_table(full)
    ct = ["upsert"] * tbl.num_rows  # not a protocol value
    cols = {
        n: tbl.column(n) for n in tbl.schema.names if n != "_change_type"
    }
    cols["_change_type"] = pa.array(ct, type=pa.string())
    pq.write_table(pa.table(cols), full)
    # keep the size claim honest so W3 (domain), not W1, fires
    cpath, actions2, j = _cdc_commit(path)
    actions2[j]["cdc"]["size"] = os.path.getsize(full)
    _write_commit(cpath, actions2)
    v = validate_table(path)
    assert any(x["check"] == "W3" for x in v), v


def test_flags_cdc_on_layout_move_commit(spark, tmp_path):
    # graft the cdc action onto the OPTIMIZE (dataChange=false) commit:
    # the feed must stay blind to rewrites, so this is a W5 violation
    path = str(tmp_path / "t")
    _cdf_table(spark, path)
    res = optimize(spark, path, target_file_bytes=1 << 20)
    assert res["version"] is not None
    _, actions, i = _cdc_commit(path)
    opt_cpath = os.path.join(
        path, "_delta_log", f"{res['version']:020d}.json"
    )
    opt_actions = _commit_actions(opt_cpath)
    opt_actions.append({"cdc": actions[i]["cdc"]})
    _write_commit(opt_cpath, opt_actions)
    v = validate_table(path)
    assert any(x["check"] == "W5" for x in v), v


def test_flags_cdc_without_cdf_enabled(spark, tmp_path):
    # move a cdc action onto a commit of a table that never enabled CDF
    path = str(tmp_path / "donor")
    _cdf_table(spark, path)
    _, actions, i = _cdc_commit(path)
    plain = str(tmp_path / "plain")
    write_delta_lite(_df(spark, 0, 10), plain)
    os.makedirs(os.path.join(plain, "_change_data"), exist_ok=True)
    import urllib.parse

    rel = urllib.parse.unquote(actions[i]["cdc"]["path"])
    import shutil

    dst = os.path.join(plain, "_change_data", "donor.parquet")
    shutil.copy(os.path.join(path, rel), dst)
    cpath = os.path.join(plain, "_delta_log", f"{0:020d}.json")
    plain_actions = _commit_actions(cpath)
    plain_actions.append({
        "cdc": {
            "path": "_change_data/donor.parquet",
            "partitionValues": {},
            "size": os.path.getsize(dst),
            "dataChange": False,
        }
    })
    _write_commit(cpath, plain_actions)
    v = validate_table(plain)
    assert any(x["check"] == "W4" for x in v), v


def test_flags_dv_update_without_cdc(spark, tmp_path):
    # strip the cdc actions from a DV-delete commit on a CDF table: the
    # remove+add-same-path shape now has no change files -> W8
    path = str(tmp_path / "t")
    _cdf_table(spark, path)
    cpath, actions, _ = _cdc_commit(path)
    _write_commit(cpath, [a for a in actions if "cdc" not in a])
    v = validate_table(path)
    assert any(x["check"] == "W8" for x in v), v


def test_flags_miscounted_delete_rows(spark, tmp_path):
    # swap the cdc file for one with an extra delete row (size claim
    # kept honest): the independent replay's count reconciliation (W6)
    # must flag it
    path = str(tmp_path / "t")
    _cdf_table(spark, path)
    _, actions, i = _cdc_commit(path)
    import urllib.parse

    rel = urllib.parse.unquote(actions[i]["cdc"]["path"])
    full = os.path.join(path, rel)
    tbl = pq.read_table(full)
    doubled = pa.concat_tables([tbl, tbl.slice(0, 1)])
    pq.write_table(doubled, full)
    cpath, actions2, j = _cdc_commit(path)
    actions2[j]["cdc"]["size"] = os.path.getsize(full)
    _write_commit(cpath, actions2)
    v = validate_table(path)
    assert any(
        x["check"] == "W6" and "delete rows" in x["detail"] for x in v
    ), v


def test_flags_change_file_in_table_state(spark, tmp_path):
    path = str(tmp_path / "t")
    _cdf_table(spark, path)
    cpath, actions, i = _cdc_commit(path)
    actions.append({
        "add": {
            "path": actions[i]["cdc"]["path"],
            "partitionValues": {},
            "size": int(actions[i]["cdc"]["size"]),
            "modificationTime": 0,
            "dataChange": False,
        }
    })
    _write_commit(cpath, actions)
    v = validate_table(path)
    assert any(x["check"] == "W7" for x in v), v
