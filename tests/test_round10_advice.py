"""Round-10 regression tests for the three ADVICE.md findings:

1. enable_v2_checkpoint on a legacy minReaderVersion=2 (column-mapped)
   table must carry the implicit columnMapping reader requirement into
   the explicit readerFeatures list when upgrading to reader v3 — a
   feature-gated reader seeing only ["v2Checkpoint"] would resolve
   columns by logical name and read NULLs.
2. write_checkpoint must REFUSE the v2 layout when
   delta.checkpointPolicy=v2 is set but the v2Checkpoint feature is not
   listed in the protocol (foreign/malformed table): the protocol gates
   writing v2 checkpoints on the table feature.
3. delta-spark's derived checkpoint-only add columns (stats_parsed,
   partitionValues_parsed) must not be captured as unknown optional add
   state — dropping them is lossless, so they must not trip
   write_checkpoint's lossless-or-refuse gate.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.delta_lite import (
    enable_v2_checkpoint,
    read_delta_lite,
    replay_log,
    write_checkpoint,
    write_delta_lite,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


# ---- 1: legacy reader-v2 upgrade keeps columnMapping explicit ------------


def _author_legacy_mapped_table(spark, path):
    """Foreign column-mapped table at legacy minReaderVersion=2 (the
    pre-table-features spelling: reader v2 IS column mapping, no
    readerFeatures list), minWriterVersion=7 listing columnMapping —
    exactly the shape that passes _check_writer_protocol."""
    (path / "_delta_log").mkdir(parents=True)
    sub = path / "stage"
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "`col-aaa` long, `col-bbb` string"
    ).coalesce(1).write.parquet(str(sub))
    f = next(n for n in os.listdir(sub) if n.endswith(".parquet"))
    os.rename(sub / f, path / "part-0.parquet")
    meta = {
        "id": "0000", "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps({"type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-aaa"}},
            {"name": "name", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-bbb"}},
        ]}),
        "partitionColumns": [],
        "configuration": {"delta.columnMapping.mode": "name"},
    }
    with open(path / "_delta_log" / f"{0:020d}.json", "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 7,
            "writerFeatures": ["columnMapping"]}}) + "\n")
        fh.write(json.dumps({"metaData": meta}) + "\n")
        fh.write(json.dumps({"add": {
            "path": "part-0.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True}}) + "\n")
    return str(path)


def test_enable_v2_checkpoint_preserves_implicit_column_mapping(
    spark, tmp_path
):
    path = _author_legacy_mapped_table(spark, tmp_path / "legacy2")
    enable_v2_checkpoint(spark, path)
    proto = replay_log(spark, path).protocol
    assert proto["minReaderVersion"] == 3
    assert "v2Checkpoint" in proto["readerFeatures"]
    # the legacy reader-v2 obligation must survive as an explicit
    # feature, in BOTH lists
    assert "columnMapping" in proto["readerFeatures"]
    assert "columnMapping" in proto["writerFeatures"]
    # and the table still reads by logical names afterwards
    got = {
        (r.id, r.name) for r in read_delta_lite(spark, path).collect()
    }
    assert got == {(1, "a"), (2, "b")}
    # checkpoint + read-from-checkpoint round-trips too
    write_checkpoint(spark, path)
    got = {
        (r.id, r.name) for r in read_delta_lite(spark, path).collect()
    }
    assert got == {(1, "a"), (2, "b")}


def test_enable_v2_checkpoint_on_mapped_feature_table(spark, tmp_path):
    """An engine-written (already feature-listed) mapped table keeps its
    columnMapping listing through the upgrade — no regression."""
    path = str(tmp_path / "mapped")
    write_delta_lite(_df(spark, [(1, "a")]), path, column_mapping="name")
    enable_v2_checkpoint(spark, path)
    proto = replay_log(spark, path).protocol
    assert "columnMapping" in proto["readerFeatures"]
    assert "v2Checkpoint" in proto["readerFeatures"]


def test_enable_v2_checkpoint_unmapped_table_stays_lean(spark, tmp_path):
    """An unmapped protocol-1/2 table must NOT grow a columnMapping
    feature it never had."""
    path = str(tmp_path / "plain")
    write_delta_lite(_df(spark, [(1, "a")]), path)
    enable_v2_checkpoint(spark, path)
    proto = replay_log(spark, path).protocol
    assert "columnMapping" not in proto["readerFeatures"]
    assert "columnMapping" not in proto["writerFeatures"]


# ---- 2: policy=v2 without the feature refuses -----------------------------


def test_checkpoint_policy_v2_without_feature_refuses(spark, tmp_path):
    path = str(tmp_path / "nofeat")
    write_delta_lite(_df(spark, [(1, "a")]), path)
    # foreign/malformed enablement: property set, feature never listed
    st = replay_log(spark, path)
    meta = dict(st.metadata)
    meta["configuration"] = {"delta.checkpointPolicy": "v2"}
    with open(
        os.path.join(path, "_delta_log", f"{st.version + 1:020d}.json"), "w"
    ) as fh:
        fh.write(json.dumps({"metaData": meta}) + "\n")
    with pytest.raises(NotImplementedError, match="v2Checkpoint"):
        write_checkpoint(spark, path)
    # no checkpoint artifacts were left behind
    log = os.path.join(path, "_delta_log")
    assert not [f for f in os.listdir(log) if "checkpoint" in f]


def test_checkpoint_policy_v2_with_feature_still_writes_v2(spark, tmp_path):
    path = str(tmp_path / "feat")
    write_delta_lite(_df(spark, [(1, "a")]), path)
    enable_v2_checkpoint(spark, path)
    v = write_checkpoint(spark, path)
    log = os.path.join(path, "_delta_log")
    names = os.listdir(log)
    assert any(
        n.startswith(f"{v:020d}.checkpoint.") and n != f"{v:020d}.checkpoint.parquet"
        for n in names
    ), names


# ---- 3: derived checkpoint-only add columns are droppable ----------------


def test_stats_parsed_checkpoint_columns_do_not_refuse(spark, tmp_path):
    """A delta-spark-authored checkpoint carries derived
    add.stats_parsed / add.partitionValues_parsed columns duplicating
    the raw stats/partitionValues fields. Replay must not capture them
    as unknown optional state, and write_checkpoint must stay writable."""
    path = str(tmp_path / "derived")
    write_delta_lite(_df(spark, [(1, "a"), (2, "b")]), path)
    st = replay_log(spark, path)
    rows = []
    for rel, pv in st.files.items():
        rows.append({
            "add": {
                "path": rel, "partitionValues": pv, "size": 1,
                "modificationTime": 0, "dataChange": True,
                "stats": json.dumps({"numRecords": 2}),
                "stats_parsed": {"numRecords": 2},
                "partitionValues_parsed": {"__dummy": None},
            },
            "metaData": None, "protocol": None,
        })
    rows.append({"add": None, "metaData": st.metadata, "protocol": None})
    rows.append({"add": None, "metaData": None, "protocol": st.protocol})
    schema = (
        "add struct<path:string,partitionValues:map<string,string>,"
        "size:long,modificationTime:long,dataChange:boolean,stats:string,"
        "stats_parsed:struct<numRecords:long>,"
        "partitionValues_parsed:struct<__dummy:string>>,"
        "metaData struct<id:string,format:struct<provider:string,"
        "options:map<string,string>>,schemaString:string,"
        "partitionColumns:array<string>,configuration:map<string,string>>,"
        "protocol struct<minReaderVersion:int,minWriterVersion:int>"
    )
    log_dir = os.path.join(path, "_delta_log")
    cp = os.path.join(log_dir, f"{st.version:020d}.checkpoint.parquet")
    (
        spark.createDataFrame([(json.dumps(r),) for r in rows], "raw string")
        .select(F.from_json("raw", schema).alias("a"))
        .select("a.*")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(cp + ".d")
    )
    part = next(f for f in os.listdir(cp + ".d") if f.endswith(".parquet"))
    os.rename(os.path.join(cp + ".d", part), cp)
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        json.dump({"version": st.version, "size": len(rows)}, fh)
    for v in range(st.version + 1):
        os.remove(os.path.join(log_dir, f"{v:020d}.json"))

    st2 = replay_log(spark, path)
    for extra in st2.adds.values():
        assert "stats_parsed" not in extra
        assert "partitionValues_parsed" not in extra
        # the RAW field the derived columns duplicate is still kept
        assert "stats" in extra
    # before the fix this raised NotImplementedError on stats_parsed
    v = write_checkpoint(spark, path)
    assert v == st2.version
    got = {(r.id, r.name) for r in read_delta_lite(spark, path).collect()}
    assert got == {(1, "a"), (2, "b")}


def test_unknown_add_fields_still_refuse_checkpoint(spark, tmp_path):
    """The lossless-or-refuse gate still fires for genuinely unknown
    optional add fields (e.g. a foreign writer's clusteringProvider
    payload) — only the two documented derived columns are droppable."""
    path = str(tmp_path / "unknown")
    write_delta_lite(_df(spark, [(1, "a")]), path)
    st = replay_log(spark, path)
    rel = next(iter(st.files))
    with open(
        os.path.join(path, "_delta_log", f"{st.version + 1:020d}.json"), "w"
    ) as fh:
        fh.write(json.dumps({"add": {
            "path": rel, "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": False,
            "someForeignField": {"x": 1}}}) + "\n")
    with pytest.raises(NotImplementedError, match="someForeignField"):
        write_checkpoint(spark, path)


# ---- review-pass fixes (round 10, post-verdict code review) ---------------


def test_stats_parsed_without_stats_refuses_checkpoint(spark, tmp_path):
    """stats_parsed is droppable ONLY as a duplicate: a delta-spark
    checkpoint written with writeStatsAsJson=false carries stats_parsed
    WITHOUT the raw stats field, and dropping it there would silently
    erase per-file statistics — the lossless-or-refuse gate must fire."""
    path = str(tmp_path / "structonly")
    write_delta_lite(_df(spark, [(1, "a")]), path)
    st = replay_log(spark, path)
    rel = next(iter(st.files))
    rows = [
        {"add": {"path": rel, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "stats_parsed": {"numRecords": 1}},  # NO raw stats
         "metaData": None, "protocol": None},
        {"add": None, "metaData": st.metadata, "protocol": None},
        {"add": None, "metaData": None, "protocol": st.protocol},
    ]
    schema = (
        "add struct<path:string,partitionValues:map<string,string>,"
        "size:long,modificationTime:long,dataChange:boolean,"
        "stats_parsed:struct<numRecords:long>>,"
        "metaData struct<id:string,format:struct<provider:string,"
        "options:map<string,string>>,schemaString:string,"
        "partitionColumns:array<string>,configuration:map<string,string>>,"
        "protocol struct<minReaderVersion:int,minWriterVersion:int>"
    )
    log_dir = os.path.join(path, "_delta_log")
    cp = os.path.join(log_dir, f"{st.version:020d}.checkpoint.parquet")
    (
        spark.createDataFrame([(json.dumps(r),) for r in rows], "raw string")
        .select(F.from_json("raw", schema).alias("a")).select("a.*")
        .coalesce(1).write.mode("overwrite").parquet(cp + ".d")
    )
    part = next(f for f in os.listdir(cp + ".d") if f.endswith(".parquet"))
    os.rename(os.path.join(cp + ".d", part), cp)
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        json.dump({"version": st.version, "size": len(rows)}, fh)
    for v in range(st.version + 1):
        os.remove(os.path.join(log_dir, f"{v:020d}.json"))
    # replay keeps it as unknown optional state...
    st2 = replay_log(spark, path)
    assert any("stats_parsed" in extra for extra in st2.adds.values())
    # ...and the gate refuses BY NAME instead of silently dropping it
    with pytest.raises(NotImplementedError, match="stats_parsed"):
        write_checkpoint(spark, path)


def test_enable_v2_checkpoint_repairs_prefix_upgraded_table(
    spark, tmp_path
):
    """A column-mapped table upgraded by the PRE-fix enable (reader
    features [v2Checkpoint] only, policy already v2) must not hit the
    no-op early return: calling enable again repairs the protocol."""
    path = tmp_path / "prefix"
    (path / "_delta_log").mkdir(parents=True)
    sub = path / "stage"
    spark.createDataFrame([(1,)], "`col-aaa` long").coalesce(1).write.parquet(
        str(sub)
    )
    f = next(n for n in os.listdir(sub) if n.endswith(".parquet"))
    os.rename(sub / f, path / "part-0.parquet")
    meta = {
        "id": "0000", "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps({"type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-aaa"}},
        ]}),
        "partitionColumns": [],
        "configuration": {"delta.columnMapping.mode": "name",
                          "delta.checkpointPolicy": "v2"},
    }
    with open(path / "_delta_log" / f"{0:020d}.json", "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["v2Checkpoint"],  # columnMapping MISSING
            "writerFeatures": ["columnMapping", "v2Checkpoint"]}}) + "\n")
        fh.write(json.dumps({"metaData": meta}) + "\n")
        fh.write(json.dumps({"add": {
            "path": "part-0.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True}}) + "\n")
    v = enable_v2_checkpoint(spark, str(path))
    assert v == 1  # repaired, not no-op'd
    proto = replay_log(spark, str(path)).protocol
    assert "columnMapping" in proto["readerFeatures"]
    # and a second call IS the no-op now
    assert enable_v2_checkpoint(spark, str(path)) == 1


def test_ivf_explicit_dim_survives_sample_miss(spark):
    """With dim= explicit, a Bernoulli training sample that contains no
    dim-length row (seed 9 misses all 3 here, verified) must fall back
    to a dim-filtered bounded fetch — not return a silent empty."""
    from lcr_etl_upgrade_spark.operators.similarity import ivf_topk

    rows = [(i, [1.0, 2.0, 3.0]) for i in range(2000)]  # stray 3-dim
    rows += [(2000 + i, [float(i + 1), 1.0, 0.5, -1.0])
             for i in range(3)]
    corpus = spark.createDataFrame(
        rows, "vec_id int, embedding array<float>"
    )
    queries = spark.createDataFrame(
        [(9000, [5.0, 1.0, 0.5, -1.0])],
        "query_id int, embedding array<float>",
    )
    got = ivf_topk(
        corpus, queries, k=3, n_centroids=2, n_probe=2,
        query_id="query_id", seed=9, dim=4,
    ).collect()
    assert len(got) == 3, got
