"""roaring_lite (Z85 + RoaringBitmapArray) and delta_lite deletion
vectors. Golden bytes are composed BY HAND from the public specs
(rfc.zeromq.org/spec/32, RoaringFormatSpec, delta.io PROTOCOL.md
"Deletion Vectors"), so decoding correctness is independent of any
encoder we control."""

from __future__ import annotations

import json
import os
import struct
import zlib

import pytest

from lcr_etl_upgrade_spark.roaring_lite import (
    ROARING_ARRAY_MAGIC,
    parse_roaring_bitmap_array,
    z85_decode,
    z85_encode,
)


# ---- Z85 ----------------------------------------------------------------


def test_z85_spec_vector():
    # the reference test vector from ZeroMQ spec 32
    assert z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
    )
    assert z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) == (
        "HelloWorld"
    )


def test_z85_roundtrip_and_errors():
    for data in (b"", b"\x00\x00\x00\x00", bytes(range(32)), b"\xff" * 8):
        assert z85_decode(z85_encode(data)) == data
    with pytest.raises(ValueError, match="multiple of 5"):
        z85_decode("abc")
    with pytest.raises(ValueError, match="invalid z85"):
        z85_decode("abcd\x01")
    with pytest.raises(ValueError, match="overflow"):
        z85_decode("#####")  # 84,84,84,84,84 > 2^32-1


# ---- roaring bitmap goldens ---------------------------------------------


def _bitmap32_array(values16_by_key: dict[int, list[int]]) -> bytes:
    """Hand-serialize ONE portable 32-bit roaring bitmap whose containers
    are all ARRAY containers (cookie 12346, offsets included)."""
    keys = sorted(values16_by_key)
    out = struct.pack("<II", 12346, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(values16_by_key[k]) - 1)
    # offsets: start of each container's data
    data_start = len(out) + 4 * len(keys)
    offsets, containers = [], b""
    for k in keys:
        offsets.append(data_start + len(containers))
        vals = sorted(values16_by_key[k])
        containers += struct.pack(f"<{len(vals)}H", *vals)
    for off in offsets:
        out += struct.pack("<I", off)
    return out + containers


def _rbm_array(bitmaps: list[bytes]) -> bytes:
    return struct.pack("<iq", ROARING_ARRAY_MAGIC, len(bitmaps)) + b"".join(
        bitmaps
    )


def test_roaring_array_container_golden():
    data = _rbm_array([_bitmap32_array({0: [1, 3, 7], 2: [0]})])
    assert parse_roaring_bitmap_array(data) == {1, 3, 7, (2 << 16) | 0}


def test_roaring_two_bucket_64bit_values():
    # bitmap 0 -> low 32 bits; bitmap 1 -> values with high 32 bits = 1
    data = _rbm_array(
        [_bitmap32_array({0: [5]}), _bitmap32_array({0: [9]})]
    )
    assert parse_roaring_bitmap_array(data) == {5, (1 << 32) | 9}


def test_roaring_run_container_golden():
    # cookie 12347 with 1 container, run flag set: runs [(10, len 2)]
    # -> values 10,11,12. Fewer than 4 containers => no offsets.
    bm = (
        struct.pack("<I", 12347 | (0 << 16))  # containerCount-1 = 0
        + b"\x01"  # run-flag bitset: container 0 is a run container
        + struct.pack("<HH", 0, 2)  # key 0, cardinality-1 = 2
        + struct.pack("<H", 1)  # 1 run
        + struct.pack("<HH", 10, 2)  # start 10, length 2 (inclusive)
    )
    assert parse_roaring_bitmap_array(_rbm_array([bm])) == {10, 11, 12}


def test_roaring_bitset_container_golden():
    # cardinality > 4096 forces a bitset container: mark values 0..4999
    words = bytearray(8192)
    for v in range(5000):
        words[v // 8] |= 1 << (v % 8)
    bm = (
        struct.pack("<II", 12346, 1)
        + struct.pack("<HH", 0, 4999)
        + struct.pack("<I", 16)  # offset of container data
        + bytes(words)
    )
    assert parse_roaring_bitmap_array(_rbm_array([bm])) == set(range(5000))


def test_roaring_malformed():
    with pytest.raises(ValueError, match="magic"):
        parse_roaring_bitmap_array(struct.pack("<iq", 1, 0))
    with pytest.raises(ValueError, match="too short"):
        parse_roaring_bitmap_array(b"\x00")
    with pytest.raises(ValueError, match="truncated"):
        parse_roaring_bitmap_array(
            _rbm_array([_bitmap32_array({0: [1, 2, 3]})])[:-2]
        )
    with pytest.raises(ValueError, match="trailing"):
        parse_roaring_bitmap_array(
            _rbm_array([_bitmap32_array({0: [1]})]) + b"\x00"
        )
    with pytest.raises(ValueError, match="cookie"):
        parse_roaring_bitmap_array(
            _rbm_array([struct.pack("<I", 9999)])
        )


# ---- deletion vectors end-to-end ----------------------------------------


def _dv_file_bytes(bitmap: bytes) -> tuple[bytes, int]:
    """Serialize one DV into the on-disk file layout (version byte, then
    size/data/crc at the returned offset)."""
    offset = 1
    blob = b"\x01" + struct.pack(">I", len(bitmap)) + bitmap + struct.pack(
        ">I", zlib.crc32(bitmap) & 0xFFFFFFFF
    )
    return blob, offset


def _write_dv_table(spark, tmp_path, dv_action_extra, storage="file"):
    """10-row single-file table whose add carries a DV deleting rows
    {1, 3, 7}; returns the table path."""
    path = tmp_path / "dvt"
    (path / "_delta_log").mkdir(parents=True)
    sub = path / "stage"
    spark.range(10).selectExpr("id", "id * 10 as v").coalesce(1).write.parquet(
        str(sub)
    )
    f = next(n for n in os.listdir(sub) if n.endswith(".parquet"))
    os.rename(sub / f, path / "part-0.parquet")
    bitmap = _rbm_array([_bitmap32_array({0: [1, 3, 7]})])
    if storage == "file":
        import uuid as _uuid

        u = _uuid.uuid4()
        blob, offset = _dv_file_bytes(bitmap)
        with open(path / f"deletion_vector_{u}.bin", "wb") as fh:
            fh.write(blob)
        dv = {
            "storageType": "u",
            "pathOrInlineDv": z85_encode(u.bytes),
            "offset": offset,
            "sizeInBytes": len(bitmap),
            "cardinality": 3,
        }
    else:
        pad = (-len(bitmap)) % 4
        dv = {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(bitmap + b"\x00" * pad),
            "sizeInBytes": len(bitmap),
            "cardinality": 3,
        }
    dv.update(dv_action_extra)
    meta = {
        "id": "0000", "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps({"type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "long", "nullable": True, "metadata": {}},
        ]}),
        "partitionColumns": [], "configuration": {},
    }
    with open(path / "_delta_log" / f"{0:020d}.json", "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"]}}) + "\n")
        fh.write(json.dumps({"metaData": meta}) + "\n")
        fh.write(json.dumps({"add": {
            "path": "part-0.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True,
            "deletionVector": dv}}) + "\n")
    return str(path)


@pytest.mark.parametrize("storage", ["file", "inline"])
def test_deletion_vector_rows_dropped(spark, tmp_path, storage):
    from lcr_etl_upgrade_spark.delta_lite import read_delta_lite

    path = _write_dv_table(spark, tmp_path, {}, storage=storage)
    got = read_delta_lite(spark, path)
    assert [f.name for f in got.schema.fields] == ["id", "v"]
    ids = sorted(r.id for r in got.collect())
    assert ids == [0, 2, 4, 5, 6, 8, 9]  # 1, 3, 7 deleted


def test_deletion_vector_readd_clears_or_replaces(spark, tmp_path):
    """Re-adding the same file WITHOUT a DV restores all rows (the
    protocol's DV-update mechanism); time travel sees each state."""
    from lcr_etl_upgrade_spark.delta_lite import read_delta_lite

    path = _write_dv_table(spark, tmp_path, {})
    with open(os.path.join(path, "_delta_log", f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"add": {
            "path": "part-0.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": False}}) + "\n")
    assert read_delta_lite(spark, path).count() == 10
    assert read_delta_lite(spark, path, version=0).count() == 7


def test_deletion_vector_integrity_errors(spark, tmp_path):
    from lcr_etl_upgrade_spark.delta_lite import read_delta_lite

    # corrupt CRC
    p1 = _write_dv_table(spark, tmp_path / "a", {})
    dv_file = next(
        f for f in os.listdir(p1) if f.startswith("deletion_vector_")
    )
    with open(os.path.join(p1, dv_file), "r+b") as fh:
        fh.seek(8)
        fh.write(b"\xff")
    with pytest.raises(ValueError, match="checksum"):
        read_delta_lite(spark, p1)

    # descriptor cardinality disagrees with the parsed bitmap
    p2 = _write_dv_table(spark, tmp_path / "b", {"cardinality": 99})
    with pytest.raises(ValueError, match="cardinality"):
        read_delta_lite(spark, p2)


# ---- review-finding regressions -----------------------------------------


def test_dv_applies_with_hostile_path_characters(spark, tmp_path):
    """FAIL-OPEN guard: _metadata.file_path is percent-encoded by Hadoop
    (space -> %20, %% -> %25) while add.path is decoded — the join key
    encoding must match or deleted rows silently come back."""
    from lcr_etl_upgrade_spark.delta_lite import read_delta_lite

    for dirname in ("k=a b", "k=a%b", "k=a+b", "k=aüb"):
        sub = tmp_path / dirname.replace("=", "_").replace("/", "_")
        path = sub / "t"
        (path / "_delta_log").mkdir(parents=True)
        stage = sub / "stage"
        spark.range(10).coalesce(1).write.parquet(str(stage))
        f = next(n for n in os.listdir(stage) if n.endswith(".parquet"))
        (path / dirname).mkdir()
        rel = f"{dirname}/part-0.parquet"
        os.rename(stage / f, path / rel)
        bitmap = _rbm_array([_bitmap32_array({0: [0, 9]})])
        pad = (-len(bitmap)) % 4
        from lcr_etl_upgrade_spark.roaring_lite import z85_encode as enc

        dv = {"storageType": "i",
              "pathOrInlineDv": enc(bitmap + b"\x00" * pad),
              "sizeInBytes": len(bitmap), "cardinality": 2}
        meta = {
            "id": "0000", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {}}]}),
            "partitionColumns": [], "configuration": {},
        }
        import urllib.parse as up

        with open(path / "_delta_log" / f"{0:020d}.json", "w") as fh:
            fh.write(json.dumps({"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"]}}) + "\n")
            fh.write(json.dumps({"metaData": meta}) + "\n")
            fh.write(json.dumps({"add": {
                "path": up.quote(rel), "partitionValues": {}, "size": 1,
                "modificationTime": 0, "dataChange": True,
                "deletionVector": dv}}) + "\n")
        got = sorted(r.id for r in read_delta_lite(spark, str(path)).collect())
        assert got == list(range(1, 9)), (dirname, got)


def test_dv_applies_through_symlinked_table_path(spark, tmp_path):
    """realpath-vs-abspath: Spark does not resolve symlinks when
    qualifying paths; the build side must not either."""
    from lcr_etl_upgrade_spark.delta_lite import read_delta_lite

    real = tmp_path / "realdir"
    real.mkdir()
    table = _write_dv_table(spark, real, {})
    link = tmp_path / "linkdir"
    os.symlink(real, link)
    linked_table = str(link / os.path.relpath(table, real))
    ids = sorted(r.id for r in read_delta_lite(spark, linked_table).collect())
    assert ids == [0, 2, 4, 5, 6, 8, 9]  # DV still applies via the symlink


def test_dv_update_commit_order_insensitive(spark, tmp_path):
    """A DV-update commit carries remove(path, oldDv) + add(path, newDv)
    in UNSPECIFIED order; with add first, the stale remove must not
    erase the re-added file (reconciliation keys by (path, dvId))."""
    from lcr_etl_upgrade_spark.delta_lite import read_delta_lite

    path = _write_dv_table(spark, tmp_path, {})  # v0: DV deletes {1,3,7}
    old_dv = json.loads(
        open(os.path.join(path, "_delta_log", f"{0:020d}.json")).readlines()[2]
    )["add"]["deletionVector"]
    bitmap = _rbm_array([_bitmap32_array({0: [1, 3, 5, 7]})])
    pad = (-len(bitmap)) % 4
    new_dv = {"storageType": "i",
              "pathOrInlineDv": z85_encode(bitmap + b"\x00" * pad),
              "sizeInBytes": len(bitmap), "cardinality": 4}
    with open(os.path.join(path, "_delta_log", f"{1:020d}.json"), "w") as fh:
        # ADD FIRST, stale remove second — the hostile ordering
        fh.write(json.dumps({"add": {
            "path": "part-0.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": False,
            "deletionVector": new_dv}}) + "\n")
        fh.write(json.dumps({"remove": {
            "path": "part-0.parquet", "deletionTimestamp": 0,
            "dataChange": False, "deletionVector": old_dv}}) + "\n")
    ids = sorted(r.id for r in read_delta_lite(spark, path).collect())
    assert ids == [0, 2, 4, 6, 8, 9]  # new DV {1,3,5,7} in effect
    # and the conventional order (remove first) gives the same state
    with open(os.path.join(path, "_delta_log", f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"remove": {
            "path": "part-0.parquet", "deletionTimestamp": 0,
            "dataChange": False, "deletionVector": old_dv}}) + "\n")
        fh.write(json.dumps({"add": {
            "path": "part-0.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": False,
            "deletionVector": new_dv}}) + "\n")
    ids = sorted(r.id for r in read_delta_lite(spark, path).collect())
    assert ids == [0, 2, 4, 6, 8, 9]


def test_roaring_parse_bound_enforced_during_parse():
    """The materialization bound must trip DURING parsing — a lying
    descriptor cardinality must not let a huge bitmap OOM the driver
    before a post-hoc check."""
    from lcr_etl_upgrade_spark.roaring_lite import parse_roaring_bitmap_array

    data = _rbm_array([_bitmap32_array({0: list(range(100))})])
    with pytest.raises(ValueError, match="materialization bound"):
        parse_roaring_bitmap_array(data, max_values=50)
    assert len(parse_roaring_bitmap_array(data, max_values=100)) == 100


def test_dv_composes_with_partitioned_hive_layout(spark, tmp_path):
    """DV filter on the single-relation partitioned fast path: the join
    key includes the partition directory in the file path."""
    from lcr_etl_upgrade_spark.delta_lite import read_delta_lite

    path = tmp_path / "pdv"
    (path / "_delta_log").mkdir(parents=True)
    adds = []
    for pv in (1, 2):
        stage = path / f"s{pv}"
        spark.range(5).selectExpr(f"id + {10 * pv} as id").coalesce(
            1
        ).write.parquet(str(stage))
        f = next(n for n in os.listdir(stage) if n.endswith(".parquet"))
        (path / f"part={pv}").mkdir()
        rel = f"part={pv}/part-0.parquet"
        os.rename(stage / f, path / rel)
        adds.append((rel, {"part": str(pv)}))
    # DV on partition 1's file only: delete row indexes {0, 4}
    bitmap = _rbm_array([_bitmap32_array({0: [0, 4]})])
    pad = (-len(bitmap)) % 4
    dv = {"storageType": "i",
          "pathOrInlineDv": z85_encode(bitmap + b"\x00" * pad),
          "sizeInBytes": len(bitmap), "cardinality": 2}
    meta = {
        "id": "0000", "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps({"type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "part", "type": "integer", "nullable": True,
             "metadata": {}}]}),
        "partitionColumns": ["part"], "configuration": {},
    }
    with open(path / "_delta_log" / f"{0:020d}.json", "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"]}}) + "\n")
        fh.write(json.dumps({"metaData": meta}) + "\n")
        for i, (rel, pvals) in enumerate(adds):
            add = {"path": rel, "partitionValues": pvals, "size": 1,
                   "modificationTime": 0, "dataChange": True}
            if i == 0:
                add["deletionVector"] = dv
            fh.write(json.dumps({"add": add}) + "\n")
    got = read_delta_lite(spark, str(path))
    ids = sorted(r.id for r in got.collect())
    # partition 1 rows 10..14 lose indexes 0 and 4 (ids 10, 14)
    assert ids == [11, 12, 13, 20, 21, 22, 23, 24]
    # AQE prints Final + Initial sections; count scans in the final one
    plan = got._jdf.queryExecution().executedPlan().toString()
    final_plan = plan.split("== Initial Plan ==")[0]
    assert final_plan.count("Scan parquet") == 1, plan  # fast path retained


def test_dv_composes_with_column_mapping(spark, tmp_path):
    """Deletion vectors + column mapping together: the DV filter runs on
    the physical scan, then the rename projects to logical names."""
    from lcr_etl_upgrade_spark.delta_lite import read_delta_lite

    path = tmp_path / "cmdv"
    (path / "_delta_log").mkdir(parents=True)
    stage = path / "stage"
    spark.range(6).selectExpr("id as `col-aaa`").coalesce(1).write.parquet(
        str(stage)
    )
    f = next(n for n in os.listdir(stage) if n.endswith(".parquet"))
    os.rename(stage / f, path / "part-0.parquet")
    bitmap = _rbm_array([_bitmap32_array({0: [2, 3]})])
    pad = (-len(bitmap)) % 4
    dv = {"storageType": "i",
          "pathOrInlineDv": z85_encode(bitmap + b"\x00" * pad),
          "sizeInBytes": len(bitmap), "cardinality": 2}
    meta = {
        "id": "0000", "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps({"type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-aaa"}}]}),
        "partitionColumns": [],
        "configuration": {"delta.columnMapping.mode": "name"},
    }
    with open(path / "_delta_log" / f"{0:020d}.json", "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors", "columnMapping"],
            "writerFeatures": ["deletionVectors", "columnMapping"]}}) + "\n")
        fh.write(json.dumps({"metaData": meta}) + "\n")
        fh.write(json.dumps({"add": {
            "path": "part-0.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True,
            "deletionVector": dv}}) + "\n")
    got = read_delta_lite(spark, str(path))
    assert [fld.name for fld in got.schema.fields] == ["id"]
    assert sorted(r.id for r in got.collect()) == [0, 1, 4, 5]


# ---- round-7: executor-side DV decode ----------------------------------


def _run_bitmap32(runs_by_key: dict[int, list[tuple[int, int]]]) -> bytes:
    """Hand-serialize ONE 32-bit roaring bitmap whose containers are all
    RUN containers (cookie 12347; offsets only at >= 4 containers)."""
    keys = sorted(runs_by_key)
    n = len(keys)
    out = struct.pack("<I", 12347 | ((n - 1) << 16))
    flags = bytearray((n + 7) // 8)
    for i in range(n):
        flags[i // 8] |= 1 << (i % 8)
    out += bytes(flags)
    containers = b""
    offsets = []
    for k in keys:
        runs = runs_by_key[k]
        card = sum(length + 1 for _, length in runs)
        out += struct.pack("<HH", k, card - 1)
    header_end = len(out) + (4 * n if n >= 4 else 0)
    for k in keys:
        runs = runs_by_key[k]
        offsets.append(header_end + len(containers))
        containers += struct.pack("<H", len(runs))
        for start, length in runs:
            containers += struct.pack("<HH", start, length)
    if n >= 4:
        for off in offsets:
            out += struct.pack("<I", off)
    return out + containers


def test_count_matches_parse_on_goldens():
    from lcr_etl_upgrade_spark.roaring_lite import count_roaring_bitmap_array

    goldens = [
        _rbm_array([_bitmap32_array({0: [1, 3, 7], 2: [0]})]),
        _rbm_array([_bitmap32_array({0: [5]}), _bitmap32_array({0: [9]})]),
        _rbm_array([_run_bitmap32({0: [(10, 2)]})]),
        _rbm_array([_run_bitmap32({0: [(0, 100), (50, 100)], 5: [(7, 0)]})]),
    ]
    for data in goldens:
        assert count_roaring_bitmap_array(data) == len(
            parse_roaring_bitmap_array(data)
        )


def test_count_eleven_million_positions_without_materializing():
    """A run-encoded DV with >10M positions (above the old driver cap)
    counts exactly in O(container) memory — the driver-side integrity
    path for DVs of arbitrary cardinality. 168 full containers of 65536
    values each + one partial = 11,010,049 values in ~1 KB of bytes."""
    from lcr_etl_upgrade_spark.roaring_lite import count_roaring_bitmap_array

    full = {k: [(0, 65535)] for k in range(168)}
    full[168] = [(0, 2048)]
    data = _rbm_array([_run_bitmap32(full)])
    assert len(data) < 4096
    assert count_roaring_bitmap_array(data) == 168 * 65536 + 2049

    # and the parse bound still protects materialization on this blob
    with pytest.raises(ValueError, match="materialization bound"):
        parse_roaring_bitmap_array(data, max_values=1000)


def test_container_keys_must_strictly_increase():
    """Duplicate/unsorted container keys would let the streamed count
    and the collected set disagree (silent dedup) — both walkers refuse."""
    from lcr_etl_upgrade_spark.roaring_lite import count_roaring_bitmap_array

    # two containers, both key 0 (spec requires sorted unique keys)
    bad = struct.pack("<II", 12346, 2)
    bad += struct.pack("<HH", 0, 0) + struct.pack("<HH", 0, 0)
    data_start = len(bad) + 8
    bad += struct.pack("<II", data_start, data_start + 2)
    bad += struct.pack("<H", 1) + struct.pack("<H", 2)
    blob = _rbm_array([bad])
    with pytest.raises(ValueError, match="strictly increasing"):
        parse_roaring_bitmap_array(blob)
    with pytest.raises(ValueError, match="strictly increasing"):
        count_roaring_bitmap_array(blob)


def test_dv_reads_above_strategy_valve(spark, tmp_path, monkeypatch):
    """Totals above MAX_DV_POSITIONS no longer refuse: the valve only
    drops the broadcast hint (shuffled anti-join) and the table still
    reads correctly — positions decode executor-side either way."""
    import lcr_etl_upgrade_spark.delta_lite as dl

    path = _write_dv_table(spark, tmp_path, {})
    monkeypatch.setattr(dl, "MAX_DV_POSITIONS", 2)  # 3 deletions > 2
    df = dl.read_delta_lite(spark, path)
    # the valve must produce a SHUFFLED hash join, not just drop the
    # broadcast hint: Catalyst sizes the mapInPandas output from the
    # tiny descriptor relation, so without the explicit shuffle_hash
    # hint it would still statically plan the oversized broadcast
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan and "LeftAnti" in plan
    assert "BroadcastHashJoin" not in plan
    ids = sorted(r.id for r in df.collect())
    assert ids == [0, 2, 4, 5, 6, 8, 9]


def test_dv_anti_join_broadcast_below_valve(spark, tmp_path):
    """The common case (small DVs) keeps the broadcast anti-join plan —
    no shuffle of the fact side."""
    from lcr_etl_upgrade_spark.delta_lite import read_delta_lite

    path = _write_dv_table(spark, tmp_path, {})
    df = read_delta_lite(spark, path)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert sorted(r.id for r in df.collect()) == [0, 2, 4, 5, 6, 8, 9]


def test_vacuum_never_deletes_live_dv_file(spark, tmp_path):
    """vacuum removes only *.parquet orphans: a deletion-vector bin
    referenced by the live state survives (and orphaned DV bins are
    deliberately left in place — conservative-safe, see the docstring)."""
    from lcr_etl_upgrade_spark.delta_lite import read_delta_lite, vacuum

    path = _write_dv_table(spark, tmp_path, {})
    dv_file = next(
        f for f in os.listdir(path) if f.startswith("deletion_vector_")
    )
    # an orphan parquet that vacuum SHOULD remove, proving it ran
    with open(os.path.join(path, "orphan.parquet"), "wb") as fh:
        fh.write(b"PAR1garbagePAR1")
    removed = vacuum(spark, path)
    assert "orphan.parquet" in removed
    assert dv_file in os.listdir(path)
    assert sorted(r.id for r in read_delta_lite(spark, path).collect()) == [
        0, 2, 4, 5, 6, 8, 9,
    ]


def test_run_crossing_container_boundary_refused():
    """A run with start+length > 0xFFFF would spill values into the NEXT
    container's keyspace — count and collect would diverge. Both walkers
    refuse (review finding r7)."""
    from lcr_etl_upgrade_spark.roaring_lite import count_roaring_bitmap_array

    bm = (
        struct.pack("<I", 12347 | (0 << 16))
        + b"\x01"
        + struct.pack("<HH", 0, 1)
        + struct.pack("<H", 1)
        + struct.pack("<HH", 65535, 1)  # values 65535, 65536: crosses
    )
    blob = _rbm_array([bm])
    with pytest.raises(ValueError, match="16-bit boundary"):
        parse_roaring_bitmap_array(blob)
    with pytest.raises(ValueError, match="16-bit boundary"):
        count_roaring_bitmap_array(blob)


def test_iter_streams_containers_and_matches_parse():
    """iter_roaring_bitmap_array yields per-container batches whose union
    equals the full parse — the executor expansion path."""
    from lcr_etl_upgrade_spark.roaring_lite import iter_roaring_bitmap_array

    full = {k: [(0, 65535)] for k in range(3)}
    full[3] = [(5, 9)]
    data = _rbm_array([_run_bitmap32(full), _bitmap32_array({0: [1, 2]})])
    batches = list(iter_roaring_bitmap_array(data))
    assert all(len(b) <= 65536 for b in batches)
    got = set().union(*batches)
    assert got == parse_roaring_bitmap_array(data)
    assert len(got) == 3 * 65536 + 10 + 2


def test_multi_container_dv_streams_through_read(spark, tmp_path):
    """Pin that the executor expansion handles MULTIPLE containers per
    DV: {0:[1,3]} plus container key 1 holding value 0 -> row 65536 (not
    present in the 10-row file; harmless, exercises the per-container
    streaming buffer)."""
    from lcr_etl_upgrade_spark.delta_lite import read_delta_lite

    bitmap = _rbm_array([_bitmap32_array({0: [1, 3], 1: [0]})])
    path = tmp_path / "dvt2"
    (path / "_delta_log").mkdir(parents=True)
    sub = path / "stage"
    spark.range(10).selectExpr("id", "id * 10 as v").coalesce(1).write.parquet(
        str(sub)
    )
    f = next(n for n in os.listdir(sub) if n.endswith(".parquet"))
    os.rename(sub / f, path / "part-0.parquet")
    pad = (-len(bitmap)) % 4
    dv = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(bitmap + b"\x00" * pad),
        "sizeInBytes": len(bitmap),
        "cardinality": 3,
    }
    meta = {
        "id": "0000", "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps({"type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "long", "nullable": True, "metadata": {}},
        ]}),
        "partitionColumns": [], "configuration": {},
    }
    with open(path / "_delta_log" / f"{0:020d}.json", "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"]}}) + "\n")
        fh.write(json.dumps({"metaData": meta}) + "\n")
        fh.write(json.dumps({"add": {
            "path": "part-0.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True,
            "deletionVector": dv}}) + "\n")
    ids = sorted(r.id for r in read_delta_lite(spark, str(path)).collect())
    assert ids == [0, 2, 4, 5, 6, 7, 8, 9]


def test_header_overclaim_cannot_split_verify_and_expand():
    """The max_values bound counts ACTUAL distinct content, never the
    descriptive header's claim (review finding r7 pass 3): an array
    container claiming cardinality 2 over duplicate values [5, 5] counts
    1 distinct, so expanding under max_values=1 — exactly what the
    executor does with the driver-verified count — must succeed, not
    raise at action time after the driver-side verify passed."""
    from lcr_etl_upgrade_spark.roaring_lite import (
        count_roaring_bitmap_array,
        iter_roaring_bitmap_array,
    )

    bm = (
        struct.pack("<II", 12346, 1)
        + struct.pack("<HH", 0, 1)  # key 0, claims cardinality 2
        + struct.pack("<I", 16)
        + struct.pack("<HH", 5, 5)  # duplicate value: 1 distinct
    )
    blob = _rbm_array([bm])
    assert count_roaring_bitmap_array(blob) == 1
    assert parse_roaring_bitmap_array(blob, max_values=1) == {5}
    assert [sorted(s) for s in iter_roaring_bitmap_array(blob, max_values=1)] == [[5]]
    # the bound still trips on actual content
    with pytest.raises(ValueError, match="materialization bound"):
        parse_roaring_bitmap_array(blob, max_values=0)


def test_serialize_roundtrip_every_container_kind():
    """r8 write direction: serialize -> parse is identity across array
    containers, bitset containers (>4096), multi-container, multi-bitmap
    (values above 2^32), and boundaries; count agrees without
    materializing."""
    import random

    from lcr_etl_upgrade_spark.roaring_lite import (
        count_roaring_bitmap_array,
        parse_roaring_bitmap_array,
        serialize_roaring_bitmap_array,
    )

    cases = [
        set(),
        {0},
        {0xFFFF},       # container boundary
        {0x10000},      # second container
        {0xFFFFFFFF},   # last 32-bit value
        {1 << 32},      # second bitmap (empty bitmap 0 NOT skipped)
        {(5 << 32) | 7, 3},  # gap of empty bitmaps
        set(range(5000)),               # one bitset container
        set(range(0, 300000, 3)),       # several mixed containers
        {random.Random(7).randrange(1 << 34) for _ in range(20000)},
    ]
    for c in cases:
        blob = serialize_roaring_bitmap_array(c)
        assert parse_roaring_bitmap_array(blob) == c
        assert count_roaring_bitmap_array(blob) == len(c)


def test_serialize_rejects_out_of_range():
    import pytest

    from lcr_etl_upgrade_spark.roaring_lite import (
        serialize_roaring_bitmap_array,
    )

    with pytest.raises(ValueError, match="unsigned 64-bit"):
        serialize_roaring_bitmap_array({-1})
    with pytest.raises(ValueError, match="unsigned 64-bit"):
        serialize_roaring_bitmap_array({1 << 64})


def test_serialize_refuses_pathological_sparse_range():
    """r8 review: one huge row index would otherwise drive gigabytes of
    empty gap bitmaps (the array indexes bitmaps by high word)."""
    import pytest

    from lcr_etl_upgrade_spark.roaring_lite import (
        serialize_roaring_bitmap_array,
    )

    with pytest.raises(ValueError, match="4096"):
        serialize_roaring_bitmap_array({1 << 63})
    # 4096 bitmaps exactly is still fine
    blob = serialize_roaring_bitmap_array({(4095 << 32) | 1})
    from lcr_etl_upgrade_spark.roaring_lite import (
        parse_roaring_bitmap_array,
    )

    assert parse_roaring_bitmap_array(blob) == {(4095 << 32) | 1}
