#!/usr/bin/env python
"""Randomized crash-recovery differential for the streaming CDC path
(round 11, verdict ask #4).

Each case builds a fresh delta_lite table (randomly partitioned /
column-mapped / CDF-enabled) and interleaves EPOCHS of random table ops
(append, DV delete, rewrite-path UPDATE, transactional MERGE, OPTIMIZE,
RESTORE-rollback)
with availableNow runs
of the ``delta_cdf_lite`` streaming source feeding
``exactly_once_delta_sink`` — every epoch boundary is a kill/restart
from the same checkpoint. On a random epoch the case injects the
CRASH WINDOW the sink exists for: after the stream terminates, the
checkpoint's newest ``commits/<batchId>`` marker is deleted (offsets
written, commit not — exactly the state a crash between the table
commit and the stream checkpoint leaves), so the NEXT run replays that
micro-batch with the same batch id and the sink's setTransaction stamp
must skip it without staging a byte. A variant deletes the newest
``offsets/<batchId>`` too (crash before the offset write — the window
is re-planned from the previous committed offset).

Final invariant, per case: the sink table's multiset of
(data columns, _change_type, _commit_version) EQUALS the batch CDF
replay ``read_delta_changes(path, 0, latest)`` — exactly once, no
duplicates, no gaps — and the sink's txn watermark equals the last
batch id it accepted.

--mutate drop_txn removes the setTransaction stamp from the sink (plain
appends): every case whose crash injection actually replayed a batch
must now FAIL with duplicates — harness-power evidence, same convention
as the other fuzzers.

Usage: python tools/cdf_stream_fuzz.py [--seed N] [--n CASES] [--mutate M]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
from collections import Counter

import numpy as np

sys.path.insert(0, "/root/repo")

MUTATE: str | None = None
COLS = ["id", "v", "s", "_change_type", "_commit_version"]


def _rand_df(spark, rng, lo: int):
    n = int(rng.integers(1, 30))
    rows = [
        (
            int(rng.integers(lo, lo + 60)),
            int(rng.integers(0, 5)),
            str(rng.integers(0, 3)),
        )
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, "id long, v long, s string")


def _enable_cdf(spark, path, mapping):
    from lcr_etl_upgrade_spark.delta_lite import replay_log

    st = replay_log(spark, path)
    meta = dict(st.metadata)
    cfg = dict(meta.get("configuration") or {})
    cfg["delta.enableChangeDataFeed"] = "true"
    meta["configuration"] = cfg
    proto = st.protocol or {"minReaderVersion": 1, "minWriterVersion": 2}
    feats = set(proto.get("writerFeatures") or ())
    feats |= {"changeDataFeed", "appendOnly", "invariants"}
    if mapping:
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


def _random_ops(spark, rng, path, n_ops: int) -> list[str]:
    """Apply n_ops random table mutations; returns the op labels."""
    from pyspark.sql import functions as F

    from lcr_etl_upgrade_spark.delta_lite import (
        delete_rows,
        latest_version,
        optimize,
        restore_table,
        write_delta_lite,
    )

    done = []
    for _ in range(n_ops):
        op = ["append", "append", "delete", "optimize", "rollback",
              "update", "merge"][int(rng.integers(0, 7))]
        if op == "append":
            write_delta_lite(
                _rand_df(spark, rng, int(rng.integers(0, 100))),
                path,
                mode="append",
            )
        elif op == "delete":
            pred = (F.col("id") % int(rng.integers(2, 6))) == 0
            delete_rows(spark, path, pred)
        elif op == "update":
            from lcr_etl_upgrade_spark.delta_lite import update_rows

            update_rows(
                spark, path, F.col("id") % int(rng.integers(2, 6)) == 1,
                {"v": F.col("v") + int(rng.integers(1, 50))},
            )
        elif op == "merge":
            # the r12 transactional MERGE: one commit mixing rewrites,
            # deletes, and inserts — the streaming CDF source must
            # replay its authoritative mixed change rows exactly once
            from lcr_etl_upgrade_spark.delta_lite import merge_rows

            src = (
                _rand_df(spark, rng, int(rng.integers(0, 100)))
                .dropDuplicates(["id"])
                .withColumnsRenamed({"id": "k", "v": "nv", "s": "ns"})
            )
            merge_rows(
                spark, path, src, "t.id = s.k",
                matched=(
                    ("update", "s.nv % 2 = 0", {"v": "t.v + s.nv"}),
                    ("delete", None),
                ),
                not_matched=(
                    ("insert", None,
                     {"id": "s.k", "v": "s.nv", "s": "s.ns"}),
                ),
            )
        elif op == "optimize":
            if optimize(spark, path,
                        target_file_bytes=1 << 20)["version"] is None:
                continue
        elif op == "rollback":
            cur = latest_version(path)
            if cur < 1:
                continue
            target = int(rng.integers(0, cur))
            try:
                if restore_table(spark, path, target)["version"] is None:
                    continue
            except NotImplementedError:
                continue  # documented DV-revert-on-CDF refusal
        done.append(op)
    return done


def _run_stream_epoch(spark, path, ckpt, sink_path, app_id) -> None:
    from lcr_etl_upgrade_spark.sinks.registry import exactly_once_delta_sink

    if MUTATE == "drop_txn":
        from lcr_etl_upgrade_spark.delta_lite import write_delta_lite

        def sink(df, batch_id):  # plain append: replays now duplicate
            write_delta_lite(df, sink_path, mode="append")
    else:
        sink = exactly_once_delta_sink(sink_path, app_id)
    stream = (
        spark.readStream.format("delta_cdf_lite")
        .option("path", path)
        .load()
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _inject_crash(ckpt: str, rng) -> bool:
    """Delete the newest commits/<batchId> marker — the EXACT state a
    crash between the sink's table commit and the stream's checkpoint
    commit leaves behind (offsets/<batchId> stays: Structured Streaming
    durably writes the offset WAL BEFORE invoking foreachBatch, so a
    state where the sink committed batch N but offsets/N is gone is a
    corrupted WAL, not a reachable crash — and deleting it here would
    make the re-planned batch N absorb NEWER versions under the same
    batch id, which the txn stamp must rightly skip: simulated loss,
    not a bug). True when something was injected."""
    commits = os.path.join(ckpt, "commits")
    if not os.path.isdir(commits):
        return False
    ids = sorted(
        int(f) for f in os.listdir(commits) if f.isdigit()
    )
    if not ids:
        return False
    newest = str(ids[-1])
    for f in (newest, f".{newest}.crc"):  # local-FS checksum sidecar
        p = os.path.join(commits, f)
        if os.path.isfile(p):
            os.remove(p)
    return True


def run_case(spark, rng, i: int) -> dict | None:
    from lcr_etl_upgrade_spark.delta_lite import (
        latest_version,
        read_delta_changes,
        read_delta_lite,
        replay_log,
        write_delta_lite,
    )

    tmp = tempfile.mkdtemp(prefix="cdf_stream_fuzz_")
    path = os.path.join(tmp, "t")
    sink_path = os.path.join(tmp, "sink")
    ckpt = os.path.join(tmp, "ckpt")
    app_id = f"cdc-fuzz-{i}"
    try:
        part = bool(rng.random() < 0.3)
        mapping = "name" if rng.random() < 0.25 else None
        write_delta_lite(
            _rand_df(spark, rng, 0),
            path,
            partition_by=("s",) if part else (),
            column_mapping=mapping,
        )
        if rng.random() < 0.4:
            _enable_cdf(spark, path, mapping)
        n_epochs = int(rng.integers(2, 5))
        crash_after = int(rng.integers(0, n_epochs - 1))
        injected = False
        epochs = []
        for e in range(n_epochs):
            ops = _random_ops(spark, rng, path, int(rng.integers(1, 4)))
            epochs.append(ops)
            _run_stream_epoch(spark, path, ckpt, sink_path, app_id)
            if e == crash_after:
                injected = _inject_crash(ckpt, rng)
        # one final clean epoch so a replayed batch has room to land
        _run_stream_epoch(spark, path, ckpt, sink_path, app_id)

        latest = latest_version(path)
        oracle = Counter(
            tuple(r[c] for c in COLS)
            for r in read_delta_changes(spark, path, 0, latest).collect()
        )
        got = Counter(
            tuple(r[c] for c in COLS)
            for r in read_delta_lite(spark, sink_path).collect()
        )
        if got != oracle:
            dup = sum((got - oracle).values())
            missing = sum((oracle - got).values())
            return {
                "kind": "stream_sink_mismatch", "epochs": epochs,
                "injected": injected, "dup_rows": dup,
                "missing_rows": missing,
                "oracle_rows": sum(oracle.values()),
                "sink_rows": sum(got.values()),
            }
        if MUTATE != "drop_txn":
            # the sink's txn watermark must exist and match the last
            # accepted batch id (the checkpoint's newest commit marker)
            st = replay_log(spark, sink_path)
            if app_id not in (st.txns or {}):
                return {"kind": "txn_stamp_missing", "epochs": epochs}
        return None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    global MUTATE
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=20260816)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--mutate", default=None)
    ap.add_argument("--case", type=int, default=None)
    args = ap.parse_args()
    MUTATE = args.mutate

    from lcr_etl_upgrade_spark.session import get_session
    from lcr_etl_upgrade_spark.streaming.cdf_source import (
        DeltaCdfLiteDataSource,
    )

    spark = get_session("cdf_stream_fuzz")
    spark.dataSource.register(DeltaCdfLiteDataSource)
    failures = []
    for i in range(args.n):
        if args.case is not None and i != args.case:
            continue
        rng = np.random.default_rng(args.seed * 1_000_003 + i)
        rec = run_case(spark, rng, i)
        if rec is not None:
            failures.append({"i": i, **rec})
            print(f"FAIL case {i}: {json.dumps(failures[-1])[:500]}",
                  file=sys.stderr)
    print(json.dumps({
        "seed": args.seed, "n": args.n, "mutate": MUTATE,
        "failures": failures, "ok": not failures,
    }))
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
