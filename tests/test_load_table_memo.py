"""Focused pins for the load_table DataFrame memo (r13 optimization).

The memo hands every query the same plan OBJECT for the same
(session, file, mtime) — pure driver-side metadata reuse. These tests pin
the two properties that make it safe: identity on a hit, and invalidation
(fresh plan AND fresh data) when the file is rewritten.
"""

from __future__ import annotations

import os
import shutil
import time

from lcr_etl_upgrade_spark.sources.testdata import load_table


def test_memo_hit_returns_same_plan_object(spark):
    a = load_table(spark, "/root/testdata/sf0.001", "nation")
    b = load_table(spark, "/root/testdata/sf0.001", "nation")
    assert a is b  # one relation build per (session, file, mtime)


def test_memo_invalidates_on_rewrite(spark, tmp_path):
    sf = str(tmp_path)
    src = "/root/testdata/sf0.001/nation.parquet"
    dst = os.path.join(sf, "nation.parquet")
    shutil.copyfile(src, dst)
    first = load_table(spark, sf, "nation")
    n_first = first.count()

    # rewrite with fewer rows; force a distinct mtime even on coarse clocks
    first.limit(3).write.mode("overwrite").parquet(os.path.join(sf, "tmp"))
    part = [
        f
        for f in os.listdir(os.path.join(sf, "tmp"))
        if f.endswith(".parquet")
    ][0]
    shutil.copyfile(os.path.join(sf, "tmp", part), dst)
    os.utime(dst, (time.time() + 5, time.time() + 5))

    second = load_table(spark, sf, "nation")
    assert second is not first  # mtime change dropped the entry
    assert second.count() == 3
    assert n_first != 3


def test_memo_result_matches_fresh_read(spark):
    memoed = load_table(spark, "/root/testdata/sf0.001", "customer")
    fresh = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    assert memoed.schema == fresh.schema
    assert memoed.count() == fresh.count()
