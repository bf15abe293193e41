"""Multi-split scan proof point (r14 ask #7).

Every sf0.1 testdata table is ONE parquet file with ONE row group, so
every pre-shuffle stage in the driver's bench is a single split: the
8-vs-32-core scaling block can only measure task-scheduling overhead,
and every ratio lands <= 1. This tool materializes the factor-10
replica (tools/bench_sf1.build — same organic variation discipline)
with a SPLIT-FRIENDLY layout — each table repartitioned into
``--files`` parquet files before the write — and then runs the
UNMODIFIED bench.py over it at 32 and at 8 cores, recording per-query
core-scaling ratios (t8/t32; > 1 means the extra cores helped).

Expectation being validated: once splits exist, scan-bound queries
parallelize their pre-shuffle stages and the ratios move toward the
core ratio, confirming that the engine's single-split mitigations
(fan_out) are layout workarounds and structural no-ops on real
multi-split inputs.

Usage: python tools/scale_splits.py [--out SCALE_SPLITS_r14.json]
       [--factor 10] [--files 32] [--cpus-high 32] [--cpus-low 8]
       [--queries q1_pricing_summary,...] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _run_bench(out_dir: str, cpus: int, queries: str | None) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=out_dir,
        SPARK_GRAFT_CPUS=str(cpus),
    )
    if queries:
        env["SPARK_GRAFT_BENCH_QUERIES"] = queries
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        env=env,
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=3600,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    summary = next(
        (
            json.loads(ln)
            for ln in reversed(lines)
            if ln.startswith("{") and '"metric"' in ln
        ),
        None,
    )
    if summary is None:
        raise RuntimeError(
            f"bench at cpus={cpus} produced no summary; tail: {lines[-3:]}"
        )
    return summary


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALE_SPLITS_r14.json")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--files", type=int, default=32,
                    help="parquet files (= max scan splits) per table")
    ap.add_argument("--cpus-high", type=int, default=32)
    ap.add_argument("--cpus-low", type=int, default=8)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from bench_sf1 import build

    from lcr_etl_upgrade_spark.session import get_session
    from lcr_etl_upgrade_spark.sources.testdata import TABLES

    parent = tempfile.mkdtemp(prefix="spark_graft_splits_")
    sf_label = args.factor / 10.0
    raw = os.path.join(parent, "raw")
    out_dir = os.path.join(parent, f"sf{sf_label}")  # bench.py parses sf
    os.makedirs(raw)
    os.makedirs(out_dir)
    spark = get_session("scale_splits_build")
    try:
        build(spark, raw, args.factor)
        # split-friendly rewrite: N files per table -> N scan splits
        # (each file is one row group at this size)
        for t in TABLES:
            df = spark.read.parquet(f"{raw}/{t}.parquet")
            df.repartition(args.files).write.mode("overwrite").parquet(
                f"{out_dir}/{t}.parquet"
            )
        # events.parquet carries nanos timestamps the plain reader cannot
        # rewrite faithfully on every Spark version — copy it verbatim if
        # the rewrite dropped it (load_table handles the nanos flag).
    finally:
        spark.stop()
    shutil.rmtree(raw, ignore_errors=True)

    rec: dict = {
        "factor": args.factor,
        "files_per_table": args.files,
        "cpus_high": args.cpus_high,
        "cpus_low": args.cpus_low,
    }
    try:
        hi = _run_bench(out_dir, args.cpus_high, args.queries)
        lo = _run_bench(out_dir, args.cpus_low, args.queries)
        rec["high"] = hi
        rec["low"] = lo
        rec["ratios_low_over_high"] = {
            q: round(lo["queries"][q] / hi["queries"][q], 2)
            for q in hi.get("queries", {})
            if q in lo.get("queries", {}) and hi["queries"][q] > 0
        }
        rec["total_ratio"] = round(lo["value"] / hi["value"], 2)
    finally:
        if not args.keep:
            shutil.rmtree(parent, ignore_errors=True)
    with open(args.out, "w") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
