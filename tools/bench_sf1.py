"""sf1.0 bench run (round-9 ask #6): materialize a ~10x sf0.1 dataset
(~6M lineitem rows — TPC-H sf1 scale) and run the SAME gated bench.py
over it, validating the scaling curve SCALE.md extrapolates from
replications.

Dataset construction (into /tmp, layout identical to the driver's
testdata so ``sources.testdata.load_table`` just works):

- relational tables replicate 10x with CONSISTENT key shifts: lineitem
  shifts l_orderkey/l_partkey/l_suppkey, orders o_orderkey/o_custkey,
  customer/part/supplier their primary keys — so every join's
  per-replica structure (hit rates, fan-out) matches sf0.1 exactly
  while all cardinalities grow 10x, the same discipline as
  tools/scale_smoke.py;
- events shifts event_id/user_id (10x users, same events-per-user);
- documents get tools/scale_llm.py's ORGANIC variation (replica-unique
  token interleaved between words: corpus 10x, duplicate RATE
  unchanged — verbatim replicas would put MinHash in the flood regime
  and measure the guard, not the organic path);
- embeddings get the per-(row, rep, coordinate) perturbation (cluster
  structure survives, no identical vectors);
- region/nation copy verbatim (fixed-size dims at every SF).

Then bench.py runs as a SUBPROCESS with SPARK_GRAFT_SF_DIR pointing at
the replica — same ext-core metering, same best-of-3, same gating —
and the parsed summary + DETAIL lines land in BENCH_sf1_r09.json
alongside the per-query sf0.1 baseline ratios.

Usage: python tools/bench_sf1.py [--out BENCH_sf1_r09.json]
       [--baseline <sf0.1 bench json>] [--keep]
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

BASE = "/root/testdata/sf0.1"
FACTOR = 10  # default; --factor 100 gives the sf10 point (round 10)
SHIFT = 10_000_000

KEY_COLS = {
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "orders": ("o_orderkey", "o_custkey"),
    "customer": ("c_custkey",),
    "part": ("p_partkey",),
    "supplier": ("s_suppkey",),
    "events": ("event_id", "user_id"),
}


def build(spark, out_dir: str, factor: int = FACTOR) -> None:
    from pyspark.sql import functions as F

    from lcr_etl_upgrade_spark.sources.testdata import TABLES, load_table

    rep = F.broadcast(
        spark.range(factor).select(F.col("id").alias("__rep"))
    )
    for t in TABLES:
        df = load_table(spark, BASE, t)
        if t in KEY_COLS:
            r = df.crossJoin(rep)
            for kcol in KEY_COLS[t]:
                r = r.withColumn(kcol, F.col(kcol) + F.col("__rep") * SHIFT)
            df = r.drop("__rep")
        elif t == "documents":
            df = df.crossJoin(rep).select(
                (F.col("doc_id") + F.col("__rep") * SHIFT).alias("doc_id"),
                F.when(F.col("__rep") == 0, F.col("text"))
                .otherwise(
                    F.regexp_replace(
                        F.col("text"),
                        "\\s+",
                        F.concat(
                            F.lit(" r"),
                            F.col("__rep").cast("string"),
                            F.lit(" "),
                        ),
                    )
                )
                .alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        elif t == "embeddings":
            r = df.crossJoin(rep)
            noise = F.transform(  # scale_llm.py's exact perturbation
                F.col("embedding"),
                lambda x, i: x
                + F.when(F.col("__rep") == 0, F.lit(0.0)).otherwise(
                    (
                        F.pmod(
                            F.xxhash64(
                                F.col("vec_id"), F.col("__rep"), i
                            ),
                            F.lit(10_000),
                        ).cast("double")
                        / F.lit(10_000.0)
                        - F.lit(0.5)
                    )
                    * F.lit(0.3)
                ),
            )
            df = r.select(
                (F.col("vec_id") + F.col("__rep") * SHIFT).alias("vec_id"),
                noise.alias("embedding"),
            )
        df.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    n = spark.read.parquet(f"{out_dir}/lineitem.parquet").count()
    print(f"replica lineitem rows: {n}", file=sys.stderr)


def rollup_peak_memory(out_dir: str) -> dict:
    """Run agg_rollup once with the Spark UI on and report the max
    per-stage peakExecutionMemory (execution-memory high-water across
    the stage's tasks) plus per-stage spill counters — the round-10
    bound check on the Expand x3 multiplier. A fresh session, so the
    measurement is not polluted by bench state."""
    import urllib.request

    from lcr_etl_upgrade_spark.plans import QUERIES
    from lcr_etl_upgrade_spark.session import get_session

    spark = None
    try:
        # session construction INSIDE the try: a JVM-spawn/port failure
        # here must degrade to an error record, not discard the whole
        # just-measured bench run
        spark = get_session(
            "rollup_mem", extra_conf={"spark.ui.enabled": "true"}
        )
        QUERIES["agg_rollup"](spark, out_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        ui = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ) as resp:
            stages = json.loads(resp.read())
        rec = {
            "peak_execution_memory_bytes": max(
                (s.get("peakExecutionMemory", 0) for s in stages),
                default=0,
            ),
            "memory_spilled_bytes": sum(
                s.get("memoryBytesSpilled", 0) for s in stages
            ),
            "disk_spilled_bytes": sum(
                s.get("diskBytesSpilled", 0) for s in stages
            ),
            "n_stages": len(stages),
        }
        return rec
    except Exception as exc:  # metric capture must never fail the bench
        return {"error": repr(exc)[:300]}
    finally:
        if spark is not None:
            spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_sf1_r09.json")
    ap.add_argument("--baseline", default=None,
                    help="sf0.1 bench json for per-query ratios")
    ap.add_argument("--factor", type=int, default=FACTOR,
                    help="replication factor over sf0.1 (10 = sf1, "
                         "100 = sf10)")
    ap.add_argument("--queries", default=None,
                    help="comma-separated bench subset (passed through "
                         "as SPARK_GRAFT_BENCH_QUERIES)")
    ap.add_argument("--rollup-mem", action="store_true",
                    help="also capture agg_rollup peak-memory/spill "
                         "stage metrics at this SF")
    ap.add_argument("--keep", action="store_true",
                    help="keep the replica directory")
    args = ap.parse_args()

    from lcr_etl_upgrade_spark.session import get_session

    parent = tempfile.mkdtemp(prefix="spark_graft_")
    sf_label = args.factor / 10.0
    out_dir = os.path.join(parent, f"sf{sf_label}")  # bench.py parses sf
    os.makedirs(out_dir)
    spark = get_session("bench_sf1_build")
    try:
        build(spark, out_dir, args.factor)
    finally:
        spark.stop()

    env = dict(os.environ, SPARK_GRAFT_SF_DIR=out_dir)
    if args.queries:
        env["SPARK_GRAFT_BENCH_QUERIES"] = args.queries
    proc = subprocess.run(
        [sys.executable, "bench.py"], env=env, cwd="/root/repo",
        capture_output=True, text=True, timeout=3600,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    detail = next(
        (json.loads(ln[len("DETAIL "):]) for ln in lines
         if ln.startswith("DETAIL ")), None,
    )
    summary = next(
        (json.loads(ln) for ln in reversed(lines)
         if ln.startswith("{")), None,
    )
    record: dict = {"factor": args.factor, "summary": summary,
                    "detail": detail, "rc": proc.returncode}
    if args.rollup_mem:
        record["rollup_memory"] = rollup_peak_memory(out_dir)
    if args.baseline and summary:
        base = json.load(open(args.baseline))
        bq = (base.get("summary") or base).get("queries") or {}
        record["vs_sf0_1"] = {
            k: round(v / bq[k], 2)
            for k, v in summary["queries"].items()
            if bq.get(k)
        }
    with open(args.out, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps({"ok": summary is not None,
                      "total": summary and summary.get("value")}))
    if not args.keep:
        shutil.rmtree(parent, ignore_errors=True)
    return 0 if summary else 1


if __name__ == "__main__":
    sys.exit(main())
