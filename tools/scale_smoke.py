"""Scale smoke: replicate sf0.1 tables ~Nx into /tmp (keys shifted so
cardinalities grow, not just row counts) and time the headline queries.

Purpose: verify the plans scale ~linearly and AQE picks sane strategies
(sort-merge vs broadcast) when the fact tables stop being tiny — the
"would this survive a 100x scale-up" check, run at 10x by default.

Usage: python tools/scale_smoke.py [factor]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

BASE = "/root/testdata/sf0.1"


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pyspark.sql import functions as F

    from lcr_etl_upgrade_spark.plans import QUERIES
    from lcr_etl_upgrade_spark.session import get_session
    from lcr_etl_upgrade_spark.sources.testdata import TABLES, load_table

    out_dir = tempfile.mkdtemp(prefix="scale_smoke_")
    spark = get_session("scale_smoke")
    try:
        key_cols = {
            "lineitem": ("l_orderkey",),
            "orders": ("o_orderkey", "o_custkey"),
            "customer": ("c_custkey",),
            "events": ("event_id", "user_id"),
            "documents": ("doc_id",),
            "embeddings": ("vec_id",),
        }
        for t in TABLES:
            df = load_table(spark, BASE, t)
            if t in key_cols:
                rep = df.crossJoin(
                    F.broadcast(
                        spark.range(factor).select(F.col("id").alias("__rep"))
                    )
                )
                shift = 10_000_000
                for kcol in key_cols[t]:
                    rep = rep.withColumn(
                        kcol, F.col(kcol) + F.col("__rep") * shift
                    )
                df = rep.drop("__rep")
            df.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")

        n = spark.read.parquet(f"{out_dir}/lineitem.parquet").count()
        print(f"scaled lineitem rows: {n}")

        def last_executed_plan() -> str:
            """Final adaptive plan of the MOST RECENT SQL execution, read
            from the SQL status store (AQE rewrites the stored description
            as it re-plans) — the plan of the exact run that was timed,
            with no re-execution and no count()-wrapper whose column
            pruning could shift AQE's join strategy choices."""
            try:
                execs = (
                    spark._jsparkSession.sharedState().statusStore().executionsList()
                )
                if execs.isEmpty():
                    return ""
                desc = execs.last().physicalPlanDescription()
                # AQE descriptions carry "== Final Plan ==" followed by
                # "== Initial Plan ==" — keep only what actually ran
                return desc.split("== Initial Plan ==")[0]
            except Exception:
                return ""

        def histogram(plan: str) -> str:
            counts = {
                label: plan.count(token)
                for label, token in [
                    ("BHJ", "BroadcastHashJoin"),
                    ("SMJ", "SortMergeJoin"),
                    ("SHJ", "ShuffledHashJoin"),
                    ("skew", "skew=true"),
                ]
            }
            return " ".join(f"{k}={v}" for k, v in counts.items() if v)

        for name in [
            "q1_pricing_summary",
            "q3_shipping_priority",
            "q5_nation_revenue",
            "window_topk_per_group",
            "events_sessionization",
            "events_asof_join",
            "doc_minhash_near_dup",
            "doc_dedup_exact",
            "embedding_cosine_topk",
            "q18_large_orders",
        ]:
            times, plans = {}, {}
            for label, sf_dir in (("1x", BASE), (f"{factor}x", out_dir)):
                # best-of-2: a single sample right after the big replica
                # write is GC/page-cache polluted enough to invert ratios
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    QUERIES[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - t0)
                    plans[label] = histogram(last_executed_plan())
                    spark.catalog.clearCache()
                times[label] = best
            ratio = times[f"{factor}x"] / max(times["1x"], 1e-9)
            print(
                f"{name}: 1x={times['1x']:.2f}s {factor}x={times[f'{factor}x']:.2f}s "
                f"ratio={ratio:.1f} | plan@1x [{plans['1x']}] "
                f"plan@{factor}x [{plans[f'{factor}x']}]"
            )
    finally:
        spark.stop()
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
