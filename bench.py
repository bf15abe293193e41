"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (materializes
every row through the full plan without driver-side transfer), timed after
a session warm-up so JVM startup isn't attributed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "agg_order_stats",
    "agg_rollup",
    "join_left_outer",
    "join_semi",
    "window_topk_per_group",
    "window_running_analytics",
    "events_sessionization",
    "events_tumbling_window",
    "events_asof_join",
    "doc_dedup_exact",
    "doc_minhash_near_dup",
    "doc_text_stats",
    "embedding_cosine_topk",
    "embedding_cosine_topk_vectorized",
    "pipeline_lead_end_to_end",
    "pipeline_lead_assignment_end_to_end",
    "merge_scd2",
    "merge_upsert",
    "q10_returned_items",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    # Machine-contention guard: a loaded box inflates single-shot times up
    # to ~8x on identical plans (BENCH_r02 recorded ~15% total noise from
    # being launched 90s after a correctness pass; r5 ran at load 2.49 and
    # its total drifted +1.97s against unchanged pinned plans). Wait for
    # the 1-min load average to decay below the idle bar — bounded, so a
    # number is always produced — and annotate the JSON with the load
    # context plus whether the bar was met, so cross-round totals are only
    # compared when both runs started idle.
    idle_bar = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_BAR", "1.0"))
    max_wait = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT", "300"))
    waited = 0
    while os.getloadavg()[0] > idle_bar and waited < max_wait:
        time.sleep(10)
        waited += 10
    load_avg_start = round(os.getloadavg()[0], 2)
    idle_bar_met = load_avg_start <= idle_bar

    from lcr_etl_upgrade_spark.plans import QUERIES
    from lcr_etl_upgrade_spark.session import get_session

    spark = get_session("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    # Warm-up: run every headline query once at the tiny SF so measured
    # times reflect steady-state execution (codegen compiled, AQE paths
    # exercised, readers open) rather than first-call JIT cost.
    warm_sf = "/root/testdata/sf0.001"
    for name in HEADLINE:
        try:
            QUERIES[name](spark, warm_sf).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    spark.catalog.clearCache()  # drop tiny-SF persists from warm-up
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # best-of-N: container load makes single-shot times vary up to ~8x on
    # identical plans; the minimum is the reproducible engine cost. N=3:
    # at N=2 the second run is still JIT-warming the target-SF AQE plan
    # shapes (minhash measured 2.03s best-of-2 vs 1.78s steady-state);
    # the cache is cleared between runs so every run is end-to-end.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    # start-idle is not run-idle (r7: a gated run drifted +2.6 s from
    # co-tenant load arriving MID-run, near-uniform across queries) —
    # sample the 1-min load after each query and report the peak. The
    # peak INCLUDES the bench's own burst load (32 executor threads
    # against a 60 s damping window), but that self-load profile is the
    # same every round: quiet r6-style runs peak ~1.5-2, so a peak well
    # above that band flags external contention and the total carries
    # its own invalidation instead of needing forensics.
    load_peak = load_avg_start
    for name in HEADLINE:
        fn = QUERIES[name]
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        load_peak = max(load_peak, os.getloadavg()[0])
        timings[name] = round(min(samples), 3)
        # max-min across the runs: the jitter band for THIS query on THIS
        # box, so a cross-round delta smaller than the spread is noise,
        # not a regression (r4->r5 ask: embedding_cosine_topk drifted
        # +10% with an unchanged pinned plan)
        spread[name] = round(max(samples) - min(samples), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "load_avg_start": load_avg_start,
                "load_avg_end": round(os.getloadavg()[0], 2),
                "load_avg_peak": round(load_peak, 2),
                "busy_waited_sec": waited,
                "idle_bar": idle_bar,
                "idle_bar_met": idle_bar_met,
                "cpu_count": os.cpu_count(),
                "bench_runs": runs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
