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

def _busy_jiffies() -> int:
    """System-wide non-idle jiffies from /proc/stat (all CPUs)."""
    with open("/proc/stat") as f:
        vals = list(map(int, f.readline().split()[1:]))
    return sum(vals) - vals[3] - vals[4]  # minus idle + iowait


def _tree_jiffies(pid: int) -> int:
    """utime+stime (+ reaped-children cutime/cstime) summed over `pid`
    and every live descendant - the bench's OWN CPU, python + JVM.
    Invariant to children being reaped mid-window: a child's jiffies
    move from its /proc entry into the parent's cutime, so the tree sum
    is cumulative either way."""
    procs: dict[int, tuple[int, int]] = {}
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat", "rb") as f:
                s = f.read()
        except OSError:
            continue  # raced with process exit
        rest = s[s.rindex(b")") + 2:].split()
        procs[int(p)] = (
            int(rest[1]),
            int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14]),
        )
    kids: dict[int, list[int]] = {}
    for q, (pp, _) in procs.items():
        kids.setdefault(pp, []).append(q)
    total, stack = 0, [pid]
    while stack:
        q = stack.pop()
        if q in procs:
            total += procs[q][1]
            stack.extend(kids.get(q, []))
    return total


class ExtMeter:
    """Average EXTERNAL core usage over a window: system-wide busy CPU
    minus this process tree's CPU, per wall second. This is the
    discriminator the load average cannot be (r7: a +1.83 s drift at
    peak load 4.51 needed forensics to attribute) - self-load cancels
    out exactly, so any nonzero reading IS co-tenant contention.
    Calibrated on this container: idle reads ~0.01 cores, and 4
    saturating self-spinners still read ~0.01."""

    def __init__(self) -> None:
        self._hz = os.sysconf("SC_CLK_TCK")
        self._pid = os.getpid()

    def start(self) -> None:
        self._b0 = _busy_jiffies()
        self._t0 = _tree_jiffies(self._pid)
        self._w0 = time.perf_counter()

    def stop(self) -> float:
        wall = max(time.perf_counter() - self._w0, 1e-6)
        ext = (_busy_jiffies() - self._b0) - (
            _tree_jiffies(self._pid) - self._t0
        )
        return max(ext / self._hz / wall, 0.0)


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
    # r14 (additive — never remove/rename existing rows): the
    # approx-first percentile twin, benched so the 100 TB routing
    # guidance (approx_percentile's mergeable sketch instead of
    # agg_percentiles' exact per-key value->count maps) is a measured
    # row, not prose. The exact query stays a correctness contract
    # (oracle-pinned), unbenchmarked: its cost is the definition.
    "agg_approx_percentiles",
]


def main() -> None:
    global HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    # optional subset (scale runs time a scan-heavy slice at big SFs
    # without paying the full battery); unknown names fail loudly
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if subset:
        # any REGISTERED query is timeable (scale runs measure operators
        # outside the 22-query headline set); the default run list —
        # what the driver records round over round — is unchanged
        from lcr_etl_upgrade_spark.plans import QUERIES as _ALL

        names = [s.strip() for s in subset.split(",") if s.strip()]
        unknown = [s for s in names if s not in _ALL]
        if unknown:
            raise SystemExit(f"unknown bench queries: {unknown}")
        HEADLINE = names

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
    # load_avg_peak is kept for cross-round continuity only; it mixes
    # self-load with co-tenant steal (r7's +1.83 s drift at peak 4.51
    # needed forensics). The authoritative contention signal is now
    # per-query ext_cores below.
    load_peak = load_avg_start
    # Self-invalidating per-query gate (r8): measure EXTERNAL core usage
    # across each query's best-of-N window; if co-tenants used more than
    # ext_bar cores on average, the window is contended - discard it and
    # re-run the query (bounded retries). On a quiet box this adds
    # nothing; under transient contention the kept number is from a
    # clean window instead of carrying pollution into the artifact.
    ext_bar = float(os.environ.get("SPARK_GRAFT_BENCH_EXT_BAR", "0.5"))
    max_retries = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_RETRIES", "2"))
    meter = ExtMeter()
    ext_cores: dict[str, float] = {}
    retries: dict[str, int] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        best_attempt = None  # (ext, samples)
        for attempt in range(1 + max_retries):
            samples = []
            meter.start()
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            ext = meter.stop()
            if best_attempt is None or ext < best_attempt[0]:
                best_attempt = (ext, samples)
            if ext <= ext_bar:
                break
            if attempt < max_retries:  # a re-run will actually happen
                retries[name] = retries.get(name, 0) + 1
        ext, samples = best_attempt
        ext_cores[name] = round(ext, 3)
        load_peak = max(load_peak, os.getloadavg()[0])
        timings[name] = round(min(samples), 3)
        # max-min across the runs: the jitter band for THIS query on THIS
        # box, so a cross-round delta smaller than the spread is noise,
        # not a regression (r4->r5 ask: embedding_cosine_topk drifted
        # +10% with an unchanged pinned plan)
        spread[name] = round(max(samples) - min(samples), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # full diagnostics FIRST (one line, for BENCH_NOTES.md and humans);
    # the FINAL line is the driver contract and is kept COMPACT because
    # the driver records only a bounded tail of stdout — r8's committed
    # artifact had this very line truncated mid-object (parsed: null)
    detail = {
        "spread": spread,
        "load_avg_start": load_avg_start,
        "load_avg_end": round(os.getloadavg()[0], 2),
        "load_avg_peak": round(load_peak, 2),
        "ext_cores": ext_cores,
        "ext_bar": ext_bar,
        "busy_waited_sec": waited,
        "idle_bar": idle_bar,
        "idle_bar_met": idle_bar_met,
        "cpu_count": os.cpu_count(),
        "bench_runs": runs,
    }
    print("DETAIL " + json.dumps(detail, separators=(",", ":")))
    summary = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "ext_cores_max": round(max(ext_cores.values()), 3),
        "ext_bar_met": max(ext_cores.values()) <= ext_bar,
        "query_retries": retries,
    }
    line = json.dumps(summary, separators=(",", ":"))
    if len(line) > 1900:  # stay inside the driver's tail window
        summary["queries"] = {
            k: v for k, v in sorted(
                timings.items(), key=lambda kv: -kv[1]
            )[:20]
        }
        summary["queries_truncated_to_top"] = 20
        line = json.dumps(summary, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
