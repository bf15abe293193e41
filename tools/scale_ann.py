#!/usr/bin/env python
"""ANN recall one decade up (round 12, verdict ask #4).

The registered recall contracts (`embedding_lsh_recall` floor 0.8,
`embedding_ivf_recall` floor 0.7 across seeds) were only ever checked
at the sf0.01/sf0.1 corpora (500 / 2,000 vectors). The open question:
does IVF's bounded driver-side centroid sample hold recall as the
corpus outgrows the sample?

This tool replicates the sf0.1 embedding corpus (2,000 unit vectors in
10 label clusters) 10x (20,000) and 30x (60,000) the way an ORGANIC
corpus grows — with more STRUCTURE, not more copies: every replica r
displaces its vectors by a replica-specific direction u_r (tau * unit
hash-vector, shared across the replica) plus a small per-vector jitter,
so 10 clusters become 10 * factor distinct clusters. A naive
near-duplicate replication (first attempt, recorded here deliberately)
measured 1.00 recall everywhere — the query's own copies dominate
top-k and hash to the query's own buckets/cells, testing nothing. The
displaced construction is the honest question: do 16 driver-sampled
centroids still route queries to their true neighborhoods when the
corpus has 100-300 clusters? Query vectors are the 10 originals the
registered queries pin (replica ids shift far above the base range;
replica 0 is unperturbed).

Measured per factor:
  - LSH recall@10 (8 tables x 4 bits x 4 probes, the registered
    config) — min and avg across the 10 queries, floor 0.8;
  - IVF recall@10 (16 cells, 8 probes, 2-assign) — CROSS-SEED MIN
    over seeds {1,7,42} like the round-4 sweep, floor 0.7; also with
    sqrt-scaled cells (n_centroids = 16 * sqrt(factor), probes scaled
    to keep the probed fraction) to record whether scaling the index
    with the corpus is needed or merely nice;
  - exact / LSH / IVF wall-times for the top-k shape.

Output: one JSON artifact (default BENCH_ann_r12.json).

Usage: python tools/scale_ann.py [--factors 10,30] [--out BENCH_ann_r12.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

BASE = "/root/testdata/sf0.1"
# per-dim uniform half-ranges; over 64 dims the displacement norm is
# ~ half_range * sqrt(64/3): TAU=0.32 -> ~1.5 vs unit vectors
# (moderately overlapping new clusters, the honest difficulty), EPS=0.05
# -> ~0.23 per-vector jitter
TAU = 0.32
EPS = 0.05
SHIFT = 10_000_000
K = 10


def _gate(idle_bar: float = 1.5, max_wait: int = 600) -> float:
    waited = 0
    while os.getloadavg()[0] > idle_bar and waited < max_wait:
        time.sleep(5)
        waited += 5
    return round(os.getloadavg()[0], 2)


def _hash_unit(cols, i, scale):
    """A deterministic pseudo-random component in [-scale/2, scale/2)
    keyed by (cols..., dim index)."""
    from pyspark.sql import functions as F

    return (
        F.pmod(F.xxhash64(*cols, i), F.lit(1000)).cast("double") / 1000.0
        - 0.5
    ) * scale


def build_corpus(spark, out_path: str, factor: int) -> None:
    from pyspark.sql import functions as F

    from lcr_etl_upgrade_spark.sources.testdata import load_table

    emb = load_table(spark, BASE, "embeddings")
    rep = F.broadcast(
        spark.range(factor).select(F.col("id").alias("__rep"))
    )
    varied = (
        emb.crossJoin(rep)
        .select(
            F.when(F.col("__rep") == 0, F.col("vec_id"))
            .otherwise(F.col("vec_id") + F.col("__rep") * SHIFT)
            .alias("vec_id"),
            F.col("__rep"),
            "embedding",
            "label",
        )
        .select(
            "vec_id",
            F.when(F.col("__rep") == 0, F.col("embedding"))
            .otherwise(
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x.cast("double")
                        # replica-level cluster displacement (shared
                        # by every vector of (label, rep))
                        + _hash_unit(
                            [F.col("label"), F.col("__rep")], i, 2 * TAU
                        )
                        # per-vector jitter
                        + _hash_unit(
                            [F.col("vec_id"), F.col("__rep")], i, 2 * EPS
                        )
                    ).cast("float"),
                )
            )
            .alias("embedding"),
            "label",
        )
    )
    varied.repartition(max(8, factor)).write.mode("overwrite").parquet(
        out_path
    )


def recall(spark, emb, approx_fn) -> tuple[float, float]:
    from pyspark.sql import functions as F

    from lcr_etl_upgrade_spark.operators.similarity import cosine_topk

    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=K, query_id="query_id").select(
        "query_id", "vec_id"
    )
    approx = approx_fn(emb, queries).select("query_id", "vec_id")
    hits = (
        exact.join(approx, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per_q = {r["query_id"]: r["n"] / K for r in hits}
    vals = [per_q.get(q, 0.0) for q in range(10)]
    return min(vals), sum(vals) / len(vals)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="10,30")
    ap.add_argument("--out", default="BENCH_ann_r12.json")
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]

    from pyspark.sql import SparkSession

    from lcr_etl_upgrade_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_lsh,
        ivf_topk,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    rec: dict = {"base_rows": 2000, "tau": TAU, "eps": EPS, "k": K,
                 "load_avg_start": _gate()}
    scratch = tempfile.mkdtemp(prefix="scale_ann_")
    try:
        for factor in factors:
            path = os.path.join(scratch, f"emb_{factor}x")
            build_corpus(spark, path, factor)
            emb = spark.read.parquet(path).cache()
            n = emb.count()
            from pyspark.sql import functions as F

            entry: dict = {"rows": n}

            queries = emb.filter(F.col("vec_id") < 10).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            t0 = time.monotonic()
            cosine_topk(emb, queries, k=K, query_id="query_id").count()
            entry["exact_sec"] = round(time.monotonic() - t0, 3)

            t0 = time.monotonic()
            lsh_min, lsh_avg = recall(
                spark,
                emb,
                lambda e, q: cosine_topk_lsh(
                    e, q, k=K, query_id="query_id",
                    bits=4, tables=8, probes=4,
                ),
            )
            entry["lsh_sec"] = round(time.monotonic() - t0, 3)
            entry["lsh_recall_min"] = round(lsh_min, 3)
            entry["lsh_recall_avg"] = round(lsh_avg, 3)
            entry["lsh_floor_met"] = lsh_min >= 0.8

            ivf_mins, ivf_avgs = [], []
            t0 = time.monotonic()
            for seed in (1, 7, 42):
                m, a = recall(
                    spark,
                    emb,
                    lambda e, q: ivf_topk(
                        e, q, k=K, n_centroids=16, n_probe=8,
                        n_assign=2, query_id="query_id", seed=seed,
                    ),
                )
                ivf_mins.append(m)
                ivf_avgs.append(a)
            entry["ivf16_sec_3seeds"] = round(time.monotonic() - t0, 3)
            entry["ivf16_recall_min_xseed"] = round(min(ivf_mins), 3)
            entry["ivf16_recall_avg"] = round(
                sum(ivf_avgs) / len(ivf_avgs), 3
            )
            entry["ivf16_floor_met"] = min(ivf_mins) >= 0.7

            # sqrt-scaled index: cells grow with sqrt(corpus), probes
            # keep the same probed FRACTION (8/16)
            cells = int(16 * math.sqrt(factor))
            probes = max(4, cells // 2)
            ivf_mins2 = []
            t0 = time.monotonic()
            for seed in (1, 7, 42):
                m, _a = recall(
                    spark,
                    emb,
                    lambda e, q: ivf_topk(
                        e, q, k=K, n_centroids=cells, n_probe=probes,
                        n_assign=2, query_id="query_id", seed=seed,
                    ),
                )
                ivf_mins2.append(m)
            entry["ivf_sqrt_cells"] = cells
            entry["ivf_sqrt_probes"] = probes
            entry["ivf_sqrt_sec_3seeds"] = round(time.monotonic() - t0, 3)
            entry["ivf_sqrt_recall_min_xseed"] = round(min(ivf_mins2), 3)

            rec[f"{factor}x"] = entry
            print(f"{factor}x", json.dumps(entry), flush=True)
            emb.unpersist()
        rec["load_avg_end"] = round(os.getloadavg()[0], 2)
        with open(args.out, "w") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        return 0
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
