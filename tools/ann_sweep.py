"""Sweep ANN configs (hyperplane-LSH tables x bits, IVF cells x probes)
and report per-query recall@10 vs the exact baseline, plus wall time of
the registered top-k query shape (k=5, 3 queries) at each config.

Purpose (round-4 verdict ask #3): the registered-query defaults and the
contract floors in plans/llm.py must be *chosen from measurement*, not
guessed. This tool produces the measurement; the chosen config is then
pinned in plans/llm.py with the sweep table cited in the docstring.

Usage: python tools/ann_sweep.py [sf_dir ...]
Defaults to sf0.01 and sf0.1. IVF is swept across seeds {1,7,42} and the
reported recall is the cross-seed minimum (KMeans is seeded; a floor
that only one lucky seed meets is not a contract).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from lcr_etl_upgrade_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    cosine_topk_lsh,
    ivf_topk,
)
from lcr_etl_upgrade_spark.session import get_session  # noqa: E402
from lcr_etl_upgrade_spark.sources.testdata import load_table  # noqa: E402

K = 10
N_QUERIES = 10

# (bits, tables, probes) — probes > 1 is multi-probe (Hamming-1 flips of
# the lowest-|proj| bits, query side only)
LSH_GRID = [
    (4, 8, 1),
    (4, 8, 3),
    (4, 8, 4),
    (4, 16, 1),
    (4, 16, 3),
    (6, 8, 4),
    (6, 16, 3),
]
# (cells, probes, assign) — assign > 1 is redundant corpus assignment
IVF_GRID = [
    (8, 4, 1),
    (8, 4, 2),
    (8, 6, 1),
    (8, 6, 2),
    (16, 4, 2),
    (16, 6, 2),
    (16, 8, 2),
]
IVF_SEEDS = [1, 7, 42]


def recall_stats(exact, approx):
    hits = (
        exact.join(approx, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    rows = hits.collect()
    by_q = {r["query_id"]: r["n_hits"] / K for r in rows}
    recalls = [by_q.get(q, 0.0) for q in range(N_QUERIES)]
    return min(recalls), sum(recalls) / len(recalls)


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_session("ann-sweep")
    for sf_dir in sf_dirs:
        emb = load_table(spark, sf_dir, "embeddings").cache()
        emb.count()
        queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = (
            cosine_topk(emb, queries, k=K, query_id="query_id")
            .select("query_id", "vec_id")
            .cache()
        )
        exact.count()
        print(f"\n=== {sf_dir} (corpus={emb.count()}) ===")
        print("LSH (bits, tables, probes): min/avg recall@10; topk(k=5,3q) wall")
        for bits, tables, probes in LSH_GRID:
            approx = cosine_topk_lsh(
                emb,
                queries,
                k=K,
                query_id="query_id",
                bits=bits,
                tables=tables,
                probes=probes,
            ).select("query_id", "vec_id")
            mn, avg = recall_stats(exact, approx)
            q3 = emb.filter(F.col("vec_id") < 3).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            t0 = time.monotonic()
            cosine_topk_lsh(
                emb,
                q3,
                k=5,
                query_id="query_id",
                bits=bits,
                tables=tables,
                probes=probes,
            ).collect()
            wall = time.monotonic() - t0
            print(
                f"  bits={bits} tables={tables:>2} probes={probes}: "
                f"min={mn:.2f} avg={avg:.2f}  wall={wall:.2f}s"
            )
        print("IVF (cells, probes, assign): cross-seed min / avg-of-avgs recall@10")
        for cells, probes, assign in IVF_GRID:
            mins, avgs = [], []
            for seed in IVF_SEEDS:
                approx = ivf_topk(
                    emb,
                    queries,
                    k=K,
                    n_centroids=cells,
                    n_probe=probes,
                    query_id="query_id",
                    seed=seed,
                    n_assign=assign,
                ).select("query_id", "vec_id")
                mn, avg = recall_stats(exact, approx)
                mins.append(mn)
                avgs.append(avg)
            print(
                f"  cells={cells:>2} probes={probes} assign={assign}: "
                f"xseed-min={min(mins):.2f} avg={sum(avgs)/len(avgs):.2f} "
                f"(per-seed mins: {['%.2f' % m for m in mins]})"
            )
        emb.unpersist()
        exact.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
