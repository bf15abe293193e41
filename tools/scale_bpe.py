#!/usr/bin/env python
"""BPE training/apply scale decades (round 11, verdict ask #2).

``doc_bpe_train_stats`` was the one round-10 registry addition with no
scale point. This tool measures the operator's THREE phases separately
at 1x (sf0.1), 10x (sf1) and 100x (sf10) organic corpus replicas
(tools/scale_llm.py's interleaved-token variation — replicas share no
word 3-grams, so vocabulary grows with the corpus the way an organic
crawl's does, rather than replaying identical text):

  P1 word_counts   — the distributed half: explode + groupBy (map-side
                     combined) + bounded top-k collect. The only phase
                     that scans the corpus for TRAINING; expected to
                     scale with corpus bytes.
  P2 learn_merges  — the driver merge loop over the max_words-bounded
                     vocabulary table. The 100 TB claim is that this is
                     CONSTANT in corpus size (the input is capped at
                     max_words rows no matter what); the two-decade
                     measurement is the proof.
  P3 bpe apply     — the Arrow-batched pandas UDF counting tokens over
                     the whole corpus (sum-aggregated so nothing
                     driver-side grows). Scales with corpus bytes; the
                     per-batch memoization's effectiveness is recorded
                     as the measured per-partition cache hit rate
                     (1 - distinct_words/total_words per batch,
                     aggregated exactly via one extra mapInPandas pass).

Parameters match the registered query (num_merges=60, max_words=10000).
Timings are best-of-N (default 2). Output: one JSON line per factor +
a combined artifact (default BENCH_bpe_r11.json).

Usage: python tools/scale_bpe.py [--factors 1,10,100] [--reps 2]
       [--out BENCH_bpe_r11.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

BASE = "/root/testdata/sf0.1"
SHIFT = 10_000_000
NUM_MERGES = 60
MAX_WORDS = 10_000


def build_docs(spark, out_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    from lcr_etl_upgrade_spark.sources.testdata import load_table

    rep = F.broadcast(
        spark.range(factor).select(F.col("id").alias("__rep"))
    )
    docs = load_table(spark, BASE, "documents").crossJoin(rep)
    # interleave a (replica, doc-bucket)-unique token between words:
    # the base corpus's vocabulary is tiny (31 words — synthetic), so a
    # plain replica token would leave P2's input trivially constant.
    # This variation grows the DISTINCT-word count ~997 per replica
    # (Heaps-law-ish: vocabulary grows with the corpus), which makes
    # the max_words cap load-bearing — exactly the property the driver
    # loop's constant-cost claim rests on.
    docs = docs.select(
        (F.col("doc_id") + F.col("__rep") * SHIFT).alias("doc_id"),
        F.when(F.col("__rep") == 0, F.col("text"))
        .otherwise(
            F.regexp_replace(
                F.col("text"),
                "\\s+",
                F.concat(
                    F.lit(" r"),
                    F.col("__rep").cast("string"),
                    F.lit("q"),
                    F.pmod(F.col("doc_id"), F.lit(997)).cast("string"),
                    F.lit(" "),
                ),
            )
        )
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    docs.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def cache_hit_rate(docs) -> dict:
    """Exact per-batch memoization effectiveness: for every Arrow batch
    the apply UDF sees, hits = words - distinct words (the cache is
    per-batch). Aggregated corpus-wide in one narrow pass."""
    import pandas as pd

    def stats(batches):
        for pdf in batches:
            total = 0
            seen: set = set()  # the cache's actual scope: one batch
            for t in pdf.iloc[:, 0]:
                if t is None:
                    continue
                ws = t.lower().split()
                total += len(ws)
                seen.update(ws)
            yield pd.DataFrame(
                {"total": [total], "distinct": [len(seen)]}
            )

    agg = (
        docs.select("text")
        .mapInPandas(stats, "total long, distinct long")
        .groupBy()
        .sum("total", "distinct")
        .first()
    )
    total, distinct = int(agg[0] or 0), int(agg[1] or 0)
    return {
        "words": total,
        "batch_distinct": distinct,
        "hit_rate": round(1 - distinct / total, 4) if total else None,
    }


def measure(spark, docs, reps: int) -> dict:
    from pyspark.sql import functions as F

    from lcr_etl_upgrade_spark.operators.bpe import (
        bpe_token_count,
        learn_merges,
        word_counts,
    )

    rec: dict = {}
    counts = None
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        counts = word_counts(docs, "text", max_words=MAX_WORDS)
        best = min(best, time.monotonic() - t0)
    rec["p1_word_counts_sec"] = round(best, 3)
    rec["vocab_rows"] = len(counts)

    merges = None
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        merges = learn_merges(counts, NUM_MERGES)
        best = min(best, time.monotonic() - t0)
    rec["p2_learn_merges_sec"] = round(best, 3)
    rec["n_merges"] = len(merges)

    best = float("inf")
    total = None
    for _ in range(reps):
        t0 = time.monotonic()
        total = (
            bpe_token_count(docs, "text", merges)
            .agg(F.sum("bpe_tokens"))
            .first()[0]
        )
        best = min(best, time.monotonic() - t0)
    rec["p3_apply_sec"] = round(best, 3)
    rec["bpe_tokens"] = int(total)
    rec["cache"] = cache_hit_rate(docs)
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,10,100")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="BENCH_bpe_r11.json")
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]

    from lcr_etl_upgrade_spark.session import get_session
    from lcr_etl_upgrade_spark.sources.testdata import load_table

    spark = get_session("scale_bpe")
    out: dict = {"num_merges": NUM_MERGES, "max_words": MAX_WORDS,
                 "reps": args.reps, "factors": {}}
    tmp = tempfile.mkdtemp(prefix="scale_bpe_")
    try:
        for factor in factors:
            if factor == 1:
                docs = load_table(spark, BASE, "documents")
            else:
                d = os.path.join(tmp, f"x{factor}")
                os.makedirs(d, exist_ok=True)
                build_docs(spark, d, factor)
                docs = spark.read.parquet(f"{d}/documents.parquet")
            rec = measure(spark, docs, args.reps)
            rec["n_docs"] = docs.count()
            out["factors"][str(factor)] = rec
            print(json.dumps({"factor": factor, **rec}))
            spark.catalog.clearCache()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"ok": True, "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
