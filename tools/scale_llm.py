"""LLM-path scale smoke: replicate documents/embeddings ~Nx into /tmp with
ORGANIC variation (not byte-identical replicas) and time the LLM headline
queries, recording the MinHash-LSH bucket-size distribution and the
max_bucket skew-guard trip rate.

Purpose (round-4 verdict ask #8): SCALE.md's 10x/30x evidence is
relational-heavy, and its 30x dedup point replicated documents verbatim —
a duplicate FLOOD, which exercises the guard but not the organic regime.
This tool scales the corpus while keeping the duplicate RATE constant:

- documents: each replica interleaves a replica-unique token between
  every pair of words ("a b c" -> "a r7 b r7 c" for replica 7), so every
  word 3-gram of a replica contains its replica token — replicas share
  ZERO shingles with each other (no cross-replica duplicates), while
  each replica preserves the fixture's internal near-dup structure
  exactly. Corpus grows Nx, duplicate rate stays the fixture's.
- embeddings: replicas beyond the first get a deterministic per-(row,
  rep, coordinate) perturbation in [-0.15, 0.15) (xxhash64-derived), so
  vectors stay near their originals (cluster structure survives) without
  being identical. Replica 0 is unchanged, so the registered queries'
  vec_id<3 query rows still exist.

Usage: python tools/scale_llm.py [factor]   (default 100)
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

BASE = "/root/testdata/sf0.1"
SHIFT = 10_000_000


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    from pyspark.sql import functions as F

    from lcr_etl_upgrade_spark.operators.dedup import (
        _lsh_buckets,
        minhash_signatures,
    )
    from lcr_etl_upgrade_spark.plans import QUERIES
    from lcr_etl_upgrade_spark.session import get_session
    from lcr_etl_upgrade_spark.sources.testdata import load_table

    out_dir = tempfile.mkdtemp(prefix="scale_llm_")
    spark = get_session("scale_llm")
    try:
        rep = F.broadcast(spark.range(factor).select(F.col("id").alias("__rep")))

        docs = load_table(spark, BASE, "documents").crossJoin(rep)
        docs = docs.select(
            (F.col("doc_id") + F.col("__rep") * SHIFT).alias("doc_id"),
            # interleave a replica-unique token between every pair of
            # words: replicas share no word 3-grams, intra-replica
            # near-dup structure is preserved verbatim
            F.when(F.col("__rep") == 0, F.col("text"))
            .otherwise(
                F.regexp_replace(
                    F.col("text"),
                    "\\s+",
                    F.concat(F.lit(" r"), F.col("__rep").cast("string"), F.lit(" ")),
                )
            )
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        docs.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

        emb = load_table(spark, BASE, "embeddings").crossJoin(rep)
        noise = F.transform(
            F.col("embedding"),
            lambda x, i: x
            + F.when(F.col("__rep") == 0, F.lit(0.0)).otherwise(
                (
                    F.pmod(
                        F.xxhash64(F.col("vec_id"), F.col("__rep"), i),
                        F.lit(10_000),
                    ).cast("double")
                    / F.lit(10_000.0)
                    - F.lit(0.5)
                )
                * F.lit(0.3)
            ),
        )
        emb = emb.select(
            (F.col("vec_id") + F.col("__rep") * SHIFT).alias("vec_id"),
            noise.alias("embedding"),
        )
        emb.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

        n_docs = spark.read.parquet(f"{out_dir}/documents.parquet").count()
        n_emb = spark.read.parquet(f"{out_dir}/embeddings.parquet").count()
        print(f"scaled corpus: documents={n_docs} embeddings={n_emb}")

        for name in (
            "doc_dedup_exact",
            "doc_minhash_near_dup",
            "embedding_cosine_topk_lsh",
        ):
            times = {}
            for label, sf_dir in (("1x", BASE), (f"{factor}x", out_dir)):
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    QUERIES[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - t0)
                    spark.catalog.clearCache()
                times[label] = best
            ratio = times[f"{factor}x"] / max(times["1x"], 1e-9)
            print(
                f"{name}: 1x={times['1x']:.2f}s {factor}x="
                f"{times[f'{factor}x']:.2f}s ratio={ratio:.1f} "
                f"(data {factor}x)"
            )

        # MinHash-LSH bucket-size distribution under the ORGANIC corpus:
        # the registered config (16 hashes, 4 bands), guard disabled so
        # the full tail is visible, then the default guard's trip rate.
        sigs = minhash_signatures(
            spark.read.parquet(f"{out_dir}/documents.parquet"), "text", "doc_id"
        )
        sizes = _lsh_buckets(
            sigs, "doc_id", bands=4, num_hashes=16, max_bucket=2**31
        ).select(F.size("docs").alias("n"))
        stats = sizes.agg(
            F.count("*").alias("buckets"),
            F.sum("n").alias("entries"),
            F.expr("percentile(n, 0.5)").alias("p50"),
            F.expr("percentile(n, 0.9)").alias("p90"),
            F.expr("percentile(n, 0.99)").alias("p99"),
            F.max("n").alias("max"),
            F.sum(F.when(F.col("n") > 10_000, 1).otherwise(0)).alias(
                "guard_trips_at_10k"
            ),
            F.sum(
                F.when(F.col("n") > 10_000, F.col("n") * (F.col("n") - 1) / 2)
                .otherwise(0)
            ).alias("pairs_suppressed_at_10k"),
        ).collect()[0]
        print(
            f"lsh bucket sizes (multi-doc buckets, organic {factor}x): "
            f"buckets={stats['buckets']} entries={stats['entries']} "
            f"p50={stats['p50']:.0f} p90={stats['p90']:.0f} "
            f"p99={stats['p99']:.0f} max={stats['max']} "
            f"guard_trips_at_10k={stats['guard_trips_at_10k']} "
            f"pairs_suppressed_at_10k={int(stats['pairs_suppressed_at_10k'] or 0)}"
        )

        # ANN recall at the SCALED corpus (round-5 verdict ask #3): the
        # registered recall-contract queries run unchanged against the
        # replica dir — exact brute-force baseline over the full Nx
        # corpus vs the registered LSH/IVF configs, same floors.
        for rq, floor in (
            ("embedding_lsh_recall", 0.8),
            ("embedding_ivf_recall", 0.7),
        ):
            rows = QUERIES[rq](spark, out_dir).collect()
            rec = [r.recall_at_k for r in rows]
            if not rec:
                # zero result rows at the scaled corpus is exactly the
                # regression this check exists to catch — report it as a
                # failure instead of crashing on min()/avg of empty
                print(
                    f"{rq} @ {factor}x organic: all_meet_floor=False "
                    f"queries=0 (EMPTY RESULT — recall contract not met)"
                )
                continue
            ok = all(r.meets_floor for r in rows)
            print(
                f"{rq} @ {factor}x organic: min={min(rec):.2f} "
                f"avg={sum(rec) / len(rec):.2f} floor={floor} "
                f"all_meet_floor={ok} queries={len(rec)}"
            )

        # ---- round-7: scale rows for the r6 operators + cluster
        # resolution (verdict asks #1/#2) ----
        from lcr_etl_upgrade_spark.operators.contamination import (
            contamination_hits,
            decontaminate,
        )
        from lcr_etl_upgrade_spark.operators.dedup import (
            connected_components,
            drop_near_dups,
            near_dup_pairs,
        )
        from lcr_etl_upgrade_spark.operators.text import (
            gopher_quality_flag,
            repetition_features,
        )

        def paired(name, build):
            """best-of-2 noop-write timing at 1x and Nx of a
            sf_dir -> DataFrame builder."""
            times = {}
            for label, sf_dir in (("1x", BASE), (f"{factor}x", out_dir)):
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    build(sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - t0)
                    spark.catalog.clearCache()
                times[label] = best
            ratio = times[f"{factor}x"] / max(times["1x"], 1e-9)
            print(
                f"{name}: 1x={times['1x']:.2f}s {factor}x="
                f"{times[f'{factor}x']:.2f}s ratio={ratio:.1f} "
                f"(data {factor}x)"
            )

        def docs_of(sf_dir):
            if sf_dir == BASE:
                return load_table(spark, sf_dir, "documents")
            return spark.read.parquet(f"{sf_dir}/documents.parquet")

        paired("gopher_quality_flag", lambda d: gopher_quality_flag(docs_of(d)))
        paired("repetition_features", lambda d: repetition_features(docs_of(d)))

        # a ~1k-doc synthetic benchmark drawn from replica 0, so real
        # 13-gram overlap exists at every scale (replica tokens keep
        # other replicas clean — the organic regime: contamination RATE
        # is constant while the corpus grows Nx). Materialized to
        # parquet, NOT persist(): paired()'s per-iteration clearCache
        # would silently unpersist it and the later iterations would
        # re-run the orderBy/limit lineage inside the timed window.
        (
            load_table(spark, BASE, "documents")
            .orderBy("doc_id")
            .limit(1000)
            .select("doc_id", "text")
            .write.mode("overwrite")
            .parquet(f"{out_dir}/bench.parquet")
        )
        bench = spark.read.parquet(f"{out_dir}/bench.parquet")
        n_hits = contamination_hits(
            docs_of(out_dir), bench, id_col="doc_id"
        ).count()
        print(f"contamination_hits @ {factor}x: {n_hits} contaminated docs")
        paired(
            "contamination_hits",
            lambda d: contamination_hits(docs_of(d), bench, id_col="doc_id"),
        )
        paired(
            "decontaminate",
            lambda d: decontaminate(docs_of(d), bench, id_col="doc_id"),
        )

        # cluster resolution: materialize the pair relation once per
        # scale (pair generation is already measured above under
        # doc_minhash_near_dup), then time components + survivor drop
        for label, sf_dir in (("1x", BASE), (f"{factor}x", out_dir)):
            nd_caches: list = []
            near_dup_pairs(
                docs_of(sf_dir), "text", "doc_id", caches=nd_caches
            ).select("doc_a", "doc_b").write.mode("overwrite").parquet(
                f"{out_dir}/pairs_{label}.parquet"
            )
            # release the corpus-scale shingle/bucket persists before the
            # next scale's pass so the measured runs aren't skewed by
            # avoidable memory pressure
            for cached in nd_caches:
                cached.unpersist()

        def pairs_of(sf_dir):
            label = "1x" if sf_dir == BASE else f"{factor}x"
            return spark.read.parquet(f"{out_dir}/pairs_{label}.parquet")

        stats = {}
        cc = connected_components(pairs_of(out_dir), _stats=stats)
        n_ids = cc.count()
        n_comp = cc.select("component").distinct().count()
        print(
            f"connected_components @ {factor}x: ids={n_ids} "
            f"components={n_comp} iterations={stats['iterations']}"
        )
        paired(
            "connected_components",
            lambda d: connected_components(pairs_of(d)),
        )
        paired(
            "drop_near_dups",
            lambda d: drop_near_dups(docs_of(d), pairs_of(d), "doc_id"),
        )
    finally:
        spark.stop()
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
