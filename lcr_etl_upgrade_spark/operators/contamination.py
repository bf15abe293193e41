"""Benchmark-contamination detection and decontamination.

The published decontamination method used by the large-LM training
pipelines (GPT-3 appendix C, PaLM, Gopher — all public): a training
document is *contaminated* when it shares at least one word n-gram
(n = 13 in the papers) with an evaluation benchmark, and contaminated
documents are dropped (or flagged) before training. [EXT] surface — the
reference ETL has no corpus curation at all.

Spark-first shape, sized for a 100 TB corpus against a ~MB benchmark:

- both sides shingle with :func:`~..dedup.shingle_hashes` — per-token
  ``xxhash64`` composed row-locally into 64-bit n-gram hashes, ALL
  map-side (no token shuffle, no string shingles on the wire);
- the benchmark's distinct n-gram hashes are a tiny relation (every
  public benchmark is ≪ autoBroadcastJoinThreshold after hashing to one
  long per n-gram) and are broadcast, so the corpus-side probe is a
  map-side hash join: the 100 TB side is scanned once and NEVER
  shuffled by the probe;
- only the HIT rows (rare by construction — contamination is the
  exception) reach the per-document aggregation, so the one shuffle is
  proportional to contamination, not corpus size;
- flag/drop joins the per-document hit table (small) back to the corpus
  broadcast, keeping the corpus scan-shaped end to end.

Matching is case-insensitive and whitespace-normalized (inherited from
``shingle_hashes``' tokenization), which is what the papers do; 64-bit
hash collisions (~k²/2⁶⁵ for k distinct benchmark n-grams) can only
*over*-flag, never under-flag, and are negligible at benchmark sizes.
Documents shorter than ``n`` tokens produce no n-grams and are never
flagged — same as the papers' rule.

``broadcast=True`` (the default) forces the hint because the benchmark
side is small *by contract*; pass ``broadcast=False`` to let Spark's
size-based planning decide (e.g. when decontaminating against another
large corpus slice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_hashes


def _bench_ngrams(
    benchmark: DataFrame, text_col: str, n: int, broadcast: bool
) -> DataFrame:
    """Distinct 64-bit n-gram hashes of the benchmark side (the build
    side of every probe below)."""
    sh = (
        shingle_hashes(
            benchmark.select(
                F.monotonically_increasing_id().alias("__bid"),
                F.col(text_col),
            ),
            text_col,
            "__bid",
            n=n,
        )
        .select("shingle")
        .distinct()
    )
    return F.broadcast(sh) if broadcast else sh


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "id",
    bench_text_col: str | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """Per-document contamination evidence: one row per corpus document
    that shares ≥ 1 word ``n``-gram with ``benchmark``, with

    - ``n_hit_ngrams`` — distinct overlapping n-grams,
    - ``n_doc_ngrams`` — the document's total n-gram occurrences
      (tokens − n + 1; the per-document denominator),
    - ``hit_frac``     — ``n_hit_ngrams / n_doc_ngrams``.

    Clean documents are ABSENT (this is the small "evidence" relation a
    flag/drop join consumes) — aggregating only hits keeps the shuffle
    proportional to contamination, not corpus size."""
    bench = _bench_ngrams(benchmark, bench_text_col or text_col, n, broadcast)
    doc_sh = shingle_hashes(corpus, text_col, id_col, n=n)
    hits = (
        doc_sh.join(bench, "shingle")
        .groupBy(id_col)
        .agg(F.count_distinct("shingle").alias("n_hit_ngrams"))
    )
    # the denominator is row-local arithmetic on the original corpus —
    # token count via regexp_count (codegen, no array) — attached by
    # broadcasting the SMALL hit table onto the corpus scan
    denom = corpus.select(
        F.col(id_col),
        F.greatest(
            F.regexp_count(F.col(text_col), F.lit(r"\S+")) - (n - 1),
            F.lit(0),
        ).cast("long").alias("n_doc_ngrams"),
    )
    hits_b = F.broadcast(hits) if broadcast else hits
    return denom.join(hits_b, id_col).select(
        id_col,
        "n_hit_ngrams",
        "n_doc_ngrams",
        (
            F.col("n_hit_ngrams").cast("double")
            / F.greatest(F.col("n_doc_ngrams"), F.lit(1))
        ).alias("hit_frac"),
    )


def flag_contaminated(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "id",
    bench_text_col: str | None = None,
    min_hits: int = 1,
    flag_col: str = "is_contaminated",
    broadcast: bool = True,
) -> DataFrame:
    """The corpus with a boolean ``flag_col``: True iff the document
    shares ≥ ``min_hits`` distinct ``n``-grams with the benchmark. The
    corpus side stays scan-shaped — the per-document hit table is
    broadcast onto it (left join, flag = hit-row present)."""
    if min_hits < 1:
        raise ValueError(f"min_hits must be >= 1, got {min_hits}")
    bench = _bench_ngrams(benchmark, bench_text_col or text_col, n, broadcast)
    hit_ids = (
        shingle_hashes(corpus, text_col, id_col, n=n)
        .join(bench, "shingle")
        .groupBy(id_col)
        .agg(F.count_distinct("shingle").alias("__n_hits"))
        .filter(F.col("__n_hits") >= min_hits)
        .select(id_col, F.lit(True).alias("__hit"))
    )
    hit_ids_b = F.broadcast(hit_ids) if broadcast else hit_ids
    return (
        corpus.join(hit_ids_b, id_col, "left")
        .withColumn(flag_col, F.coalesce(F.col("__hit"), F.lit(False)))
        .drop("__hit")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "id",
    bench_text_col: str | None = None,
    min_hits: int = 1,
    broadcast: bool = True,
) -> DataFrame:
    """Drop contaminated documents (the papers' decontamination step):
    ``corpus`` minus every document flagged by :func:`flag_contaminated`.
    Two corpus scans — one to build the (small) hit-id relation, one to
    emit the surviving rows against its broadcast — and zero corpus
    shuffles; that two-pass shape is the method itself, not an
    implementation accident."""
    flagged = flag_contaminated(
        corpus,
        benchmark,
        n=n,
        text_col=text_col,
        id_col=id_col,
        bench_text_col=bench_text_col,
        min_hits=min_hits,
        broadcast=broadcast,
    )
    return flagged.filter(~F.col("is_contaminated")).drop("is_contaminated")
