"""Frequent items (heavy hitters) via mergeable Misra-Gries summaries [EXT].

The scale problem: exact heavy hitters is ``groupBy(item).count()`` —
already map-side combined, but the shuffle still carries EVERY distinct
key. At 100 TB with an open vocabulary (web tokens, URLs, user ids)
that is billions of keys crossing the wire to find the few thousand
that matter. The Misra-Gries sketch bounds each partition's summary to
k counters with a per-partition error budget, and MG summaries are
MERGEABLE (Agarwal et al., "Mergeable Summaries", PODS'12): summing
per-item counters and adding the error budgets yields a valid sketch of
the union. So the shuffle carries at most ``partitions x k`` rows, not
the vocabulary.

Guarantees carried through the merge (true frequency f, reported count
``lo``, total error ``D`` = sum of per-partition decrement budgets):

- ``lo <= f <= lo + D`` for every reported item;
- any item with ``f > D`` is reported (absent implies ``f <= D``);
- per partition, ``D_p <= n_p / (k+1)``, so ``D <= n / (k+1)``.

``heavy_hitters`` composes the production two-pass pattern: the sketch
pass yields a GUARANTEED candidate superset (valve-checked: if the
realized ``D`` exceeds the threshold the superset guarantee would be
void, so it raises with the k to use instead of answering wrong), then
an exact recount of candidates only — a broadcast semi-join, so the big
side never shuffles. The final answer is EXACT, which is why the
``doc_heavy_hitter_tokens`` query hash-matches a plain HAVING oracle.

The per-partition sketch is Arrow-batched (``mapInPandas``): each batch
is reduced with vectorized ``value_counts`` first, then MG-merged into
the running k-counter dict (prune: subtract the (k+1)-th largest count,
drop non-positives — one numpy partition-select per batch, never
per-row Python).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SUMMARY_SCHEMA = "item string, cnt bigint, dec bigint"


def _mg_partition(k: int):
    """Build the mapInPandas function: one Misra-Gries sketch per
    partition, emitted as (item, cnt, 0) rows plus one (NULL, 0, D_p)
    sentinel carrying the partition's error budget."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        counters: dict = {}
        dec_total = 0
        for pdf in batches:
            col = pdf.iloc[:, 0]
            vc = col.value_counts(dropna=True)
            for item, c in vc.items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                vals = np.fromiter(counters.values(), dtype=np.int64)
                # (k+1)-th largest = the largest pruned value; subtract
                # it everywhere (the mergeable-summaries prune)
                m = int(np.partition(vals, len(vals) - (k + 1))[
                    len(vals) - (k + 1)
                ])
                if m > 0:
                    dec_total += m
                    counters = {
                        i: c - m for i, c in counters.items() if c - m > 0
                    }
        out = pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "cnt": list(counters.values()) + [0],
                "dec": [0] * len(counters) + [dec_total],
            }
        )
        yield out.astype({"cnt": "int64", "dec": "int64"})

    return run


def mg_summaries(items: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``items[col]`` (narrow —
    no shuffle): at most k counter rows per partition plus one error
    sentinel. NULL item values are not counted (they are the sentinel
    encoding, and a NULL "item" has no frequency semantics)."""
    return items.select(F.col(col).cast("string").alias("item")).mapInPandas(
        _mg_partition(k), _SUMMARY_SCHEMA
    )


def frequent_item_candidates(
    items: DataFrame, col: str, k: int, threshold: int
) -> tuple[DataFrame, int]:
    """Merge the partition summaries and return (candidates, D): every
    item whose true count CAN exceed ``threshold`` (lo + D > threshold),
    plus the realized total error budget D. When D <= threshold, the
    candidate set is a guaranteed superset of the true heavy hitters:
    any item with f > threshold >= D is present in the merged summary
    (absent implies f <= D) and passes the lo + D filter (lo >= f - D >
    threshold - D). ``heavy_hitters`` enforces that precondition."""
    summaries = mg_summaries(items, col, k).cache()
    try:
        d_total = (
            summaries.agg(F.sum("dec").alias("d")).first()["d"] or 0
        )
        # Materialize the candidates and release the cache: the rows are
        # bounded by the sketch itself (<= partitions x k even at
        # threshold 0), and repeated calls (benches, fuzz batteries)
        # must not accumulate cached summary RDDs for the session's
        # lifetime.
        rows = (
            summaries.filter(F.col("item").isNotNull())
            .groupBy("item")
            .agg(F.sum("cnt").alias("lo"))
            .filter(F.col("lo") + F.lit(int(d_total)) > threshold)
            .collect()
        )
    finally:
        summaries.unpersist()
    cands = items.sparkSession.createDataFrame(
        [(r["item"], r["lo"]) for r in rows], "item string, lo bigint"
    )
    return cands, int(d_total)


def heavy_hitters(
    items: DataFrame, col: str, threshold: int, k: int
) -> DataFrame:
    """EXACT items with count(col) > threshold, computed as sketch ->
    candidate superset -> broadcast-semi-join recount. Raises instead
    of silently under-reporting when the sketch was too small for the
    data (pick k >= n/threshold to be safe a priori)."""
    cands, d_total = frequent_item_candidates(items, col, k, threshold)
    if d_total > threshold:
        raise ValueError(
            f"Misra-Gries error budget D={d_total} exceeds "
            f"threshold={threshold}: the candidate superset guarantee "
            f"is void. Use k >= n/threshold (got k={k})."
        )
    # reserved-name alias (the caller's column may itself be "item"),
    # cast back to the caller's key type: the sketch tracked the STRING
    # rendering, and a string-vs-native comparison would make Catalyst
    # pick a common type instead of probing on the native key
    cand_keys = cands.select(
        F.col("item").cast(items.schema[col].dataType).alias("__mg_item")
    )
    return (
        items.join(
            F.broadcast(cand_keys),
            items[col] == F.col("__mg_item"),
            "left_semi",
        )
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > threshold)
    )
