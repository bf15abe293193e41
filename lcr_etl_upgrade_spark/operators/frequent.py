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

Two threshold spellings:

- ABSOLUTE (``threshold=...``): items with count > threshold. The
  superset guarantee needs ``k >= n/threshold``, so at a FIXED absolute
  threshold the required sketch size grows LINEARLY with the data —
  fine for one dataset, wrong as a standing job (the pre-round-11
  registration valve-refused past ~27M tokens, SCALE.md).
- RELATIVE (``phi=...``): items with count > phi * n — the production
  spelling. ``k = ceil(1/phi) * safety`` gives ``D <= n/(k+1) <
  phi*n/safety <= threshold``, so the superset guarantee holds BY
  CONSTRUCTION at ANY corpus size with CONSTANT sketch memory; the
  valve is unreachable for fixed phi. ``n`` is counted in the SAME
  sketch pass (each partition's sentinel row carries its non-null row
  count), so relative mode costs no extra scan.

The per-partition sketch is Arrow-batched (``mapInPandas``): each batch
is reduced with vectorized ``value_counts`` first, then MG-merged into
the running k-counter dict (prune: subtract the (k+1)-th largest count,
drop non-positives — one numpy partition-select per batch, never
per-row Python).
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUMMARY_SCHEMA = "item string, cnt bigint, dec bigint, n bigint"

# Above this many unfiltered merged-summary rows (partitions x (k+1)),
# candidate discovery keeps the two-job filtered spelling instead of the
# fused single-job collect: ~100k rows x ~40 B is still a trivial driver
# result, well under spark.driver.maxResultSize, while partition counts
# at cluster scale can push partitions x k into the tens of millions.
_FUSED_COLLECT_MAX = 100_000


def _mg_partition(k: int):
    """Build the mapInPandas function: one Misra-Gries sketch per
    partition, emitted as (item, cnt, 0, 0) rows plus one
    (NULL, 0, D_p, n_p) sentinel carrying the partition's error budget
    and its non-null input count (so relative-threshold mode learns n
    in the same pass)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        counters: dict = {}
        dec_total = 0
        n_total = 0
        for pdf in batches:
            col = pdf.iloc[:, 0]
            vc = col.value_counts(dropna=True)
            n_total += int(vc.sum())
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
                "n": [0] * len(counters) + [n_total],
            }
        )
        yield out.astype({"cnt": "int64", "dec": "int64", "n": "int64"})

    return run


def mg_summaries(items: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``items[col]`` (narrow —
    no shuffle): at most k counter rows per partition plus one sentinel
    carrying (error budget D_p, non-null count n_p). NULL item values
    are not counted (they are the sentinel encoding, and a NULL "item"
    has no frequency semantics)."""
    return items.select(F.col(col).cast("string").alias("item")).mapInPandas(
        _mg_partition(k), _SUMMARY_SCHEMA
    )


def frequent_item_candidates(
    items: DataFrame,
    col: str,
    k: int,
    threshold: int | None = None,
    phi: float | None = None,
) -> tuple[DataFrame, int, int, int]:
    """Merge the partition summaries and return
    ``(candidates, D, n, threshold)``: every item whose true count CAN
    exceed the threshold (lo + D > threshold), the realized total error
    budget D, the total non-null count n, and the resolved threshold
    (``floor(phi * n)`` in relative mode). When D <= threshold, the
    candidate set is a guaranteed superset of the true heavy hitters:
    any item with f > threshold >= D is present in the merged summary
    (absent implies f <= D) and passes the lo + D filter (lo >= f - D >
    threshold - D). ``heavy_hitters`` enforces that precondition.

    The candidate set is BOUNDED BY CONSTRUCTION — in relative mode by
    a constant (sum(lo) <= n, so at most n/(threshold - D) <
    safety/(phi*(safety-1)) items survive the filter) and in absolute
    mode by partitions x k — so it is collected EAGERLY (bounded driver
    rows, not a data-path collect) and rebuilt as a small local
    DataFrame ready for ``F.broadcast``.

    Driver-job shape (r14, guide §2.6 job-latency floor): the candidate
    filter needs the TOTAL error budget D, which the totals pass
    produces — the two aggregations are NOT independent, so they cannot
    simply be overlapped on driver threads (and two concurrent jobs
    over a not-yet-materialized persisted relation would each compute
    the sketch pass: a cache stampede). Instead, when the UNFILTERED
    merged summary is itself driver-small (<= _FUSED_COLLECT_MAX rows,
    known a priori: partitions x (k+1)), both aggregations fuse into
    ONE job — groupBy(item) over the summaries, where the NULL-sentinel
    group's sum(dec)/sum(n) ARE the totals — and the threshold filter
    runs on the driver. One job, no persist, no cache to release.
    Past that bound (huge partition counts x k), the two-job spelling
    remains: totals first, then the D-filtered candidate aggregation
    over the persisted summaries, released deterministically in a
    ``finally`` (r12 ADVICE fix: lazy candidates pinned cached summary
    blocks for the frame's lifetime)."""
    if (threshold is None) == (phi is None):
        raise ValueError("pass exactly one of threshold or phi")
    if phi is not None and not (0.0 < phi < 1.0):
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    summaries = mg_summaries(items, col, k)
    n_parts = items.rdd.getNumPartitions()
    if n_parts * (k + 1) <= _FUSED_COLLECT_MAX:
        rows = (
            summaries.groupBy("item")
            .agg(
                F.sum("cnt").alias("lo"),
                F.sum("dec").alias("d"),
                F.sum("n").alias("n"),
            )
            .collect()
        )
        d_total = n_total = 0
        for r in rows:
            if r["item"] is None:
                d_total = int(r["d"] or 0)
                n_total = int(r["n"] or 0)
                break
        threshold = (
            int(math.floor(phi * n_total)) if phi is not None else threshold
        )
        cand_rows = [
            (r["item"], r["lo"])
            for r in rows
            if r["item"] is not None and r["lo"] + d_total > threshold
        ]
    else:
        summaries = summaries.persist()
        try:
            # one full materialization of the sketch pass; the candidate
            # aggregation below reuses the persisted summary rows
            tot = summaries.agg(
                F.sum("dec").alias("d"), F.sum("n").alias("n")
            ).first()
            d_total = int(tot["d"] or 0)
            n_total = int(tot["n"] or 0)
            threshold = (
                int(math.floor(phi * n_total))
                if phi is not None
                else threshold
            )
            cand_rows = [
                (r["item"], r["lo"])
                for r in (
                    summaries.filter(F.col("item").isNotNull())
                    .groupBy("item")
                    .agg(F.sum("cnt").alias("lo"))
                    .filter(
                        F.col("lo") + F.lit(int(d_total)) > int(threshold)
                    )
                    .collect()
                )
            ]
        finally:
            summaries.unpersist(blocking=False)
    cands = items.sparkSession.createDataFrame(
        cand_rows, schema="item string, lo bigint"
    )
    return cands, d_total, n_total, int(threshold)


def heavy_hitters(
    items: DataFrame,
    col: str,
    threshold: int | None = None,
    k: int | None = None,
    phi: float | None = None,
    safety: int = 2,
) -> DataFrame:
    """EXACT items with count(col) > threshold, computed as sketch ->
    candidate superset -> broadcast-semi-join recount.

    - Absolute mode (``threshold=``, ``k=`` required): raises instead
      of silently under-reporting when the sketch was too small for the
      data (pick k >= n/threshold to be safe a priori).
    - Relative mode (``phi=``): threshold is ``floor(phi * n)`` with n
      counted in the sketch pass itself; ``k`` defaults to
      ``ceil(1/phi) * safety``, which makes D < threshold/safety —
      the valve cannot fire, and sketch memory is CONSTANT in the data
      size (the 100 TB spelling; a fixed absolute threshold needs k to
      grow linearly with n instead).
    """
    if phi is not None:
        if not (0.0 < phi < 1.0):
            raise ValueError(f"phi must be in (0, 1), got {phi}")
        if threshold is not None:
            raise ValueError("pass either threshold or phi, not both")
        if k is None:
            k = int(math.ceil(1.0 / phi)) * max(int(safety), 1)
    elif threshold is None or k is None:
        raise ValueError(
            "absolute mode needs both threshold and k (or pass phi=)"
        )
    cands, d_total, n_total, threshold = frequent_item_candidates(
        items, col, k, threshold=threshold, phi=phi
    )
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
    # NO fan_out on the recount (measured r13): repartitioning the
    # post-explode token relation pays a local sort (sortBeforeRepartition)
    # plus a shuffle of every token string — same-session A/B over 3
    # rounds measured 1.48-1.66 s (1-split) vs 2.04-2.42 s (fanned). The
    # single-core explode+semi+partial-agg codegen pass is cheaper than
    # parallelizing it; at cluster scale inputs arrive multi-split anyway.
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
