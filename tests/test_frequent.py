"""Misra-Gries frequent items (operators/frequent.py): the mergeable-
summaries guarantees, checked against exact counts on randomized
skewed data, plus the two-pass heavy_hitters exactness and its valve.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.operators.frequent import (
    frequent_item_candidates,
    heavy_hitters,
    mg_summaries,
)


def _zipf_items(spark, seed: int, n: int = 30_000, vocab: int = 2_000,
                parts: int = 7):
    rng = np.random.default_rng(seed)
    vals = rng.zipf(1.3, size=n) % vocab
    pdf = pd.DataFrame({"item": [f"w{v}" for v in vals]})
    return spark.createDataFrame(pdf).repartition(parts)


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_mg_bounds_and_superset(spark, seed):
    items = _zipf_items(spark, seed)
    exact = {
        r["item"]: r["c"]
        for r in items.groupBy("item").agg(F.count("*").alias("c")).collect()
    }
    n = sum(exact.values())
    k = 64
    cands, d_total, n_total, _ = frequent_item_candidates(
        items, "item", k, threshold=0
    )
    assert n_total == n  # sentinel-carried count equals the exact total
    got = {r["item"]: r["lo"] for r in cands.collect()}
    # error budget bound: D <= n/(k+1) summed over partitions
    assert d_total <= n // (k + 1) + 7  # one rounding per partition
    # lo <= f <= lo + D for every reported item
    for item, lo in got.items():
        f = exact.get(item, 0)
        assert lo <= f <= lo + d_total, (item, lo, f, d_total)
    # superset: every item with f > D is reported
    for item, f in exact.items():
        if f > d_total:
            assert item in got, (item, f, d_total)


def test_summary_size_is_bounded(spark):
    items = _zipf_items(spark, 3, parts=5)
    k = 32
    rows = mg_summaries(items, "item", k).count()
    # at most k counters + 1 sentinel per partition
    assert rows <= 5 * (k + 1)


@pytest.mark.parametrize("threshold", [50, 300])
def test_heavy_hitters_exact_vs_groupby(spark, threshold):
    items = _zipf_items(spark, 11)
    expected = sorted(
        (r["item"], r["c"])
        for r in items.groupBy("item")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > threshold)
        .collect()
    )
    got = sorted(
        (r["item"], r["cnt"])
        for r in heavy_hitters(items, "item", threshold, k=256).collect()
    )
    assert got == expected
    assert len(got) > 0  # zipf guarantees some heavy tokens


def test_valve_raises_when_sketch_too_small(spark):
    # k=2 over a diffuse vocabulary: D blows past a tiny threshold and
    # the operator must refuse rather than under-report.
    items = _zipf_items(spark, 5, n=20_000, vocab=5_000)
    with pytest.raises(ValueError, match="error budget"):
        heavy_hitters(items, "item", threshold=3, k=2)


def test_nulls_are_not_items(spark):
    pdf = pd.DataFrame({"item": ["a", "a", None, "b", None, "a"]})
    items = spark.createDataFrame(pdf)
    got = heavy_hitters(items, "item", threshold=1, k=8).collect()
    assert {(r["item"], r["cnt"]) for r in got} == {("a", 3)}


# ---- relative-threshold (phi) mode — round-11 rework ----------------------


@pytest.mark.parametrize("phi", [0.01, 0.003])
def test_phi_mode_exact_vs_groupby(spark, phi):
    items = _zipf_items(spark, 23)
    n = items.count()
    threshold = int(np.floor(phi * n))
    expected = sorted(
        (r["item"], r["c"])
        for r in items.groupBy("item")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > threshold)
        .collect()
    )
    got = sorted(
        (r["item"], r["cnt"])
        for r in heavy_hitters(items, "item", phi=phi).collect()
    )
    assert got == expected
    assert len(got) > 0


def test_phi_mode_valve_unreachable_by_construction(spark):
    # the exact corpus shape that forced the absolute-mode valve to
    # fire (diffuse vocab, tiny k) cannot refuse in phi mode: k is
    # derived as ceil(1/phi)*safety, so D < threshold/safety always
    items = _zipf_items(spark, 5, n=20_000, vocab=5_000)
    n = items.count()
    phi = 0.002
    got = {
        r["item"]: r["cnt"]
        for r in heavy_hitters(items, "item", phi=phi).collect()
    }
    exact = {
        r["item"]: r["c"]
        for r in items.groupBy("item").agg(F.count("*").alias("c")).collect()
    }
    threshold = int(np.floor(phi * n))
    assert got == {i: c for i, c in exact.items() if c > threshold}


def test_phi_mode_nulls_excluded_from_n(spark):
    # nulls are neither items nor part of n: 6 non-null rows, phi=0.4
    # -> threshold floor(2.4)=2 -> only "a" (3 > 2)
    pdf = pd.DataFrame(
        {"item": ["a", "a", "a", "b", "b", "c", None, None, None, None]}
    )
    items = spark.createDataFrame(pdf)
    got = heavy_hitters(items, "item", phi=0.4).collect()
    assert {(r["item"], r["cnt"]) for r in got} == {("a", 3)}


def test_mode_argument_validation(spark):
    items = spark.createDataFrame(pd.DataFrame({"item": ["a"]}))
    with pytest.raises(ValueError, match="not both"):
        heavy_hitters(items, "item", threshold=1, k=8, phi=0.1)
    with pytest.raises(ValueError, match="absolute mode"):
        heavy_hitters(items, "item", threshold=1)  # k missing
    with pytest.raises(ValueError, match="phi must be in"):
        heavy_hitters(items, "item", phi=1.5)
    with pytest.raises(ValueError, match="exactly one"):
        frequent_item_candidates(items, "item", 8)


def test_phi_candidates_constant_bound(spark):
    # post-filter candidate count is bounded by safety/(phi*(safety-1)),
    # a CONSTANT independent of n — the property that removed the
    # round-10 driver-collect concern
    items = _zipf_items(spark, 31, n=40_000, vocab=4_000)
    phi, safety = 0.005, 2
    k = int(np.ceil(1 / phi)) * safety
    cands, d, n, thr = frequent_item_candidates(items, "item", k, phi=phi)
    assert d < thr / safety + 8  # D < phi*n/safety (+ partition rounding)
    assert cands.count() <= safety / (phi * (safety - 1))


def test_fused_and_two_job_candidate_paths_agree(spark, monkeypatch):
    """The single-job fused collect (totals read off the NULL-sentinel
    group, threshold filter on the driver) and the two-job filtered
    spelling must produce identical candidates, totals, and final
    heavy-hitter rows, in both threshold modes."""
    import lcr_etl_upgrade_spark.operators.frequent as FR

    items = _zipf_items(spark, 7, n=30_000, vocab=2_000)
    results = {}
    for tag, bound in (("two_job", 0), ("fused", 1 << 30)):
        monkeypatch.setattr(FR, "_FUSED_COLLECT_MAX", bound)
        cands, d, n, thr = frequent_item_candidates(
            items, "item", 400, phi=0.005
        )
        hh = heavy_hitters(items, "item", phi=0.005)
        results[tag] = (
            sorted(map(tuple, cands.collect())),
            d,
            n,
            thr,
            sorted(map(tuple, hh.collect())),
        )
        abs_hh = heavy_hitters(items, "item", threshold=300, k=512)
        results[tag + "_abs"] = sorted(map(tuple, abs_hh.collect()))
    assert results["two_job"] == results["fused"]
    assert results["two_job_abs"] == results["fused_abs"]
    assert len(results["fused"][4]) > 0  # non-vacuous
