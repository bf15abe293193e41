#!/usr/bin/env python
"""Randomized differential for the curation primitives (round 9):
chunking, sequence packing, deterministic sampling — the training-data
operators whose evidence was previously fixed goldens only.

Families ((seed, index)-reproducible; index % 3 selects):

- chunk: random documents (tabs/newlines/multi-space runs, leading and
  trailing whitespace, empty and whitespace-only docs, NBSP — which is
  a TOKEN character to the engine: Spark's Java-regex ``\\s`` is ASCII
  where Python's is unicode, so the oracle restates tokenization with
  an explicit ASCII class) x random (chunk_tokens, overlap) vs an
  independent Python restatement of the documented contract (starts at
  multiples of step up to n-overlap-1, slice, space-join, n_tokens ==
  the slice length).
- pack: random per-group row sets with token counts 0..2*budget (rows
  LONGER than the budget span bins by contract) vs an independent
  Python fold (cumulative offset, floor-div bin) over the same
  deterministic order.
- sample: deterministic-hash sampling properties that need no
  reimplementation of xxhash64: rate monotonicity (rate1 <= rate2 ->
  kept(rate1) is a subset of kept(rate2)), and stratified-equals-
  global-per-stratum (the stratified path must agree row-for-row with
  the global-rate path restricted to each stratum — two INDEPENDENT
  code paths over the same hash contract).

Usage:
    python tools/curation_fuzz.py [--seed N] [--n N] [--case I]

Prints one JSON summary line; exit 1 on any mismatch.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Spark's split()/regexp_replace() run Java regex, whose \s is ASCII
# [ \t\n\x0B\f\r]; Python's \s is unicode. The oracle must restate the
# ENGINE's (Java) semantics explicitly.
_ASCII_WS = "[ \\t\\n\\x0b\\f\\r]"

WORDS = ["alpha", "beta", "gamma", "delta", "x", "yz", "café",
         "a b",  # <- NBSP: ONE token under Java \s (ASCII)
         "12.5", "end."]
WS = [" ", "  ", "\t", "\n", " \t ", "\n\n"]


def gen_chunk_case(rng):
    docs = []
    for i in range(int(rng.integers(1, 30))):
        r = rng.random()
        if r < 0.08:
            text = ""
        elif r < 0.16:
            text = str(rng.choice(WS)) * int(rng.integers(1, 3))
        else:
            n = int(rng.integers(1, 40))
            parts = []
            if rng.random() < 0.3:
                parts.append(str(rng.choice(WS)))  # leading ws
            for j in range(n):
                parts.append(str(rng.choice(WORDS)))
                if j < n - 1:
                    parts.append(str(rng.choice(WS)))
            if rng.random() < 0.3:
                parts.append(str(rng.choice(WS)))  # trailing ws
            text = "".join(parts)
        docs.append((i, text))
    chunk_tokens = int(rng.integers(1, 13))
    overlap = int(rng.integers(0, chunk_tokens))
    return pd.DataFrame(docs, columns=["doc_id", "text"]), chunk_tokens, \
        overlap


def _py_chunks(text, chunk_tokens, overlap):
    stripped = re.sub(f"^{_ASCII_WS}+|{_ASCII_WS}+$", "", text or "")
    if not stripped:
        return []
    toks = re.split(f"{_ASCII_WS}+", stripped)
    n = len(toks)
    step = chunk_tokens - overlap
    bound = max(n - overlap - 1, 0)
    out = []
    for cid, start in enumerate(range(0, bound + 1, step)):
        sl = toks[start:start + chunk_tokens]
        if sl:
            out.append((cid, " ".join(sl), len(sl)))
    return out


def run_chunk_case(spark, pdf, chunk_tokens, overlap) -> dict | None:
    from lcr_etl_upgrade_spark.operators.curation import chunk_documents

    sdf = spark.createDataFrame(pdf, "doc_id long, text string")
    try:
        got = sorted(
            (r.doc_id, r.chunk_id, r.chunk_text, r.n_tokens)
            for r in chunk_documents(
                sdf, chunk_tokens=chunk_tokens, overlap_tokens=overlap
            ).collect()
        )
    except Exception as exc:
        return {"side": "spark_error", "err": repr(exc)[:400]}
    want = sorted(
        (int(row.doc_id), cid, text, n)
        for row in pdf.itertuples()
        for cid, text, n in _py_chunks(row.text, chunk_tokens, overlap)
    )
    if got != want:
        i = next((j for j, (a, b) in enumerate(zip(got, want)) if a != b),
                 min(len(got), len(want)))
        return {
            "side": "values", "spark_rows": len(got), "py_rows": len(want),
            "first_diff": {
                "spark": got[i] if i < len(got) else None,
                "python": want[i] if i < len(want) else None,
            },
        }
    return None


def gen_pack_case(rng):
    budget = int(rng.integers(4, 40))
    rows = []
    rid = 0
    for g in range(int(rng.integers(1, 5))):
        for _ in range(int(rng.integers(1, 25))):
            rows.append((rid, f"g{g}", int(rng.integers(0, 2 * budget))))
            rid += 1
    grouped = bool(rng.integers(0, 2))
    # r12: draw the single-partition valve boundary — None keeps the
    # default (never fires at fuzz sizes); otherwise a bound around the
    # row count, so ungrouped cases land on both sides of the refusal
    bound = (
        None
        if rng.random() < 0.5
        else int(rng.integers(1, len(rows) + 5))
    )
    return pd.DataFrame(rows, columns=["rid", "grp", "n_tok"]), budget, \
        grouped, bound


def run_pack_case(spark, pdf, budget, grouped, bound=None) -> dict | None:
    from lcr_etl_upgrade_spark.operators.curation import pack_sequences

    sdf = spark.createDataFrame(pdf, "rid long, grp string, n_tok long")
    expect_refuse = (
        not grouped and bound is not None and len(pdf) > bound
    )
    try:
        kwargs = {} if bound is None else {"max_ungrouped_rows": bound}
        out = pack_sequences(
            sdf, "n_tok", ["rid"], budget,
            group_col="grp" if grouped else None,
            **kwargs,
        )
        got = {r.rid: (r.bin_id, r.bin_offset) for r in out.collect()}
    except Exception as exc:
        # PySpark exception reprs are bare class names; the message
        # (incl. the valve's raise_error text) lives in str(exc)
        msg = f"{exc!r} {exc}"
        if expect_refuse and "single-partition window" in msg:
            return None  # the valve fired exactly when predicted
        return {"side": "spark_error", "err": msg[:400],
                "expect_refuse": expect_refuse}
    if expect_refuse:
        return {"side": "valve_missed",
                "rows": len(pdf), "bound": bound}
    want = {}
    frames = pdf.groupby("grp") if grouped else [(None, pdf)]
    for _, sub in frames:
        cum = 0
        for row in sub.sort_values("rid").itertuples():
            want[int(row.rid)] = (cum // budget, cum)
            cum += int(row.n_tok)
    if got != want:
        bad = next(k for k in want if got.get(k) != want[k])
        return {"side": "values",
                "first_diff": {"rid": bad, "spark": got.get(bad),
                               "python": want[bad]}}
    return None


def gen_sample_case(rng):
    n = int(rng.integers(20, 400))
    strata = ["en", "de", "fr"]
    pdf = pd.DataFrame({
        "k": [int(x) for x in rng.integers(0, 10_000, n)],
        "s": [str(rng.choice(strata)) for _ in range(n)],
    }).drop_duplicates("k")
    r1 = float(rng.integers(0, 101)) / 100.0
    r2 = min(1.0, r1 + float(rng.integers(0, 50)) / 100.0)
    seed = int(rng.integers(0, 1000))
    rates = {s: float(rng.integers(0, 101)) / 100.0
             for s in strata[: int(rng.integers(1, 4))]}
    return pdf, r1, r2, seed, rates


def run_sample_case(spark, pdf, r1, r2, seed, rates) -> dict | None:
    from lcr_etl_upgrade_spark.operators.curation import (
        sample_deterministic,
    )

    sdf = spark.createDataFrame(pdf, "k long, s string").cache()
    try:
        kept1 = {r.k for r in sample_deterministic(
            sdf, "k", rate=r1, seed=seed).collect()}
        kept2 = {r.k for r in sample_deterministic(
            sdf, "k", rate=r2, seed=seed).collect()}
        strat = {(r.k, r.s) for r in sample_deterministic(
            sdf, "k", seed=seed, stratum_col="s", stratum_rates=rates,
        ).collect()}
        per_stratum = set()
        for s, r in rates.items():
            sub = sdf.filter(sdf.s == s)
            per_stratum |= {(row.k, s) for row in sample_deterministic(
                sub, "k", rate=r, seed=seed).collect()}
    except Exception as exc:
        return {"side": "spark_error", "err": repr(exc)[:400]}
    finally:
        sdf.unpersist()
    if not kept1 <= kept2:
        return {"side": "monotonicity",
                "lost": sorted(kept1 - kept2)[:5], "r1": r1, "r2": r2}
    if strat != per_stratum:
        return {"side": "stratified_vs_global",
                "only_strat": sorted(strat - per_stratum)[:5],
                "only_global": sorted(per_stratum - strat)[:5]}
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=20260815)
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--case", type=int, default=None)
    args = ap.parse_args()

    from lcr_etl_upgrade_spark.session import get_session

    spark = get_session("curation_fuzz")
    failures = []
    for i in range(args.n):
        if args.case is not None and i != args.case:
            continue
        rng = np.random.default_rng(args.seed * 1_000_003 + i)
        fam = ("chunk", "pack", "sample")[i % 3]
        if fam == "chunk":
            pdf, ct, ov = gen_chunk_case(rng)
            rec = run_chunk_case(spark, pdf, ct, ov)
        elif fam == "pack":
            pdf, budget, grouped, bound = gen_pack_case(rng)
            rec = run_pack_case(spark, pdf, budget, grouped, bound)
        else:
            pdf, r1, r2, seed, rates = gen_sample_case(rng)
            rec = run_sample_case(spark, pdf, r1, r2, seed, rates)
        if rec is not None:
            failures.append({"i": i, "family": fam, **rec})
            print(f"FAIL case {i} [{fam}]: "
                  f"{json.dumps(failures[-1], default=str)[:700]}",
                  file=sys.stderr)
    print(json.dumps({
        "seed": args.seed, "n": args.n,
        "failures": failures, "ok": not failures,
    }, default=str))
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
