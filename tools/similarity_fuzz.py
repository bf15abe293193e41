#!/usr/bin/env python
"""Randomized differential for the APPROXIMATE similarity/dedup surfaces
(round 10) — the last operator family whose evidence was goldens +
fixed-corpus sweeps only (the 6 `no_oracle` rows in CORRECTNESS_r09).

Families ((seed, index)-reproducible; index % 5 selects):

- lsh_topk: random embedding corpora (clustered Gaussians, duplicate
  floods, near-tie neighbors, orthogonal one-hots, zero/NaN/inf/
  wrong-dimension/NULL vectors) x random (bits, tables, probes, k) vs a
  FULL independent Python restatement of cosine_topk_lsh: plane
  generation per the documented (table, bit)-seeded MT contract, sign
  bucketing, multi-probe lowest-|proj| bit flips (stable ties), the
  bucket join, sequential-fold cosine (bit-exact vs zip_with/aggregate),
  and row_number ranking (cosine desc, id asc). Result rows must match
  EXACTLY — float-for-float. Each case ALSO drives
  cosine_near_dup_pairs(bits>0) — the LSH-bucketed near-dup surface —
  on the same corpus against an exact single-table restatement
  (precomputed-norm float path, NaN-pair drop). Every 4th lsh_topk case additionally runs
  the REGISTERED config (bits=4, tables=8, probes=4) and asserts
  tie-aware recall@k >= 0.8 vs brute force (the plans/llm.py contract
  floor; tie-aware: a returned row counts as a hit when its exact
  cosine >= the exact k-th best).
- minhash: random documents (near-dup families by token edits, exact-dup
  floods, sub-n-token docs, empty/whitespace/NULL text, NBSP tokens,
  tabs/newlines) x random (num_hashes, bands — including non-dividing,
  shingle_n, max_bucket, threshold) vs an independent restatement built
  on a from-spec pure-Python XXH64 (tools/xxh64_oracle.py): signatures,
  banded buckets (incl. the max_bucket skew valve), candidate pairs, and
  near_dup_pairs' exact-Jaccard verify must all match exactly.
- simhash: random docs x random bits (incl. 64 — the sign-bit literal
  path) vs the per-bit sign-sum restatement, exact.
- ivf: property checks on ivf_topk over adversarial corpora: (a) every
  returned cosine equals the independent sequential-fold restatement
  bit-exactly; (b) per-query ordering/rank contiguity under (cosine
  desc, id asc); (c) a corpus row holding an EXACT copy of the query
  vector is always probed (its top-1 cell is within any n_probe >= 1),
  so the result must contain it or k rows scoring >= it; (d) on
  clustered corpora with in-corpus queries at the registered
  n_probe/n_centroids ratio, tie-aware recall@k >= 0.7 (the plans/llm.py
  floor).
- sketch: deterministic properties of the A3 approximate aggregates —
  approx_count_distinct's HLL sketch is a SET function (3x-duplicated
  input and any repartitioning give the IDENTICAL estimate) and must
  sit within the registered 4*rsd envelope of countDistinct;
  approx_percentile must return an OBSERVED value whose exact rank is
  within the sketch's deterministic N/accuracy rank-error guarantee.

Known generator exclusions (documented, same pattern as
pipeline_fuzz's DST avoidance): hyperplane projections with |proj| <
1e-7 or per-table |proj| gaps < 1e-9 are regenerated — the probe order
there depends on the last ulp of a BLAS matmul, which is a numerics
ambiguity, not an engine semantics question (the engine itself is
deterministic; only the oracle's independently-shaped matmul could
disagree). Scorability-excluded vectors (zero/NaN/inf/wrong-dim) are
exempt from the margin guard since they cannot reach the output.

Usage:
    python tools/similarity_fuzz.py [--seed N] [--n N] [--case I]
                                    [--mutate NAME]

--mutate injects a deliberate oracle-side bug (detection-power
evidence): lsh_probe_highest, lsh_table_mod, lsh_tie_desc,
nd_keep_nan (the NaN-above-threshold trap in the LSH near-dup pair
filter), mh_bands_minus_one, mh_max_bucket_plus, mh_jaccard_multiset,
mh_seed_shift, sh_sign_ge, ivf_pairwise_sum, sk_rel_bound_tight,
sk_rank_err_zero. (A sign >= 0 vs > 0
bucketing mutation is undetectable BY CONSTRUCTION here — the margin
guard excludes |proj| < 1e-7 — so it is deliberately not offered.)

Prints one JSON summary line; exit 1 on any mismatch.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random
import re
import sys
from itertools import combinations

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.xxh64_oracle import spark_xxhash64  # noqa: E402

MUTATE = None  # set from --mutate

# Java regex \s is ASCII; Python's is unicode. The oracle restates the
# ENGINE's (Java) class explicitly — NBSP is a token character.
_ASCII_WS = re.compile("[ \\t\\n\\x0b\\f\\r]+")


def _tokens(text):
    if text is None:
        return []
    return [t for t in _ASCII_WS.split(text.lower()) if t != ""]


def _seq_dot(a, b):
    """zip_with(mul) -> aggregate(0.0, +) restated: per-pair double
    product, strictly sequential accumulation."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _exact_cosine(a, b):
    """cosine_expr / the near-dup pair formula: dot / (sqrt(dot aa) *
    sqrt(dot bb)), all sequential folds."""
    na = math.sqrt(_seq_dot(a, a))
    nb = math.sqrt(_seq_dot(b, b))
    d = na * nb
    if d == 0:
        return None
    return _seq_dot(a, b) / d


def _scorable_vec(v, dim):
    return (
        v is not None
        and len(v) == dim
        and all(math.isfinite(x) for x in v)
        and any(x != 0.0 for x in v)
    )


# --------------------------------------------------------------------------
# lsh_topk
# --------------------------------------------------------------------------

from functools import lru_cache


@lru_cache(maxsize=256)
def _planes(bits, dim, table):
    """The documented plane contract: MT stream seeded by
    (table*1_000_003 + bit), uniform [-1, 1), dim coefficients.
    Memoized: planes depend only on (bits, dim, table) and _bucket_ids
    is called once per row — regenerating the MT draws per row made the
    oracle O(rows x tables x bits x dim) in pure-Python rng calls.
    Callers treat the returned array as read-only."""
    out = []
    for b in range(bits):
        rng = random.Random(table * 1_000_003 + b)
        out.append([rng.uniform(-1.0, 1.0) for _ in range(dim)])
    return np.array(out, dtype=np.float64)


def _bucket_ids(vec, bits, dim, tables, probes):
    """Restate _buckets_udf for ONE vector: per table the sign bucket,
    plus (probes-1) lowest-|proj| single-bit flips, table-major.
    Returns None for NULL / wrong-dim vectors."""
    if vec is None or len(vec) != dim:
        return None
    probes = min(probes, bits + 1)
    v = np.array([float(x) for x in vec], dtype=np.float64)
    out = []
    weights = [1 << i for i in range(bits)]
    for t in range(tables):
        proj = _planes(bits, dim, t) @ v  # (bits,)
        base = 0
        for i in range(bits):
            if proj[i] >= 0:
                base += weights[i]
        row = [base]
        if probes > 1:
            if MUTATE == "lsh_probe_highest":
                order = np.argsort(-np.abs(proj), kind="stable")
            else:
                order = np.argsort(np.abs(proj), kind="stable")
            for j in order[: probes - 1]:
                row.append(base ^ weights[int(j)])
        out.append(row)
    return out  # tables x probes


def gen_lsh_case(rng, i):
    # every 4th lsh case runs the registered config (lsh cases land on
    # i % 5 == 0, so the 4th of those is i % 20 == 0)
    registered = i % 20 == 0
    if registered:
        bits, tables, probes = 4, 8, 4
        dim = int(rng.choice([8, 16]))
        k = int(rng.integers(3, 9))
    elif rng.random() < 0.35:
        # probe-sensitive shape: ONE table with a sparse bucket space
        # (bits high) and 2-4 probes — here WHICH Hamming-1 bucket gets
        # probed decides the candidate set, so probe-order bugs (the
        # lsh_probe_highest mutation class) are actually observable;
        # with many tables / few bits the probed union covers nearly
        # everything and probe choice almost never flips the top-k
        bits = int(rng.integers(5, 9))
        tables = 1
        probes = int(rng.integers(2, 5))
        dim = int(rng.choice([4, 8, 16]))
        k = int(rng.integers(1, 7))
    else:
        bits = int(rng.integers(2, 7))
        tables = int(rng.integers(1, 5))
        probes = int(rng.integers(1, 8))  # may exceed bits+1: clamp path
        dim = int(rng.choice([4, 8, 16]))
        k = int(rng.integers(1, 7))
    n = int(rng.integers(15, 80))
    kind = rng.integers(0, 4)
    if tables == 1 and not registered:
        kind = int(rng.choice([0, 2]))  # clustered shapes: neighbors
        # sit across nearby planes, which is where probe choice matters
    if registered:
        # recall floors are a NEAR-neighbor contract: hyperplane-LSH
        # collision probability is 1 - theta/pi per bit, which degrades
        # to chance for orthogonal corpora (theta -> pi/2) — exactly as
        # designed, so the floor is only asserted on neighbor-rich
        # shapes (found by seed 90210: an orthogonal one-hot corpus
        # measured recall 0.0 with the engine output matching the
        # exact restatement bit-for-bit)
        kind = int(rng.choice([0, 1, 2]))
    if kind == 0:  # clustered Gaussians
        n_clusters = int(rng.integers(2, 6))
        centers = rng.normal(0, 1, (n_clusters, dim))
        # moderate spread for the single-table shape: cluster members
        # should straddle 1-3 hyperplanes so probe selection is load-
        # bearing; tight clusters co-bucket and hide probe-order bugs
        sigma = 0.6 if tables == 1 and not registered else 0.15
        base = centers[rng.integers(0, n_clusters, n)] + rng.normal(
            0, sigma, (n, dim)
        )
    elif kind == 1:  # duplicate flood
        protos = rng.normal(0, 1, (max(2, n // 8), dim))
        base = protos[rng.integers(0, len(protos), n)].copy()
    elif kind == 2:  # near-tie neighbors
        seedv = rng.normal(0, 1, (max(2, n // 4), dim))
        base = seedv[rng.integers(0, len(seedv), n)] + rng.normal(
            0, 1e-4, (n, dim)
        )
    else:  # orthogonal-ish one-hots + noise rows
        base = np.zeros((n, dim))
        for r in range(n):
            base[r, int(rng.integers(0, dim))] = float(rng.choice([1.0, 2.0]))
        noise = rng.random(n) < 0.3
        base[noise] += rng.normal(0, 0.5, (noise.sum(), dim))
    vecs = [[float(x) for x in np.float32(row)] for row in base]
    # sprinkle unscorable rows (exempt from the margin guard: they are
    # excluded from output by the scorability contract)
    for r in range(n):
        p = rng.random()
        if p < 0.04:
            vecs[r] = [0.0] * dim
        elif p < 0.07:
            vecs[r] = None
        elif p < 0.10:
            v = vecs[r][:]
            v[int(rng.integers(0, dim))] = float("nan")
            vecs[r] = v
        elif p < 0.12:
            # INFINITE coordinate: passes a dot(v,v)>0 scorability
            # probe but must surface as NaN cosine and be dropped
            v = vecs[r][:]
            v[int(rng.integers(0, dim))] = float(
                rng.choice([float("inf"), float("-inf")])
            )
            vecs[r] = v
        elif p < 0.15:
            vecs[r] = vecs[r][: dim - 1]  # wrong dimension
    # margin guard: regenerate scorable vectors whose probe order is
    # numerically ambiguous (see module docstring)
    all_planes = np.vstack([_planes(bits, dim, t) for t in range(tables)])
    for r in range(n):
        v = vecs[r]
        if not _scorable_vec(v, dim):
            # NULL/wrong-dim/NaN/inf AND all-zero vectors are exempt:
            # they cannot reach the output (the scorability contract),
            # and perturbing a planted zero vector would silently
            # remove zero-norm coverage from the family
            continue
        for _ in range(50):
            proj = np.abs(all_planes @ np.array(v, dtype=np.float64))
            per_t = proj.reshape(tables, bits)
            gaps = np.diff(np.sort(per_t, axis=1), axis=1)
            if proj.min() > 1e-7 and (gaps.min() > 1e-9 if bits > 1 else True):
                break
            v = [float(x) for x in np.float32(
                np.array(v, dtype=np.float64) + rng.normal(0, 1e-5, dim))]
        vecs[r] = v
    n_q = int(rng.integers(1, 5))
    q_idx = rng.choice(n, size=min(n_q, n), replace=False)
    queries = [(1000 + int(j), vecs[int(ix)]) for j, ix in enumerate(q_idx)]
    corpus = [(int(r), vecs[r]) for r in range(n)]
    return corpus, queries, dict(
        bits=bits, tables=tables, probes=probes, dim=dim, k=k,
        registered=registered,
        nd_threshold=float(rng.choice([0.5, 0.8, 0.95])),
    )


def _oracle_near_dup(corpus, p, threshold):
    """Exact restatement of cosine_near_dup_pairs(bits>0): single-table
    hyperplane bucket (table 0), same-bucket pairs a < b, cosine =
    seq_dot / (norm_a * norm_b) with the norms computed ONCE per row
    (sqrt of the sequential self-dot — the engine's precomputed-__norm
    float path, distinct from cosine_expr's), NaN cosines dropped
    (Spark's NaN-above-everything would otherwise pass >= threshold),
    zero/NaN-norm rows excluded by the __norm > 0 filter."""
    rows = []
    for cid, v in corpus:
        if v is None:
            continue
        # NaN-coordinate rows: self-dot is NaN, sqrt NaN, and NaN > 0
        # is False — excluded exactly like Spark's __norm > 0 filter
        try:
            na = math.sqrt(_seq_dot(v, v))
        except ValueError:
            continue  # negative-NaN corner can't happen; belt/braces
        if not na > 0:
            continue
        bk = _bucket_ids(v, p["bits"], p["dim"], 1, 1)
        if bk is None:
            continue  # wrong-dim: NULL bucket joins nothing
        rows.append((cid, v, na, bk[0][0]))
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if a[3] != b[3]:
                continue
            lo, hi = (a, b) if a[0] < b[0] else (b, a)
            cos = _seq_dot(lo[1], hi[1]) / (lo[2] * hi[2])
            if math.isnan(cos):
                if MUTATE == "nd_keep_nan":
                    out.add((lo[0], hi[0], cos))
                continue
            if cos >= threshold:
                out.add((lo[0], hi[0], cos))
    return out


def _oracle_lsh_topk(corpus, queries, p):
    bits, tables, probes = p["bits"], p["tables"], p["probes"]
    dim, k = p["dim"], p["k"]
    cvecs = dict(corpus)
    c_buckets = {}
    for cid, v in corpus:
        bk = _bucket_ids(v, bits, dim, tables, 1)
        if bk is not None:
            c_buckets[cid] = [row[0] for row in bk]
    rows = []
    for qid, qv in queries:
        qb = _bucket_ids(qv, bits, dim, tables, probes)
        if qb is None:
            continue
        cand = set()
        for cid, cb in c_buckets.items():
            hit = False
            for t in range(tables):
                tt = t % tables if MUTATE != "lsh_table_mod" else (
                    (t + 1) % tables)
                if cb[t] in qb[tt]:
                    hit = True
                    break
            if hit:
                cand.add(cid)
        scored = []
        for cid in cand:
            cv = cvecs[cid]
            cos = _exact_cosine(cv, qv)
            if cos is None or math.isnan(cos):
                continue
            scored.append((cid, cos))
        rev = MUTATE == "lsh_tie_desc"
        scored.sort(key=lambda t: (-t[1], -t[0] if rev else t[0]))
        for r, (cid, cos) in enumerate(scored[:k], start=1):
            rows.append((qid, cid, cos, r))
    return sorted(rows)


def run_lsh_case(spark, corpus, queries, p):
    from lcr_etl_upgrade_spark.operators.similarity import (
        cosine_near_dup_pairs,
        cosine_topk,
        cosine_topk_lsh,
    )

    cdf = spark.createDataFrame(corpus, "vec_id int, embedding array<float>")
    qdf = spark.createDataFrame(
        queries, "query_id int, embedding array<float>"
    )
    got = sorted(
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in cosine_topk_lsh(
            cdf, qdf, k=p["k"], query_id="query_id",
            bits=p["bits"], dim=p["dim"], tables=p["tables"],
            probes=p["probes"],
        ).collect()
    )
    want = _oracle_lsh_topk(corpus, queries, p)
    if got != want:
        return {
            "kind": "lsh_exact_mismatch", "params": p,
            "got": got[:8], "want": want[:8],
            "n_got": len(got), "n_want": len(want),
        }
    # LSH-bucketed near-dup pairs on the SAME corpus (the 5th no_oracle
    # surface, embedding_cosine_near_dup_lsh's operator): exact set
    # compare against the single-table restatement
    nd_got = {
        (r.id_a, r.id_b, r.cosine)
        for r in cosine_near_dup_pairs(
            cdf, threshold=p["nd_threshold"], bits=p["bits"],
            dim=p["dim"],
        ).collect()
    }
    nd_want = _oracle_near_dup(corpus, p, p["nd_threshold"])
    if nd_got != nd_want:
        return {
            "kind": "near_dup_lsh_mismatch", "params": p,
            "only_engine": sorted(nd_got - nd_want)[:5],
            "only_oracle": sorted(nd_want - nd_got)[:5],
        }
    if p["registered"]:
        # tie-aware recall@k vs exact brute force, floor 0.8
        ex = {}
        for r in cosine_topk(
            cdf, qdf, k=p["k"], query_id="query_id"
        ).collect():
            ex.setdefault(r.query_id, []).append(r.cosine)
        for qid, cosines in ex.items():
            if len(cosines) < p["k"]:
                continue  # fewer scorable rows than k: recall undefined
            kth = min(cosines)
            if kth < 0.5:
                # the floor is a near-neighbor contract; below cosine
                # 0.5 per-bit agreement approaches chance and recall is
                # governed by luck, not correctness (see gen_lsh_case)
                continue
            mine = [c for (q, _, c, _) in got if q == qid]
            hits = sum(1 for c in mine if c >= kth)
            if hits / p["k"] < 0.8:
                return {
                    "kind": "lsh_recall_below_floor", "params": p,
                    "query": qid, "recall": hits / p["k"],
                }
    return None


# --------------------------------------------------------------------------
# minhash / LSH candidates / jaccard
# --------------------------------------------------------------------------

_VOCAB = [
    "alpha", "beta", "Gamma", "DELTA", "epsilon", "zeta", "eta", "théta",
    "iota", "kappa", "12.5", "x", "yz", "end.", "a\xa0b",  # NBSP: ONE token
]


def gen_minhash_case(rng):
    num_hashes = int(rng.choice([4, 8, 16]))
    bands = int(rng.integers(1, num_hashes + 1))
    shingle_n = int(rng.integers(2, 5))
    max_bucket = int(rng.choice([2, 3, 10_000]))
    threshold = float(rng.choice([0.3, 0.5, 0.7]))
    n_docs = int(rng.integers(4, 28))
    docs = []
    base_pool = []
    for d in range(n_docs):
        p = rng.random()
        if p < 0.08:
            text = None
        elif p < 0.14:
            text = rng.choice(["", " ", "\t\n", "  \n "])
        elif p < 0.25:
            # sub-n-token doc
            toks = [str(rng.choice(_VOCAB))
                    for _ in range(int(rng.integers(0, shingle_n)))]
            text = " ".join(toks)
        elif base_pool and p < 0.55:
            # near-dup / exact-dup of an earlier doc
            toks = list(base_pool[int(rng.integers(0, len(base_pool)))])
            for _ in range(int(rng.integers(0, 3))):
                op = rng.integers(0, 3)
                if op == 0 and toks:
                    toks[int(rng.integers(0, len(toks)))] = str(
                        rng.choice(_VOCAB))
                elif op == 1 and toks:
                    del toks[int(rng.integers(0, len(toks)))]
                else:
                    toks.insert(int(rng.integers(0, len(toks) + 1)),
                                str(rng.choice(_VOCAB)))
            sep = rng.choice([" ", "  ", "\t", "\n", " \t"])
            text = str(sep).join(toks)
        else:
            toks = [str(rng.choice(_VOCAB))
                    for _ in range(int(rng.integers(shingle_n, 25)))]
            base_pool.append(tuple(toks))
            text = " ".join(toks)
        docs.append((d, text))
    return docs, dict(
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        max_bucket=max_bucket, threshold=threshold,
    )


def _oracle_shingle_sets(docs, n):
    """doc -> set of shingle hashes (token-hash n-grams, signed 64-bit),
    restating shingle_hashes on the independent XXH64."""
    out = {}
    for did, text in docs:
        toks = _tokens(text)
        if len(toks) < n:
            out[did] = set()
            continue
        th = [spark_xxhash64(t) for t in toks]
        out[did] = {
            spark_xxhash64(*th[i:i + n]) for i in range(len(toks) - n + 1)
        }
    return out


def _oracle_minhash(shingle_sets, num_hashes):
    shift = 1 if MUTATE == "mh_seed_shift" else 0
    sigs = {}
    for did, sh in shingle_sets.items():
        if not sh:
            continue  # no shingles -> no signature row
        sigs[did] = [
            min(spark_xxhash64(("int", s + shift), x) for x in sh)
            for s in range(num_hashes)
        ]
    return sigs


def _oracle_buckets(sigs, bands, num_hashes, max_bucket):
    if MUTATE == "mh_bands_minus_one":
        bands = max(1, bands - 1)
    if MUTATE == "mh_max_bucket_plus":
        max_bucket += 1
    rpb = max(1, num_hashes // bands)
    buckets = {}
    for did, sig in sigs.items():
        for b in range(bands):
            key_str = ",".join(
                str(sig[b * rpb + i]) for i in range(rpb)
            )
            buckets.setdefault(
                (b, spark_xxhash64(key_str)), []
            ).append(did)
    return {
        k: sorted(v)
        for k, v in buckets.items()
        if 1 < len(v) <= max_bucket
    }


def _oracle_candidates(buckets):
    pairs = set()
    for docs in buckets.values():
        pairs.update(combinations(docs, 2))  # docs sorted -> a < b
    return pairs


def _oracle_jaccard(shingle_sets, pairs):
    out = {}
    for a, b in pairs:
        sa = shingle_sets.get(a, set())
        sb = shingle_sets.get(b, set())
        inter = len(sa & sb)
        if MUTATE == "mh_jaccard_multiset":
            union = len(sa) + len(sb)
        else:
            union = len(sa) + len(sb) - inter
        out[(a, b)] = inter / max(union, 1)
    return out


def run_minhash_case(spark, docs, p):
    from lcr_etl_upgrade_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
        near_dup_pairs,
    )

    ddf = spark.createDataFrame(docs, "doc_id int, text string")
    sigs_df = minhash_signatures(
        ddf, "text", "doc_id", num_hashes=p["num_hashes"],
        shingle_n=p["shingle_n"],
    )
    got_sigs = {
        r.doc_id: list(r.minhash_sig) for r in sigs_df.collect()
    }
    sh = _oracle_shingle_sets(docs, p["shingle_n"])
    want_sigs = _oracle_minhash(sh, p["num_hashes"])
    if got_sigs != want_sigs:
        bad = [d for d in set(got_sigs) | set(want_sigs)
               if got_sigs.get(d) != want_sigs.get(d)][:3]
        return {"kind": "minhash_sig_mismatch", "params": p, "docs": bad,
                "got": {d: got_sigs.get(d) for d in bad},
                "want": {d: want_sigs.get(d) for d in bad}}

    got_cands = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_candidates(
            sigs_df, "doc_id", bands=p["bands"],
            num_hashes=p["num_hashes"], max_bucket=p["max_bucket"],
        ).collect()
    }
    want_cands = _oracle_candidates(
        _oracle_buckets(want_sigs, p["bands"], p["num_hashes"],
                        p["max_bucket"])
    )
    if got_cands != want_cands:
        return {
            "kind": "lsh_candidates_mismatch", "params": p,
            "only_engine": sorted(got_cands - want_cands)[:6],
            "only_oracle": sorted(want_cands - got_cands)[:6],
        }

    got_pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in near_dup_pairs(
            ddf, "text", "doc_id", num_hashes=p["num_hashes"],
            bands=p["bands"], shingle_n=p["shingle_n"],
            threshold=p["threshold"],
        ).collect()
    }
    # near_dup_pairs uses the default max_bucket (10_000)
    full_cands = _oracle_candidates(
        _oracle_buckets(want_sigs, p["bands"], p["num_hashes"], 10_000)
    )
    jac = _oracle_jaccard(sh, full_cands)
    want_pairs = {k: v for k, v in jac.items() if v >= p["threshold"]}
    if got_pairs != want_pairs:
        keys = set(got_pairs) | set(want_pairs)
        bad = [k for k in keys if got_pairs.get(k) != want_pairs.get(k)][:5]
        return {
            "kind": "near_dup_mismatch", "params": p,
            "pairs": [(k, got_pairs.get(k), want_pairs.get(k))
                      for k in bad],
        }
    return None


# --------------------------------------------------------------------------
# simhash
# --------------------------------------------------------------------------

def gen_simhash_case(rng):
    bits = int(rng.choice([1, 8, 32, 63, 64]))
    n_docs = int(rng.integers(3, 20))
    docs = []
    for d in range(n_docs):
        p = rng.random()
        if p < 0.1:
            text = rng.choice([None, "", "  \t "])
            text = text if text is None else str(text)
        else:
            toks = [str(rng.choice(_VOCAB))
                    for _ in range(int(rng.integers(1, 30)))]
            text = str(rng.choice([" ", "\t", "\n"])).join(toks)
        docs.append((d, text))
    return docs, bits


def _oracle_simhash(docs, bits):
    out = {}
    for did, text in docs:
        toks = _tokens(text)
        if not toks:
            continue  # zero tokens -> no signature row
        hashes = [spark_xxhash64(t) & ((1 << 64) - 1) for t in toks]
        sig = 0
        for b in range(bits):
            s = sum(1 if (h >> b) & 1 else -1 for h in hashes)
            hit = s >= 0 if MUTATE == "sh_sign_ge" else s > 0
            if hit:
                sig |= 1 << b
        out[did] = sig - (1 << 64) if sig >= (1 << 63) else sig
    return out


def run_simhash_case(spark, docs, bits):
    from lcr_etl_upgrade_spark.operators.dedup import simhash

    ddf = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r.doc_id: r.simhash
           for r in simhash(ddf, "text", "doc_id", bits=bits).collect()}
    want = _oracle_simhash(docs, bits)
    if got != want:
        bad = [d for d in set(got) | set(want)
               if got.get(d) != want.get(d)][:4]
        return {"kind": "simhash_mismatch", "bits": bits, "docs": bad,
                "got": {d: got.get(d) for d in bad},
                "want": {d: want.get(d) for d in bad}}
    return None


# --------------------------------------------------------------------------
# ivf
# --------------------------------------------------------------------------

def gen_ivf_case(rng):
    dim = int(rng.choice([8, 16]))
    n = int(rng.integers(40, 140))
    n_clusters = int(rng.integers(2, 7))
    centers = rng.normal(0, 1, (n_clusters, dim))
    base = centers[rng.integers(0, n_clusters, n)] + rng.normal(
        0, 0.12, (n, dim)
    )
    vecs = [[float(x) for x in np.float32(row)] for row in base]
    for r in range(n):
        p = rng.random()
        if p < 0.03:
            vecs[r] = [0.0] * dim
        elif p < 0.05:
            vecs[r] = None
        elif p < 0.07:
            vecs[r] = vecs[r][: dim - 1]
        elif p < 0.09:
            # infinite coordinate: survives scorable()'s dot(v,v) > 0
            # probe, must be excluded from k-means training and never
            # reach the output (NaN cosine)
            v = vecs[r][:]
            v[int(rng.integers(0, dim))] = float("inf")
            vecs[r] = v
    n_q = int(rng.integers(1, 4))
    q_idx = [int(x) for x in rng.choice(n, size=n_q, replace=False)]
    queries = []
    dup_map = {}
    for j, ix in enumerate(q_idx):
        v = vecs[ix]
        if not _scorable_vec(v, dim):
            v = [float(x) for x in np.float32(rng.normal(0, 1, dim))]
            vecs[ix] = v  # plant the duplicate back
        queries.append((1000 + j, v))
        dup_map[1000 + j] = ix
    k = int(rng.integers(2, 8))
    seed = int(rng.choice([1, 7, 42]))
    corpus = [(r, vecs[r]) for r in range(n)]
    params = dict(
        dim=dim, k=k, seed=seed, n_centroids=8, n_probe=4, n_assign=2,
    )
    return corpus, queries, dup_map, params


def run_ivf_case(spark, corpus, queries, dup_map, p):
    from lcr_etl_upgrade_spark.operators.similarity import ivf_topk

    cdf = spark.createDataFrame(corpus, "vec_id int, embedding array<float>")
    qdf = spark.createDataFrame(
        queries, "query_id int, embedding array<float>"
    )
    rows = ivf_topk(
        cdf, qdf, k=p["k"], n_centroids=p["n_centroids"],
        n_probe=p["n_probe"], n_assign=p["n_assign"],
        query_id="query_id", seed=p["seed"], dim=p["dim"],
    ).collect()
    cvecs = dict(corpus)
    qvecs = dict(queries)
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    for qid, rs in per_q.items():
        rs.sort(key=lambda r: r.rank)
        if len(rs) > p["k"]:
            return {"kind": "ivf_too_many_rows", "params": p, "query": qid}
        prev = None
        for pos, r in enumerate(rs, start=1):
            if r.rank != pos:
                return {"kind": "ivf_rank_gap", "params": p, "query": qid,
                        "ranks": [x.rank for x in rs]}
            cv = cvecs.get(r.vec_id)
            if cv is None or not _scorable_vec(cv, p["dim"]):
                return {"kind": "ivf_unscorable_row", "params": p,
                        "query": qid, "vec_id": r.vec_id}
            if MUTATE == "ivf_pairwise_sum":
                va = np.array(cv, dtype=np.float64)
                vb = np.array(qvecs[qid], dtype=np.float64)
                want_cos = float(
                    va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
                )
            else:
                want_cos = _exact_cosine(cv, qvecs[qid])
            if r.cosine != want_cos:
                return {"kind": "ivf_cosine_mismatch", "params": p,
                        "query": qid, "vec_id": r.vec_id,
                        "got": r.cosine, "want": want_cos}
            if prev is not None and (
                r.cosine > prev.cosine
                or (r.cosine == prev.cosine and r.vec_id < prev.vec_id)
            ):
                return {"kind": "ivf_order_violation", "params": p,
                        "query": qid}
            prev = r
    # duplicate guarantee: the planted exact copy is always probed
    for qid, dup_id in dup_map.items():
        rs = per_q.get(qid, [])
        dup_cos = _exact_cosine(cvecs[dup_id], qvecs[qid])
        have_dup = any(
            cvecs[r.vec_id] == cvecs[dup_id] for r in rs
        )
        if not have_dup and not (
            len(rs) == p["k"] and all(r.cosine >= dup_cos for r in rs)
        ):
            return {"kind": "ivf_duplicate_missed", "params": p,
                    "query": qid, "dup_id": dup_id, "dup_cos": dup_cos,
                    "rows": [(r.vec_id, r.cosine) for r in rs]}
    # tie-aware recall floor 0.7 vs exact brute force
    for qid, qv in queries:
        exact = sorted(
            (
                _exact_cosine(cv, qv)
                for _, cv in corpus
                if _scorable_vec(cv, p["dim"])
                and _exact_cosine(cv, qv) is not None
            ),
            reverse=True,
        )
        if len(exact) < p["k"]:
            continue
        kth = exact[p["k"] - 1]
        mine = [r.cosine for r in per_q.get(qid, [])]
        hits = sum(1 for c in mine if c >= kth)
        if hits / p["k"] < 0.7:
            return {"kind": "ivf_recall_below_floor", "params": p,
                    "query": qid, "recall": hits / p["k"]}
    return None


# --------------------------------------------------------------------------
# sketch: approx_count_distinct / approx_percentile properties
# --------------------------------------------------------------------------

def gen_sketch_case(rng):
    """Random value sets for the A3 sketch aggregates: controlled
    distinct cardinality (1..4000) with skewed repetition, NULLs, and
    2-4 groups; random rsd / percentile accuracy / quantile."""
    n_groups = int(rng.integers(1, 5))
    card = int(rng.choice([1, 3, 17, 200, 1500, 4000]))
    rows = []
    for g in range(n_groups):
        n_vals = int(rng.integers(20, 1200))
        vals = rng.integers(0, card, n_vals)
        if rng.random() < 0.5:  # skew: one hot value dominates
            hot = int(rng.integers(0, card))
            mask = rng.random(n_vals) < 0.4
            vals[mask] = hot
        for v in vals:
            rows.append((g, None if rng.random() < 0.05 else int(v)))
    rsd = float(rng.choice([0.02, 0.05, 0.1]))
    accuracy = int(rng.choice([100, 1000, 10000]))
    q = float(rng.choice([0.1, 0.25, 0.5, 0.9, 0.99]))
    return rows, rsd, accuracy, q


def run_sketch_case(spark, rows, rsd, accuracy, q) -> dict | None:
    """Deterministic properties of the approximate aggregates:

    - HLL duplication invariance: the sketch is a SET function — a
      3x-duplicated input must give the IDENTICAL estimate per group.
    - HLL partition invariance: register merge is per-register max
      (commutative/associative) — repartition(2) == repartition(13).
    - the registered 4*rsd relative-error envelope vs countDistinct.
    - approx_percentile's rank contract: the returned value is an
      OBSERVED element whose rank sits within q*N +/- (N/accuracy + 2)
      (the sketch's deterministic rank-error guarantee, +2 slack for
      boundary conventions)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "g int, v long")
    base = {
        r.g: (r.a, r.e)
        for r in df.groupBy("g").agg(
            F.approx_count_distinct("v", rsd).alias("a"),
            F.countDistinct("v").alias("e"),
        ).collect()
    }
    tripled = {
        r.g: r.a
        for r in df.unionAll(df).unionAll(df).groupBy("g").agg(
            F.approx_count_distinct("v", rsd).alias("a")
        ).collect()
    }
    for g, (a, e) in base.items():
        if tripled[g] != a:
            return {"kind": "hll_duplication_variant", "g": g,
                    "base": a, "tripled": tripled[g]}
    for parts in (2, 13):
        rep = {
            r.g: r.a
            for r in df.repartition(parts).groupBy("g").agg(
                F.approx_count_distinct("v", rsd).alias("a")
            ).collect()
        }
        if rep != {g: a for g, (a, _) in base.items()}:
            return {"kind": "hll_partition_variant", "parts": parts}
    bound = 4 * rsd if MUTATE != "sk_rel_bound_tight" else 0.5 * rsd
    for g, (a, e) in base.items():
        if e > 0 and abs(a - e) / e > bound:
            return {"kind": "hll_rel_error", "g": g, "approx": a,
                    "exact": e, "rel": abs(a - e) / e, "bound": bound}
    # percentile rank contract, per group, python-exact
    pct = {
        r.g: r.p
        for r in df.groupBy("g").agg(
            F.expr(
                f"approx_percentile(v, {q}, {accuracy})"
            ).alias("p")
        ).collect()
    }
    by_g: dict[int, list[int]] = {}
    for g, v in rows:
        if v is not None:
            by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        p = pct.get(g)
        if p is None:
            return {"kind": "pct_null", "g": g}
        if p not in set(vals):
            return {"kind": "pct_not_observed", "g": g, "p": p}
        vals.sort()
        n = len(vals)
        lo = sum(1 for x in vals if x < p)   # min rank (0-based)
        hi = sum(1 for x in vals if x <= p)  # max rank
        err = 0 if MUTATE == "sk_rank_err_zero" else n / accuracy + 2
        target = q * (n - 1)
        if not (lo - err <= target <= hi - 1 + err):
            return {"kind": "pct_rank_out_of_bound", "g": g, "p": p,
                    "lo": lo, "hi": hi, "target": target, "n": n,
                    "err": err}
    return None


# --------------------------------------------------------------------------


# ---------------------------------------------------------------- frequent


def gen_frequent_case(rng):
    """Randomized zipf-ish corpora for the Misra-Gries operator: vocab,
    skew, partitioning, sketch size and threshold all sampled; ~30% of
    cases sprinkle NULLs (must not count as items)."""
    n = int(rng.integers(3_000, 15_000))
    vocab = int(rng.integers(50, 3_000))
    alpha = float(rng.uniform(1.1, 2.2))
    parts = int(rng.integers(2, 10))
    k = int(rng.integers(8, 257))
    vals = rng.zipf(alpha, size=n) % vocab
    items = [f"w{v}" for v in vals]
    if rng.random() < 0.3:
        for j in rng.integers(0, n, size=n // 50):
            items[int(j)] = None
    threshold = int(rng.integers(1, max(2, n // 20)))
    # half the cases exercise the round-11 RELATIVE (phi) mode: random
    # phi, k derived inside the operator (ceil(1/phi)*safety), valve
    # unreachable by construction
    phi = float(rng.uniform(0.002, 0.08)) if rng.random() < 0.5 else None
    return items, parts, k, threshold, phi


def run_frequent_case(
    spark, items, parts, k, threshold, phi=None
) -> dict | None:
    """The mergeable-summaries contract vs exact Python counts:

    - realized error budget D <= n/(k+1) + one rounding per partition;
    - n (sentinel-carried) equals the exact non-null count;
    - lo <= f <= lo + D for every reported candidate;
    - superset: every item with f > D is reported;
    - heavy_hitters == exact HAVING-count filter whenever the valve
      precondition (D <= threshold) holds; when it does not, the
      operator must RAISE, never silently under-report;
    - phi mode: threshold == floor(phi*n), result exact, and the valve
      must NEVER fire (k is derived so D < threshold/safety)."""
    import collections
    import math

    from lcr_etl_upgrade_spark.operators.frequent import (
        frequent_item_candidates,
        heavy_hitters,
    )

    df = spark.createDataFrame(
        [(x,) for x in items], "item string"
    ).repartition(parts)
    exact = collections.Counter(x for x in items if x is not None)
    n = sum(exact.values())
    cands, d, n_got, _thr = frequent_item_candidates(df, "item", k, 0)
    if MUTATE == "mg_err_zero":
        d = 0  # pretend the sketch were exact: bounds must now fire
    if n_got != n and MUTATE is None:
        return {"kind": "mg_n_mismatch", "n_got": n_got, "n": n}
    if d > n // (k + 1) + parts:
        return {"kind": "mg_budget_exceeded", "d": d, "n": n, "k": k}
    got = {r.item: r.lo for r in cands.collect()}
    for item, lo in got.items():
        f = exact.get(item, 0)
        if not (lo <= f <= lo + d):
            return {"kind": "mg_bound_violated", "item": item,
                    "lo": lo, "f": f, "d": d}
    for item, f in exact.items():
        if f > d and item not in got:
            return {"kind": "mg_superset_violated", "item": item,
                    "f": f, "d": d}
    if phi is not None:
        thr = int(math.floor(phi * n))
        expected = sorted(
            (i, c) for i, c in exact.items() if c > thr
        )
        try:
            hh = sorted(
                (r[0], r["cnt"])
                for r in heavy_hitters(df, "item", phi=phi).collect()
            )
        except ValueError as exc:
            return {"kind": "mg_phi_valve_fired", "phi": phi,
                    "n": n, "err": str(exc)[:200]}
        if hh != expected:
            diff = set(hh) ^ set(expected)
            return {"kind": "mg_phi_exactness", "diff": sorted(diff)[:5],
                    "phi": phi, "thr": thr, "d": d}
        return None
    expected = sorted(
        (i, c) for i, c in exact.items() if c > threshold
    )
    try:
        hh = sorted(
            (r[0], r["cnt"])
            for r in heavy_hitters(df, "item", threshold, k).collect()
        )
    except ValueError:
        if d <= threshold and MUTATE != "mg_err_zero":
            return {"kind": "mg_valve_false_positive", "d": d,
                    "threshold": threshold}
        return None  # correctly refused: budget exceeds the threshold
    if hh != expected:
        diff = set(hh) ^ set(expected)
        return {"kind": "mg_exactness", "diff": sorted(diff)[:5],
                "threshold": threshold, "d": d}
    return None



# ------------------------------------------------------------------- bpe


def gen_bpe_case(rng):
    alphabet = list("abcdefgh")
    vocab = int(rng.integers(30, 200))
    counts: dict = {}
    for _ in range(vocab):
        w = "".join(
            alphabet[int(rng.integers(0, len(alphabet)))]
            for _ in range(int(rng.integers(1, 9)))
        )
        counts[w] = counts.get(w, 0) + int(rng.integers(1, 60))
    n_merges = int(rng.integers(3, 80))
    return sorted(counts.items()), n_merges


def run_bpe_case(spark, counts, n_merges) -> dict | None:
    """The indexed merge loop vs the unindexed recount-everything
    restatement: identical merge SEQUENCES on random weighted vocabs
    (the index maintenance — remove/re-add pair contributions per
    affected word — is where an off-by-one silently reorders merges),
    then encode parity on sampled words under the learned ranks."""
    from collections import Counter as _Counter

    from lcr_etl_upgrade_spark.operators.bpe import (
        END,
        encode_word,
        learn_merges,
    )

    got = learn_merges(counts, n_merges)
    # unindexed restatement
    words = [list(w) + [END] for w, _ in counts]
    freqs = [c for _, c in counts]
    ref = []
    for _ in range(n_merges):
        pc: _Counter = _Counter()
        for sym, f in zip(words, freqs):
            for pair in zip(sym, sym[1:]):
                pc[pair] += f
        if not pc:
            break
        best = max(pc.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if MUTATE == "bpe_tie_reversed":
            best = max(
                pc.items(),
                key=lambda kv: (kv[1], tuple(-ord(c) for c in "".join(kv[0]))),
            )[0]
        ref.append(best)
        for i, sym in enumerate(words):
            out, j = [], 0
            while j < len(sym):
                if (
                    j + 1 < len(sym)
                    and sym[j] == best[0]
                    and sym[j + 1] == best[1]
                ):
                    out.append(best[0] + best[1])
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            words[i] = out
    if got != ref:
        first = next(
            (i for i, (a, b) in enumerate(zip(got, ref)) if a != b),
            min(len(got), len(ref)),
        )
        return {"kind": "bpe_merge_divergence", "at": first,
                "got": got[first] if first < len(got) else None,
                "ref": ref[first] if first < len(ref) else None,
                "n_merges": n_merges, "vocab": len(counts)}
    # encode parity: token count under ranks == symbols left in the
    # restatement's fully-merged word table
    ranks = {p: i for i, p in enumerate(got)}
    for (w, _), merged in zip(counts, words):
        enc = encode_word(w, ranks)
        if len(enc) != len(merged):
            return {"kind": "bpe_encode_divergence", "word": w,
                    "enc": enc, "train_final": merged}
    return None


def main() -> int:
    global MUTATE
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=20260815)
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--case", type=int, default=None)
    ap.add_argument("--mutate", default=None)
    args = ap.parse_args()
    MUTATE = args.mutate

    from lcr_etl_upgrade_spark.session import get_session

    spark = get_session("similarity_fuzz")

    failures = []
    for i in range(args.n):
        if args.case is not None and i != args.case:
            continue
        rng = np.random.default_rng(args.seed * 1_000_003 + i)
        fam = ("lsh_topk", "minhash", "simhash", "ivf",
               "sketch", "frequent", "bpe")[i % 7]
        if fam == "lsh_topk":
            corpus, queries, p = gen_lsh_case(rng, i)
            rec = run_lsh_case(spark, corpus, queries, p)
        elif fam == "minhash":
            docs, p = gen_minhash_case(rng)
            rec = run_minhash_case(spark, docs, p)
        elif fam == "simhash":
            docs, bits = gen_simhash_case(rng)
            rec = run_simhash_case(spark, docs, bits)
        elif fam == "sketch":
            rows, rsd, accuracy, q = gen_sketch_case(rng)
            rec = run_sketch_case(spark, rows, rsd, accuracy, q)
        elif fam == "frequent":
            items, parts, k, threshold, phi = gen_frequent_case(rng)
            rec = run_frequent_case(
                spark, items, parts, k, threshold, phi
            )
        elif fam == "bpe":
            counts, n_merges = gen_bpe_case(rng)
            rec = run_bpe_case(spark, counts, n_merges)
        else:
            corpus, queries, dup_map, p = gen_ivf_case(rng)
            rec = run_ivf_case(spark, corpus, queries, dup_map, p)
        if rec is not None:
            failures.append({"i": i, "family": fam, **rec})
            print(f"FAIL case {i} [{fam}]: "
                  f"{json.dumps(failures[-1], default=str)[:700]}",
                  file=sys.stderr)
    print(json.dumps({
        "seed": args.seed, "n": args.n, "mutate": MUTATE,
        "failures": failures, "ok": not failures,
    }, default=str))
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
