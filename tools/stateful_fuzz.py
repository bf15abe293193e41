#!/usr/bin/env python
"""Randomized differential for the STATEFUL operators: sessionization,
MERGE upsert chains, SCD2 application — vs DuckDB restatements of
their documented semantics (round-9 extension of the fuzzing
machinery; the frozen oracle queries pin one shape of each, hypothesis
pins composition laws, and this varies the SHAPES randomly).

Families (each case seeded from (seed, index), index % 4 selects):

- sessionize: random multi-user event sets with deliberate duplicate
  (user_id, ts) TIES (the tiebreaker regression surface), NULL
  timestamps (dropped by contract), random gap; engine =
  plans.events.sessionize, oracle = the lag/cumsum restatement in
  DuckDB SQL (epoch_us arithmetic, same (ts, event_id) total order,
  exact fixed-point session_value). Whole-second timestamps only —
  Spark and DuckDB render fractional seconds differently in the
  VARCHAR casts the query returns (a presentation divergence, not
  semantics).
- upsert: a base table + N random update batches (keys deduped per
  batch, the operator's documented caller contract) folded through
  operators.merge.upsert; oracle = latest-batch-wins row_number
  restatement over the union of all batches.
- dyngap: the dynamic-gap core (plans.events.session_ids with a
  per-row gap_us column): the PREVIOUS row's allowance governs the
  break, restated as lag(gap_us) in the DuckDB window.
- scd2: operators.merge.scd2_apply over a dimension that includes
  NULL IS_CURRENT rows (the r5 fixed must-not-lose-rows class) and
  already-closed versions; oracle = the hit-marking LEFT JOIN + union
  restated in SQL.
- watermark (round 10): the F1/F2/C10 incremental LOOP
  (operators.incremental.run_incremental) over random multi-cycle
  cumulative sources — backdated rows, duplicate keys across cycles,
  boundary-timestamp collisions, NULL keys at the boundary (kept +
  re-selected by contract), NULL MODIFY backfill, empty cycles,
  standing watermarks (boundary-key UNION semantics) — vs an
  independent Python restatement of the documented exactly-once /
  boundary-cap contract. --mutate wm_strict_gt | wm_clear_on_stand |
  wm_null_key_excluded are the detection-power probes.
- asof (round 10): asof_join_backward over random multi-key streams
  with duplicate instants, exact left==right collisions (the <= vs <
  boundary under allow_exact_match), and NULLs inside value columns
  (the atomic-struct guarantee: NO per-column backfill) vs the
  documented-contract restatement (max candidate under (rts, v1, v2),
  NULL fields smallest). --mutate asof_strict_flip | asof_tie_min |
  asof_frankenrow.

Usage:
    python tools/stateful_fuzz.py [--seed N] [--n N] [--case I]
                                  [--mutate NAME]

Prints one JSON summary line; exit 1 on any mismatch.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import frame_to_rows  # noqa: E402

BASE_TS = dt.datetime(2024, 3, 1, 0, 0, 0)


def _compare(srows, scols, con, sql) -> dict | None:
    try:
        res = con.execute(sql)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    except Exception as exc:
        return {"side": "duckdb_error", "err": repr(exc)[:400]}
    s_norm, s_cols = frame_to_rows(srows, scols)
    o_norm, o_cols = frame_to_rows(orows, ocols)
    if [c.lower() for c in s_cols] != [c.lower() for c in o_cols]:
        return {"side": "schema", "spark": s_cols, "duckdb": o_cols}
    if s_norm != o_norm:
        i = next(
            (j for j, (a, b) in enumerate(zip(s_norm, o_norm)) if a != b),
            min(len(s_norm), len(o_norm)),
        )
        return {
            "side": "values", "spark_rows": len(s_norm),
            "duckdb_rows": len(o_norm),
            "first_diff": {
                "cols": s_cols,
                "spark": s_norm[i] if i < len(s_norm) else None,
                "duckdb": o_norm[i] if i < len(o_norm) else None,
            },
        }
    return None


# ------------------------------------------------------------ sessionize


def gen_session_case(rng):
    n_users = int(rng.integers(1, 12))
    gap_s = int(rng.choice([1, 37, 300, 1800]))
    rows = []
    eid = 0
    for u in range(n_users):
        t = BASE_TS + dt.timedelta(seconds=int(rng.integers(0, 3600)))
        for _ in range(int(rng.integers(0, 30))):
            # duplicate-ts TIES on ~25% of steps; ~20% land EXACTLY on
            # the gap boundary (a strict-> vs >= off-by-one is invisible
            # without boundary deltas — caught by this tool's own
            # mutation check); occasional NULL ts
            r = rng.random()
            if r < 0.25:
                pass  # tie: same ts as the previous event
            elif r < 0.45:
                t = t + dt.timedelta(seconds=gap_s)  # boundary: == gap
            else:
                t = t + dt.timedelta(seconds=int(rng.integers(0, 1200)))
            ts = None if rng.random() < 0.06 else t
            rows.append(
                (u, eid, ts, float(int(rng.integers(-64, 65))) / 8.0)
            )
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["user_id", "event_id", "ts", "value"]
    )
    return pdf, gap_s * 1_000_000


def run_session_case(spark, con, pdf, gap_us) -> dict | None:
    from lcr_etl_upgrade_spark.plans.events import sessionize

    sdf = spark.createDataFrame(
        pdf.astype(object).where(pdf.notna(), None),
        "user_id long, event_id long, ts timestamp_ntz, value double",
    )
    try:
        out = sessionize(sdf, gap_us=gap_us)
        srows = [tuple(r) for r in out.collect()]
        scols = out.columns
    except Exception as exc:
        return {"side": "spark_error", "err": repr(exc)[:400]}
    con.register("raw_events", pdf)
    sql = f"""
    WITH clean AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM raw_events WHERE ts IS NOT NULL
    ), marked AS (
      SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                        > {gap_us}
                THEN 1 ELSE 0 END AS is_new
      FROM clean
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT *, SUM(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS session_id FROM marked
    )
    SELECT user_id, session_id, count(*) AS n_events,
           CAST(min(ts) AS VARCHAR) AS session_start,
           CAST(max(ts) AS VARCHAR) AS session_end,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
             AS session_value
    FROM sess GROUP BY user_id, session_id
    """
    return _compare(srows, scols, con, sql)


def gen_dyngap_case(rng):
    """Per-row gap allowances (the dynamic-session-gap shape): the
    PREVIOUS row's allowance governs whether the next event chains."""
    pdf, _ = gen_session_case(rng)
    gaps = [int(rng.choice([1, 37, 300, 1800])) * 1_000_000
            for _ in range(len(pdf))]
    pdf = pdf.assign(gap_us=gaps)
    return (pdf,)


def run_dyngap_case(spark, con, pdf) -> dict | None:
    from pyspark.sql import functions as F

    from lcr_etl_upgrade_spark.plans.events import session_ids

    sdf = spark.createDataFrame(
        pdf.astype(object).where(pdf.notna(), None),
        "user_id long, event_id long, ts timestamp_ntz, value double, "
        "gap_us long",
    ).filter(F.col("ts").isNotNull())
    try:
        out = session_ids(sdf, F.col("gap_us")).select(
            "user_id", "event_id", "session_id"
        )
        srows = [tuple(r) for r in out.collect()]
        scols = out.columns
    except Exception as exc:
        return {"side": "spark_error", "err": repr(exc)[:400]}
    con.register("raw_dyn", pdf)
    sql = """
    WITH clean AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, gap_us
      FROM raw_dyn WHERE ts IS NOT NULL
    ), marked AS (
      SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                        > lag(gap_us) OVER w
                THEN 1 ELSE 0 END AS is_new
      FROM clean
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, SUM(is_new) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_id FROM marked
    """
    return _compare(srows, scols, con, sql)


# --------------------------------------------------------------- upsert


def gen_upsert_case(rng):
    keyspace = int(rng.integers(5, 40))

    def batch(bi, n):
        ks = rng.choice(keyspace, size=min(n, keyspace), replace=False)
        return pd.DataFrame({
            "k": [int(x) for x in ks],
            "v_int": [int(rng.integers(-100, 100)) for _ in ks],
            "v_str": [f"b{bi}_{int(rng.integers(0, 10))}" for _ in ks],
        })

    base = batch(0, int(rng.integers(1, 25)))
    batches = [
        batch(bi + 1, int(rng.integers(1, 20)))
        for bi in range(int(rng.integers(1, 5)))
    ]
    return base, batches


def run_upsert_case(spark, con, base, batches) -> dict | None:
    from lcr_etl_upgrade_spark.operators.merge import upsert

    schema = "k long, v_int long, v_str string"
    cur = spark.createDataFrame(base, schema)
    try:
        for b in batches:
            cur = upsert(cur, spark.createDataFrame(b, schema), ["k"])
        srows = [tuple(r) for r in cur.collect()]
        scols = cur.columns
    except Exception as exc:
        return {"side": "spark_error", "err": repr(exc)[:400]}
    stamped = pd.concat(
        [df.assign(batch=i) for i, df in enumerate([base] + batches)],
        ignore_index=True,
    )
    con.register("all_rows", stamped)
    sql = """
    SELECT k, v_int, v_str FROM (
      SELECT *, row_number() OVER (
        PARTITION BY k ORDER BY batch DESC
      ) AS rn FROM all_rows
    ) WHERE rn = 1
    """
    return _compare(srows, scols, con, sql)


# ----------------------------------------------------------------- scd2


def gen_scd2_case(rng):
    keyspace = int(rng.integers(4, 25))
    dim_rows = []
    for k in range(int(rng.integers(1, keyspace + 1))):
        n_vers = int(rng.integers(1, 4))
        for v in range(n_vers):
            is_last = v == n_vers - 1
            flag = (
                None if (is_last and rng.random() < 0.15)
                else bool(is_last)
            )
            vf = BASE_TS + dt.timedelta(days=v * 10)
            vt = None if flag is not False else (
                BASE_TS + dt.timedelta(days=(v + 1) * 10)
            )
            if flag is None:
                vt = None  # NULL-flag rows: neither open nor closed
            dim_rows.append((k, f"attr_{k}_{v}", vf, vt, flag))
    dim = pd.DataFrame(
        dim_rows,
        columns=["k", "attr", "VALID_FROM", "VALID_TO", "IS_CURRENT"],
    )
    ks = rng.choice(keyspace, size=int(rng.integers(1, keyspace + 1)),
                    replace=False)
    upd = pd.DataFrame({
        "k": [int(x) for x in ks],
        "attr": [f"new_{int(x)}" for x in ks],
    })
    as_of = (BASE_TS + dt.timedelta(days=100)).strftime(
        "%Y-%m-%d %H:%M:%S"
    )
    return dim, upd, as_of


def run_scd2_case(spark, con, dim, upd, as_of) -> dict | None:
    from lcr_etl_upgrade_spark.operators.merge import scd2_apply

    sdim = spark.createDataFrame(
        dim.astype(object).where(dim.notna(), None),
        "k long, attr string, VALID_FROM timestamp_ntz, "
        "VALID_TO timestamp_ntz, IS_CURRENT boolean",
    )
    supd = spark.createDataFrame(upd, "k long, attr string")
    try:
        out = scd2_apply(sdim, supd, ["k"], as_of=as_of)
        srows = [tuple(r) for r in out.collect()]
        scols = out.columns
    except Exception as exc:
        return {"side": "spark_error", "err": repr(exc)[:400]}
    con.register("dim", dim)
    con.register("upd", upd)
    sql = f"""
    SELECT k, attr,
           CAST(VALID_FROM AS TIMESTAMP) AS VALID_FROM,
           CASE WHEN hit THEN TIMESTAMP '{as_of}'
                ELSE CAST(VALID_TO AS TIMESTAMP) END AS VALID_TO,
           CASE WHEN hit THEN false ELSE IS_CURRENT END AS IS_CURRENT
    FROM (
      SELECT d.*, (u.k IS NOT NULL AND COALESCE(d.IS_CURRENT, false))
               AS hit
      FROM dim d LEFT JOIN (SELECT DISTINCT k FROM upd) u USING (k)
    )
    UNION ALL
    SELECT k, attr, TIMESTAMP '{as_of}', NULL, true FROM upd
    """
    return _compare(srows, scols, con, sql)


# ------------------------------------------------------------ watermark

MUTATE = None  # --mutate: deliberate oracle-side bug for evidence runs


def gen_watermark_case(rng):
    """Random multi-cycle incremental-load scenario: a cumulative source
    with backdated rows, duplicate keys, NULL keys, boundary-timestamp
    collisions (a small whole-second grid forces them), NULL MODIFY_DATE
    backfilled from CREATE_DATE, rows with neither (dropped), empty
    cycles, and standing watermarks (later batches landing at exactly
    the current max instant)."""
    n_cycles = int(rng.integers(2, 6))
    use_key = rng.random() < 0.75
    keyspace = int(rng.integers(2, 10))
    # a TIGHT grid (sometimes just 3 instants) makes standing
    # watermarks and boundary collisions common instead of incidental —
    # the union-on-stand and NULL-key-kept rules need them to be
    # observable at all
    grid = [
        BASE_TS + dt.timedelta(seconds=int(s))
        for s in sorted(rng.choice(
            3600, size=int(rng.choice([3, 6])), replace=False))
    ]
    batches = []
    rid = 0
    for _ in range(n_cycles):
        rows = []
        for _ in range(int(rng.integers(0, 14))):
            k = (
                None if rng.random() < 0.10
                else int(rng.integers(0, keyspace))
            )
            ts = grid[int(rng.integers(0, len(grid)))]
            if rng.random() < 0.15:
                ts = ts + dt.timedelta(
                    microseconds=int(rng.integers(1, 1_000_000))
                )
            modify, create = ts, None
            q = rng.random()
            if q < 0.15:
                modify, create = None, ts  # C10 backfill path
            elif q < 0.22:
                modify, create = None, None  # effective-ts NULL: dropped
            elif q < 0.40:
                create = grid[int(rng.integers(0, len(grid)))]  # modify wins
            rows.append((rid, k, modify, create))
            rid += 1
        batches.append(rows)
    return batches, use_key


def _wm_oracle(batches, use_key):
    """Independent Python restatement of the documented incremental
    contract (operators/incremental.py): effective ts = coalesce(modify,
    create); NULL-effective rows never select; plain >= when no boundary
    keys are recorded, else ts > wm OR (ts == wm AND key not recorded) —
    NULL keys always KEPT at the boundary (and never recorded, so they
    re-select: the documented duplicate allowance); new watermark =
    max(effective) of the written batch; a standing watermark UNIONS
    prior boundary keys with the newly fetched ones; an empty selection
    leaves the state untouched."""
    wm = dt.datetime(1900, 1, 1)
    wm_str = "1900-01-01 00:00:00"
    boundary: set[str] = set()
    cumulative = []
    per_cycle = []
    for rows in batches:
        cumulative = cumulative + list(rows)
        sel = []
        for rid, k, modify, create in cumulative:
            eff = modify if modify is not None else create
            if eff is None:
                continue
            if use_key and boundary:
                if MUTATE == "wm_null_key_excluded":
                    at_boundary_keep = (
                        k is not None and str(k) not in boundary
                    )
                else:
                    at_boundary_keep = (
                        k is None or str(k) not in boundary
                    )
                keep = eff > wm or (eff == wm and at_boundary_keep)
            else:
                keep = eff > wm if MUTATE == "wm_strict_gt" else eff >= wm
            if keep:
                sel.append((rid, k, eff))
        if not sel:
            per_cycle.append(([], wm_str, set(boundary)))
            continue
        new_wm = max(e for _, _, e in sel)
        new_wm_str = str(new_wm)
        if use_key:
            fetched = {
                str(k) for _, k, e in sel if e == new_wm and k is not None
            }
            if new_wm_str == wm_str and MUTATE != "wm_clear_on_stand":
                boundary = boundary | fetched
            else:
                boundary = fetched
        else:
            boundary = set()
        wm, wm_str = new_wm, new_wm_str
        per_cycle.append((sorted(r for r, _, _ in sel), wm_str,
                          set(boundary)))
    return per_cycle


def run_watermark_case(spark, batches, use_key) -> dict | None:
    import tempfile

    from lcr_etl_upgrade_spark.operators.incremental import (
        WatermarkStore,
        run_incremental,
    )

    want = _wm_oracle(batches, use_key)
    with tempfile.TemporaryDirectory() as td:
        store = WatermarkStore(td)
        cumulative = []
        for c, rows in enumerate(batches):
            cumulative = cumulative + list(rows)
            df = spark.createDataFrame(
                cumulative,
                "rid long, k long, MODIFY_DATE timestamp_ntz, "
                "CREATE_DATE timestamp_ntz",
            )
            written: list[int] = []
            n = run_incremental(
                spark, df, "t", store,
                lambda d: written.extend(r.rid for r in d.collect()),
                key_col="k" if use_key else None,
            )
            got_wm, got_keys = store.read_state("t")
            want_rids, want_wm, want_keys = want[c]
            if sorted(written) != want_rids:
                return {
                    "kind": "written_set", "cycle": c, "use_key": use_key,
                    "got": sorted(written)[:20], "want": want_rids[:20],
                }
            if n != len(want_rids):
                return {"kind": "row_count", "cycle": c, "got": n,
                        "want": len(want_rids)}
            if got_wm != want_wm:
                return {"kind": "watermark", "cycle": c,
                        "got": got_wm, "want": want_wm}
            if set(got_keys) != want_keys:
                return {
                    "kind": "boundary_keys", "cycle": c,
                    "got": sorted(got_keys)[:20],
                    "want": sorted(want_keys)[:20],
                }
    return None


# ----------------------------------------------------------------- asof


def gen_asof_case(rng):
    """Random as-of-join shapes: multi-key left/right with duplicate
    timestamps (incl. exact left==right collisions — the <= vs <
    boundary), NULLs inside value columns (the atomic-struct /
    frankenrow surface), keys present on one side only, empty right
    partitions, and both allow_exact_match settings. Timestamps stay
    non-NULL: the documented contract ('latest right row with
    right_ts <= left_ts') doesn't define NULL-instant ordering — that
    corner belongs to the window formulation, not the spec."""
    n_keys = int(rng.integers(1, 7))
    grid = [
        BASE_TS + dt.timedelta(seconds=int(s))
        for s in sorted(rng.choice(600, size=5, replace=False))
    ]
    tick = lambda: (  # noqa: E731
        grid[int(rng.integers(0, len(grid)))]
        + (dt.timedelta(microseconds=int(rng.integers(0, 3)) * 500_000))
    )
    left = []
    for lid in range(int(rng.integers(1, 25))):
        left.append((int(rng.integers(0, n_keys)), lid, tick()))
    right = []
    for _ in range(int(rng.integers(0, 30))):
        v1 = None if rng.random() < 0.2 else int(rng.integers(-9, 10))
        v2 = None if rng.random() < 0.2 else int(rng.integers(0, 100))
        right.append((int(rng.integers(0, n_keys)), tick(), v1, v2))
    exact = bool(rng.integers(0, 2))
    return left, right, exact


def _asof_oracle(left, right, exact):
    """Independent restatement of the documented contract: per left
    row, the candidate set is same-key right rows with rts <= lts
    (strict < when exact=False); the match is the MAX candidate under
    (rts, v1, v2) with NULL fields ordering SMALLEST (Spark's struct
    ordering) and the WHOLE row travels atomically."""
    def null_low(v):
        return (v is not None, 0 if v is None else v)

    out = []
    for k, lid, lts in left:
        cands = [
            r for r in right
            if r[0] == k and (r[1] <= lts if exact else r[1] < lts)
        ]
        if MUTATE == "asof_strict_flip":
            cands = [
                r for r in right
                if r[0] == k and (r[1] < lts if exact else r[1] <= lts)
            ]
        if not cands:
            out.append((k, lid, lts, None, None, None))
            continue
        keyf = lambda r: (r[1], null_low(r[2]), null_low(r[3]))  # noqa: E731
        best = min(cands, key=keyf) if MUTATE == "asof_tie_min" else max(
            cands, key=keyf
        )
        if MUTATE == "asof_frankenrow":
            # per-column last-non-null: the bug class the atomic struct
            # exists to prevent
            srt = sorted(cands, key=keyf)
            v1 = next((r[2] for r in reversed(srt) if r[2] is not None),
                      None)
            v2 = next((r[3] for r in reversed(srt) if r[3] is not None),
                      None)
            out.append((k, lid, lts, best[1], v1, v2))
        else:
            out.append((k, lid, lts, best[1], best[2], best[3]))
    return sorted(out)


def run_asof_case(spark, left, right, exact) -> dict | None:
    from lcr_etl_upgrade_spark.operators.joins import asof_join_backward

    ldf = spark.createDataFrame(
        left, "k long, lid long, lts timestamp_ntz"
    )
    rdf = spark.createDataFrame(
        right, "k long, rts timestamp_ntz, v1 long, v2 long"
    )
    try:
        got = sorted(
            (r.k, r.lid, r.lts, r.rts, r.v1, r.v2)
            for r in asof_join_backward(
                ldf, rdf, "k", "lts", "rts", ["v1", "v2"],
                allow_exact_match=exact,
            ).collect()
        )
    except Exception as exc:
        return {"side": "spark_error", "err": repr(exc)[:400]}
    want = _asof_oracle(left, right, exact)
    if got != want:
        i = next(
            (j for j, (a, b) in enumerate(zip(got, want)) if a != b),
            min(len(got), len(want)),
        )
        return {
            "side": "values", "exact": exact,
            "spark_rows": len(got), "oracle_rows": len(want),
            "first_diff": {
                "spark": repr(got[i]) if i < len(got) else None,
                "oracle": repr(want[i]) if i < len(want) else None,
            },
        }
    return None


# --------------------------------------------------------------- driver


def main() -> int:
    global MUTATE
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=20260815)
    ap.add_argument("--n", type=int, default=90)
    ap.add_argument("--mutate", default=None)
    ap.add_argument("--case", type=int, default=None)
    args = ap.parse_args()
    MUTATE = args.mutate

    import duckdb

    from lcr_etl_upgrade_spark.session import get_session

    spark = get_session("stateful_fuzz")
    con = duckdb.connect()
    con.execute("SET timezone='UTC'")

    failures = []
    for i in range(args.n):
        if args.case is not None and i != args.case:
            continue
        rng = np.random.default_rng(args.seed * 1_000_003 + i)
        fam = ("sessionize", "upsert", "scd2", "dyngap",
               "watermark", "asof")[i % 6]
        if fam == "sessionize":
            pdf, gap_us = gen_session_case(rng)
            rec = run_session_case(spark, con, pdf, gap_us)
        elif fam == "upsert":
            base, batches = gen_upsert_case(rng)
            rec = run_upsert_case(spark, con, base, batches)
        elif fam == "dyngap":
            (pdf,) = gen_dyngap_case(rng)
            rec = run_dyngap_case(spark, con, pdf)
        elif fam == "watermark":
            batches, use_key = gen_watermark_case(rng)
            rec = run_watermark_case(spark, batches, use_key)
        elif fam == "asof":
            la, ra, exact = gen_asof_case(rng)
            rec = run_asof_case(spark, la, ra, exact)
        else:
            dim, upd, as_of = gen_scd2_case(rng)
            rec = run_scd2_case(spark, con, dim, upd, as_of)
        if rec is not None:
            failures.append({"i": i, "family": fam, **rec})
            print(f"FAIL case {i} [{fam}]: "
                  f"{json.dumps(failures[-1])[:700]}", file=sys.stderr)
    print(json.dumps({
        "seed": args.seed, "n": args.n,
        "failures": failures, "ok": not failures,
    }))
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
