#!/usr/bin/env python
"""Randomized dirty-value differential for the reference-core pipeline.

Round-9 ask #1. The C1-C10/F3-F5 coercion library IS the reference's
semantics (conform -> cleanse -> enrich, mirroring
/root/reference/ingest.py:507-622's transform_column family), and until
this tool it was covered only by builder-authored fixtures and the
frozen oracle queries. This fuzzer generates random TableSpecs (random
target types from the reference's palette, case-mangled mappings,
missing/extra source columns, ETL_* fallback columns, future-cap
subsets) x random dirty all-string corpora, runs the REAL pipeline
(``lcr_etl_upgrade_spark.pipeline.transform_table``) on Spark, and
compares against a DuckDB SQL restatement of the DOCUMENTED semantics
authored here, independently of the implementation:

  - F3/C9 scrub: length <= 3 or digit-free -> NULL
  - C2 timestamps: native ISO-family parse first (restated as DuckDB
    try_cast + minute-precision strptime), then the fuzzy fallback
    (restated as a strptime cascade over the generator's closed format
    grammar, America/New_York-localized to UTC via ICU, future-clamped
    to as_of) — dateutil itself is never consulted by the oracle
  - C3 dates: same shape minus timezone, futures -> NULL (asymmetry)
  - C4/C5 decimal/double: TRY_CAST (probed: both engines round
    string->decimal ties away from zero, accept .5/5./1E-2, reject
    1,000 and precision overflow)
  - C6/C7 booleans: token CASE restatement (true/1/yes/t etc.)
  - C1 JSON / C8 string: identity passthrough
  - F5 future cap: CASE > as_of THEN as_of on the spec'd columns
  - ETL_* timestamp columns: COALESCE(value, as_of); absent ones
    arrive as as_of, not NULL
  - P1-P4 conform: the target<-source resolution (case-insensitive,
    mapping-priority-over-passthrough, missing -> typed NULL, extras
    dropped) is re-derived here from the documented rules and drives
    WHICH raw column each oracle expression reads

Dialect traps deliberately designed around (each probed, each a real
engine divergence, not a bug in either):
  - bare numeric strings: Spark's try_to_timestamp('1234') parses a
    YEAR (and 5+ digits exceed datetime.date, breaking Python-side
    collection — the documented fidelity-over-totality seam in
    operators/cleanse.date_expr) -> pure-numeric values are excluded
    from timestamp/date-typed columns;
  - digit-bearing junk ('12ab34xz'): dateutil's fuzzy=True anchors
    missing fields to datetime.now(), nondeterministic across days ->
    garbage destined for timestamp/date columns is digit-free or
    <= 3 chars (the scrub nulls it before dateutil can see it);
  - whitespace: Spark's native timestamp cast trims, DuckDB's does not
    -> the restatement casts trim(raw); fuzzy-format values carry no
    padding (strptime requires exact consumption on both sides);
  - minute-precision ISO ('2024-03-05 12:34'): Spark native parses,
    DuckDB try_cast refuses -> explicit strptime branch;
  - DST: naive NY walls in the 01:00-03:59 window are ambiguous or
    nonexistent on transition days and zoneinfo vs ICU may pick
    different offsets -> generated local times avoid those hours;
  - zone offsets near midnight: Spark's string->date cast takes the
    literal date part where a shifted instant could cross it ->
    offset-bearing values carry midday times only;
  - inf/NaN spellings and LTZ collection (pyspark converts LTZ through
    the SYSTEM zone at collect) -> doubles exclude inf/nan, timestamp
    targets are TIMESTAMP_NTZ (the types schemas.py uses; the LTZ
    reinterpretation is a pinned unit test, a UTC-session no-op).

Every case is reproducible from (seed, index); a failing case is
greedily minimized (drop target columns, bisect rows) before reporting.

Usage:
    python tools/pipeline_fuzz.py [--seed N] [--n N] [--rows N] [--case I]

Prints one JSON summary line; exit 1 on any mismatch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import frame_to_rows  # noqa: E402

# ------------------------------------------------------------ generators

# (strftime fmt, has_time): the closed fuzzy grammar. Every entry is
# probed dateutil-strict-parseable, Spark-native-UNparseable, and DuckDB
# try_strptime-expressible.
FUZZY_FMTS = [
    ("%m/%d/%Y", False),
    ("%m/%d/%Y %H:%M:%S", True),
    ("%m/%d/%Y %I:%M %p", True),
    ("%b %d %Y %I:%M%p", True),
    ("%d-%b-%Y", False),
    ("%Y/%m/%d", False),
]

BOOL_TOKENS = [
    "true", "True", "TRUE", "false", "False", "FALSE", "0", "1",
    "yes", "Yes", "YES", "no", "No", "t", "T", "f", "F",
]
BOOL_JUNK = ["maybe", "2", "10", "truee", "on", "off", " true ", "-1", ""]

NUM_STRS = [
    "0", "7", "-42", "12345", "1.25", "-1.25", "+4.5", ".5", "5.",
    "1e3", "1E-2", "  7 ", "0.004", "-0.125", "99999999999999999999",
    "1,000", "abc", "12ab", "", "%", "3.14159",
]

# timestamp/date garbage MUST be digit-free or <=3 chars (see traps)
TS_GARBAGE = ["", "ab", "x!", "n/a", "N/A", "1", "9.9", "....",
              "hello world", "unknown", "null", "NaT", "-", "  "]

STR_POOL = [
    "", "plain", "O'Brien", 'a"b', "café", "tab\there",
    "{\"a\": 1, \"b\": [2, 3]}", "not json {", "TRUE", "12345",
    "2024-01-01", "line\nbreak", "\\backslash",
]

NAME_POOL = [
    "Lead_Id", "SRC_VALUE", "Score", "Origin_TS", "EventDate",
    "Is_Active", "Payload_Json", "Amount", "Ratio", "Flag_Str",
    "Modify_TS", "Region", "xq7", "BIG_COL", "mixedCase",
]


def _rand_dt(rng, lo_year=2023, hi_year=2026, midday_only=False):
    import datetime as dt

    y = int(rng.integers(lo_year, hi_year + 1))
    m = int(rng.integers(1, 13))
    d = int(rng.integers(1, 29))
    if midday_only:
        h = int(rng.integers(10, 15))
    else:
        h = int(rng.choice([0, 5, 6, 9, 12, 15, 18, 21, 22, 23]))
    return dt.datetime(y, m, d, h, int(rng.integers(0, 60)),
                       int(rng.integers(0, 60)))


def gen_ts_value(rng) -> str | None:
    """One dirty cell destined for a timestamp/date-typed column."""
    k = rng.random()
    if k < 0.08:
        return None
    if k < 0.25:
        return str(rng.choice(TS_GARBAGE))
    v = _rand_dt(rng)
    if k < 0.60:  # native ISO family
        style = int(rng.integers(0, 6))
        if style == 0:
            s = v.strftime("%Y-%m-%d %H:%M:%S")
        elif style == 1:
            s = v.strftime("%Y-%m-%dT%H:%M:%S")
        elif style == 2:
            s = v.strftime("%Y-%m-%d %H:%M:%S") + f".{int(rng.integers(0, 1000)):03d}"
        elif style == 3:
            s = v.strftime("%Y-%m-%d")
        elif style == 4:
            s = v.strftime("%Y-%m-%d %H:%M")
        else:
            s = _rand_dt(rng, midday_only=True).strftime(
                "%Y-%m-%d %H:%M:%S"
            ) + str(rng.choice(["+02:00", "-05:00", "+00:00"]))
        if rng.random() < 0.15 and "+" not in s and "-05" not in s:
            s = " " + s + " "  # native trims; scrub sees len > 3
        return s
    # fuzzy family
    fmt, _ = FUZZY_FMTS[int(rng.integers(0, len(FUZZY_FMTS)))]
    return v.strftime(fmt)


def gen_value(rng, kind) -> str | None:
    if kind in ("timestamp", "date"):
        return gen_ts_value(rng)
    if rng.random() < 0.08:
        return None
    if kind in ("decimal", "double"):
        return str(rng.choice(NUM_STRS))
    if kind in ("boolean", "boolean_string"):
        pool = BOOL_TOKENS if rng.random() < 0.7 else BOOL_JUNK
        return str(rng.choice(pool))
    return str(rng.choice(STR_POOL))


# --------------------------------------------------------------- TableSpec


class ColSpec:
    def __init__(self, name, kind, ddl, src, mapped):
        self.name = name      # target column name
        self.kind = kind      # palette kind
        self.ddl = ddl        # spark type ddl
        self.src = src        # source column name or None (missing)
        self.mapped = mapped  # True -> via mapping entry; False -> same-name


def _mangle(rng, name: str) -> str:
    return "".join(
        c.upper() if rng.random() < 0.5 else c.lower() for c in name
    )


def gen_spec(rng):
    """Random TableSpec shape; returns (cols, extra_srcs, cap_cols,
    as_of_iso)."""
    n = int(rng.integers(3, 9))
    names = list(rng.choice(NAME_POOL, size=n, replace=False))
    kinds = ["string", "decimal", "double", "timestamp", "date",
             "boolean", "boolean_string", "json"]
    cols = []
    used_src_lower: set[str] = set()
    for name in names:
        kind = str(rng.choice(kinds))
        if kind == "decimal":
            p = int(rng.integers(5, 19))
            s = int(rng.integers(0, min(5, p)))
            ddl = f"decimal({p},{s})"
        elif kind == "double":
            ddl = "double"
        elif kind == "timestamp":
            ddl = "timestamp_ntz"
        elif kind == "date":
            ddl = "date"
        elif kind == "boolean":
            ddl = "boolean"
        else:
            ddl = "string"
        r = rng.random()
        if r < 0.12:
            src, mapped = None, False           # missing -> typed NULL
        elif r < 0.55:
            src = "raw_" + name + "_" + str(int(rng.integers(0, 100)))
            mapped = True                        # renamed via mapping
        else:
            src, mapped = name, False            # same-name passthrough
        if src is not None:
            src = _mangle(rng, src)
            if src.lower() in used_src_lower:    # avoid collisions
                src, mapped = None, False
            else:
                used_src_lower.add(src.lower())
        cols.append(ColSpec(name, kind, ddl, src, mapped))
    # sometimes an ETL_* timestamp column (exercises the as_of fallback)
    if rng.random() < 0.5:
        src = None if rng.random() < 0.5 else _mangle(rng, "ETL_SOURCE_TS")
        if src is not None and src.lower() in used_src_lower:
            src = None
        cols.append(
            ColSpec("ETL_SOURCE_TS", "timestamp", "timestamp_ntz", src,
                    False)
        )
        if src is not None:
            used_src_lower.add(src.lower())
    # adversarial: a mapping whose target ALSO exists as a same-named
    # source column (mapping must win over passthrough)
    shadow = None
    mapped_cols = [c for c in cols if c.mapped]
    if mapped_cols and rng.random() < 0.3:
        victim = mapped_cols[int(rng.integers(0, len(mapped_cols)))]
        if victim.name.lower() not in used_src_lower:
            shadow = victim.name
            used_src_lower.add(shadow.lower())
    # unreferenced extra source columns (dropped by the projection)
    extra_srcs = []
    for i in range(int(rng.integers(0, 3))):
        cand = f"extra_{i}_{int(rng.integers(0, 100))}"
        if cand.lower() not in used_src_lower:
            used_src_lower.add(cand.lower())
            extra_srcs.append(cand)
    if shadow is not None:
        extra_srcs.append(shadow)
    cap_cols = tuple(
        c.name for c in cols
        if c.kind == "timestamp" and rng.random() < 0.35
    )
    as_of = _rand_dt(rng, 2024, 2025).strftime("%Y-%m-%d %H:%M:%S")
    return cols, extra_srcs, cap_cols, as_of


def build_tablespec(cols, cap_cols):
    from pyspark.sql import types as T

    from lcr_etl_upgrade_spark.operators.conform import AUDIT_COLUMNS
    from lcr_etl_upgrade_spark.pipeline import TableSpec

    fields = [
        T.StructField(c.name, _spark_type(c.ddl), True) for c in cols
    ]
    audit_types = {
        "ETL_CREATED_DATE": T.TimestampNTZType(),
        "ETL_LAST_UPDATE_DATE": T.TimestampNTZType(),
        "CREATED_BY": T.StringType(),
        "TO_PROCESS": T.BooleanType(),
        "EDW_EXTERNAL_SOURCE_SYSTEM": T.StringType(),
    }
    fields += [
        T.StructField(a, audit_types[a], False) for a in AUDIT_COLUMNS
    ]
    mapping = {
        c.src: c.name for c in cols if c.src is not None and c.mapped
    }
    return TableSpec(
        name="fuzz",
        mapping=mapping,
        target_schema=T.StructType(fields),
        json_columns={c.name for c in cols if c.kind == "json"},
        boolean_string_columns={
            c.name for c in cols if c.kind == "boolean_string"
        },
        cap_future_columns=cap_cols,
    )


def _spark_type(ddl: str):
    from pyspark.sql import types as T

    if ddl.startswith("decimal"):
        p, s = ddl[8:-1].split(",")
        return T.DecimalType(int(p), int(s))
    return {
        "double": T.DoubleType(),
        "timestamp_ntz": T.TimestampNTZType(),
        "date": T.DateType(),
        "boolean": T.BooleanType(),
        "string": T.StringType(),
    }[ddl]


def make_raw(rng, cols, extra_srcs, rows: int) -> pd.DataFrame:
    data = {}
    for c in cols:
        if c.src is None:
            continue
        data[c.src] = [gen_value(rng, c.kind) for _ in range(rows)]
    for s in extra_srcs:
        data[s] = [gen_value(rng, "string") for _ in range(rows)]
    if not data:  # all-missing spec: one dummy source column
        data["dummy_src"] = [gen_value(rng, "string") for _ in range(rows)]
    return pd.DataFrame(data, dtype=object)


# ------------------------------------------------------------- the oracle

_TRUE = "('true','1','yes','t')"
_FALSE = "('false','0','no','f')"


def _q(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def _scrub(r: str) -> str:
    return f"(length({r}) <= 3 OR NOT regexp_matches({r}, '[0-9]'))"


# Spark's native try_to_timestamp family, restated as a STRICT strptime
# cascade. NOT try_cast: DuckDB's timestamp/date cast additionally
# accepts Y/m/d SLASH dates ('2023/10/02'), which Spark's native parser
# rejects and routes to the NY-localized fuzzy path — a try_cast
# restatement silently swallows those into the wrong branch (found by
# this fuzzer's own first run).
_NATIVE_TS_FMTS = [
    "%Y-%m-%d %H:%M:%S.%g", "%Y-%m-%dT%H:%M:%S.%g",
    "%Y-%m-%d %H:%M:%S%z", "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M", "%Y-%m-%dT%H:%M", "%Y-%m-%d",
]


def _native_ts(r: str) -> str:
    cascade = ", ".join(
        f"try_strptime(trim({r}), '{fmt}')" for fmt in _NATIVE_TS_FMTS
    )
    return f"cast(COALESCE({cascade}) as timestamp)"


def _fuzzy_ts(r: str, as_of: str) -> str:
    cascade = ", ".join(
        f"try_strptime({r}, '{fmt}')" for fmt, _ in FUZZY_FMTS
    )
    ny_utc = (
        f"cast(timezone('America/New_York', COALESCE({cascade})) "
        f"as timestamp)"
    )
    return (
        f"(CASE WHEN {ny_utc} > TIMESTAMP '{as_of}' "
        f"THEN TIMESTAMP '{as_of}' ELSE {ny_utc} END)"
    )


def _fuzzy_date(r: str) -> str:
    cascade = ", ".join(
        f"try_strptime({r}, '{fmt}')" for fmt, _ in FUZZY_FMTS
    )
    return f"cast(COALESCE({cascade}) as date)"


def oracle_sql(cols, cap_cols, as_of: str, raw_cols: list[str],
               fuzzy: bool = True) -> str:
    """DuckDB restatement of conform->cleanse->cap->enrich->project.
    ``fuzzy=False`` restates the native-only mode (transform_table's
    fuzzy flag): the strptime fuzzy cascade drops out entirely, while
    scrub, future caps/nulls and the ETL_* fallback still apply."""
    # conform resolution, re-derived from the documented rules: mapping
    # entries resolve case-insensitively FIRST, then same-name
    # passthrough for still-unmapped targets
    lower_to_actual = {c.lower(): c for c in raw_cols}
    exprs = []
    for c in cols:
        if c.src is not None:
            actual = lower_to_actual.get(c.src.lower())
        else:
            actual = lower_to_actual.get(c.name.lower())
        r = _q(actual) if actual is not None else "CAST(NULL AS VARCHAR)"
        name = _q(c.name)
        if c.kind in ("string", "json"):
            e = r
        elif c.kind == "decimal":
            e = f"try_cast({r} as {c.ddl.replace('decimal', 'DECIMAL')})"
        elif c.kind == "double":
            e = f"try_cast({r} as DOUBLE)"
        elif c.kind == "boolean":
            e = (
                f"(CASE WHEN lower({r}) IN {_TRUE} THEN true "
                f"WHEN lower({r}) IN {_FALSE} THEN false END)"
            )
        elif c.kind == "boolean_string":
            e = (
                f"(CASE WHEN {r} IS NULL THEN NULL "
                f"WHEN lower({r}) IN {_TRUE} THEN 'TRUE' "
                f"WHEN lower({r}) IN {_FALSE} THEN 'FALSE' "
                f"ELSE {r} END)"
            )
        elif c.kind == "timestamp":
            parse = _native_ts(r) if not fuzzy else (
                f"COALESCE({_native_ts(r)}, {_fuzzy_ts(r, as_of)})"
            )
            e = (
                f"(CASE WHEN {r} IS NULL OR {_scrub(r)} THEN NULL "
                f"ELSE {parse} END)"
            )
            if c.name in cap_cols:
                e = (
                    f"(CASE WHEN {e} > TIMESTAMP '{as_of}' "
                    f"THEN TIMESTAMP '{as_of}' ELSE {e} END)"
                )
            if c.name.startswith("ETL_"):
                e = f"COALESCE({e}, TIMESTAMP '{as_of}')"
        elif c.kind == "date":
            dparse = f"cast({_native_ts(r)} as date)" if not fuzzy else (
                f"COALESCE(cast({_native_ts(r)} as date), "
                f"{_fuzzy_date(r)})"
            )
            parsed = (
                f"(CASE WHEN {r} IS NULL OR {_scrub(r)} THEN NULL "
                f"ELSE {dparse} END)"
            )
            e = (
                f"(CASE WHEN {parsed} > DATE '{as_of[:10]}' THEN NULL "
                f"ELSE {parsed} END)"
            )
        else:  # pragma: no cover
            raise AssertionError(c.kind)
        exprs.append(f"{e} AS {name}")
    exprs += [
        f"TIMESTAMP '{as_of}' AS ETL_CREATED_DATE",
        f"TIMESTAMP '{as_of}' AS ETL_LAST_UPDATE_DATE",
        "'ETL_PROCESS' AS CREATED_BY",
        "true AS TO_PROCESS",
        "'LeadCustodyRepository' AS EDW_EXTERNAL_SOURCE_SYSTEM",
    ]
    return "SELECT " + ", ".join(exprs) + " FROM raw"


# ------------------------------------------- F4/C10 standalone operators

RESIDUE_POOL = [
    "2024-01-02 03:04:05", "2024-01-02T03:04:05", "12:30:00",
    "2024-01-02 03:04:05.123", "abc", "1,000", "2024/01/02", "  ",
    "9.9", "2024-05-06", "x2024-01-02", "2024-01-02 03:04:05Z", "-", "",
    "03:04", "garbage 123", "2024.01.02 03.04.05",
]


def gen_residual_case(rng):
    """Random staging frame for scrub_residual_garbage (F4 standalone,
    string-typed staging columns; ETL_* falls back to as_of) composed
    with backfill_modify_date (C10)."""
    n = int(rng.integers(1, 4))
    cols = [f"TS_COL_{i}" for i in range(n)]
    if rng.random() < 0.6:
        cols.append("ETL_STAGE_TS")
    scrub_cols = [c for c in cols if rng.random() < 0.8] or [cols[0]]
    as_of = _rand_dt(rng, 2024, 2025).strftime("%Y-%m-%d %H:%M:%S")
    return cols, scrub_cols, as_of


def make_residual_raw(rng, cols, rows):
    data = {
        c: [
            None if rng.random() < 0.1 else str(rng.choice(RESIDUE_POOL))
            for _ in range(rows)
        ]
        for c in cols
    }
    for c in ("MODIFY_DATE", "CREATE_DATE"):
        data[c] = [
            None if rng.random() < 0.4 else str(rng.choice(RESIDUE_POOL))
            for _ in range(rows)
        ]
    return pd.DataFrame(data, dtype=object)


def residual_oracle_sql(cols, scrub_cols, as_of):
    """DuckDB restatement: strip [0-9\\-:. ] globally (Spark's
    regexp_replace is global by default — DuckDB needs the 'g' flag, a
    trap in itself), non-empty residue -> NULL, ETL_* coalesces to
    as_of rendered as the column's (string) type."""
    exprs = []
    for c in cols + ["MODIFY_DATE", "CREATE_DATE"]:
        q = _q(c)
        if c in scrub_cols:
            e = (
                f"(CASE WHEN regexp_replace({q}, '[0-9\\-:. ]', '', 'g')"
                f" ~ '.+' THEN NULL ELSE {q} END)"
            )
            if c.startswith("ETL_"):
                e = (
                    f"COALESCE({e}, "
                    f"cast(TIMESTAMP '{as_of}' as varchar))"
                )
        else:
            e = q
        exprs.append((c, e))
    rendered = {c: e for c, e in exprs}
    rendered["MODIFY_DATE"] = (
        f"COALESCE({rendered['MODIFY_DATE']}, {rendered['CREATE_DATE']})"
    )
    return "SELECT " + ", ".join(
        f"{e} AS {_q(c)}" for c, e in rendered.items()
    ) + " FROM raw"


def run_residual_case(spark, con, cols, scrub_cols, as_of,
                      pdf) -> dict | None:
    from lcr_etl_upgrade_spark.operators.cleanse import (
        backfill_modify_date,
        scrub_residual_garbage,
    )

    schema = ", ".join(f"`{c}` string" for c in pdf.columns)
    sdf = spark.createDataFrame(pdf, schema)
    try:
        out = backfill_modify_date(
            scrub_residual_garbage(sdf, scrub_cols, as_of=as_of)
        )
        srows = out.collect()
        scols = out.columns
    except Exception as exc:
        return {"side": "spark_error", "err": repr(exc)[:400]}
    con.register("raw", pdf)
    try:
        res = con.execute(residual_oracle_sql(cols, scrub_cols, as_of))
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    except Exception as exc:
        return {"side": "duckdb_error", "err": repr(exc)[:400]}
    s_norm, s_cols = frame_to_rows([tuple(r) for r in srows], scols)
    o_norm, o_cols = frame_to_rows(orows, ocols)
    if [c.lower() for c in s_cols] != [c.lower() for c in o_cols]:
        return {"side": "schema", "spark": s_cols, "duckdb": o_cols}
    if s_norm != o_norm:
        diff_idx = next(
            (i for i, (a, b) in enumerate(zip(s_norm, o_norm)) if a != b),
            min(len(s_norm), len(o_norm)),
        )
        return {
            "side": "values",
            "first_diff": {
                "cols": s_cols,
                "spark": s_norm[diff_idx] if diff_idx < len(s_norm)
                else None,
                "duckdb": o_norm[diff_idx] if diff_idx < len(o_norm)
                else None,
            },
        }
    return None


# --------------------------------------------------------------- the loop


def run_case(spark, con, cols, extra_srcs, cap_cols, as_of,
             pdf, fuzzy: bool = True) -> dict | None:
    from lcr_etl_upgrade_spark.pipeline import transform_table

    spec = build_tablespec(cols, cap_cols)
    schema = ", ".join(f"`{c}` string" for c in pdf.columns)
    sdf = spark.createDataFrame(pdf, schema)
    try:
        out = transform_table(sdf, spec, as_of=as_of, fuzzy=fuzzy)
        srows = out.collect()
        scols = out.columns
    except Exception as exc:
        return {"side": "spark_error", "err": repr(exc)[:400]}
    con.register("raw", pdf)
    try:
        res = con.execute(oracle_sql(cols, cap_cols, as_of,
                                     list(pdf.columns), fuzzy=fuzzy))
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    except Exception as exc:
        return {"side": "duckdb_error", "err": repr(exc)[:400]}
    s_norm, s_cols = frame_to_rows([tuple(r) for r in srows], scols)
    o_norm, o_cols = frame_to_rows(orows, ocols)
    if [c.lower() for c in s_cols] != [c.lower() for c in o_cols]:
        return {"side": "schema", "spark": s_cols, "duckdb": o_cols}
    if s_norm != o_norm:
        diff_idx = next(
            (i for i, (a, b) in enumerate(zip(s_norm, o_norm)) if a != b),
            min(len(s_norm), len(o_norm)),
        )
        return {
            "side": "values",
            "spark_rows": len(s_norm),
            "duckdb_rows": len(o_norm),
            "first_diff": {
                "cols": s_cols,
                "spark": s_norm[diff_idx] if diff_idx < len(s_norm)
                else None,
                "duckdb": o_norm[diff_idx] if diff_idx < len(o_norm)
                else None,
            },
        }
    return None


def minimize(spark, con, cols, extra_srcs, cap_cols, as_of, pdf,
             fuzzy: bool = True):
    """Greedy shrink: fewer target columns, fewer rows — under the SAME
    fuzzy mode the failure occurred in."""

    def fails(cs, frame):
        caps = tuple(c for c in cap_cols if c in {x.name for x in cs})
        return run_case(
            spark, con, cs, extra_srcs, caps, as_of, frame, fuzzy=fuzzy
        ) is not None

    changed = True
    while changed:
        changed = False
        if len(cols) > 1:
            for i in range(len(cols)):
                cand = cols[:i] + cols[i + 1:]
                if fails(cand, pdf):
                    cols = cand
                    changed = True
                    break
        while len(pdf) > 1:
            half = pdf.iloc[: len(pdf) // 2].reset_index(drop=True)
            if fails(cols, half):
                pdf = half
                changed = True
            else:
                other = pdf.iloc[len(pdf) // 2:].reset_index(drop=True)
                if fails(cols, other):
                    pdf = other
                    changed = True
                else:
                    break
    caps = tuple(c for c in cap_cols if c in {x.name for x in cols})
    return cols, caps, pdf


def main() -> int:
    ap = argparse.ArgumentParser(
        description="dirty-value pipeline differential"
    )
    ap.add_argument("--seed", type=int, default=20260815)
    ap.add_argument("--n", type=int, default=120)
    ap.add_argument("--rows", type=int, default=120)
    ap.add_argument("--case", type=int, default=None)
    args = ap.parse_args()

    import duckdb

    from lcr_etl_upgrade_spark.session import get_session

    spark = get_session("pipeline_fuzz")
    con = duckdb.connect()
    con.execute("SET timezone='UTC'")

    failures = []
    for i in range(args.n):
        if args.case is not None and i != args.case:
            continue
        rng = np.random.default_rng(args.seed * 1_000_003 + i)
        if i % 4 == 3:  # F4/C10 standalone-operator family
            rcols, scrub_cols, r_as_of = gen_residual_case(rng)
            rpdf = make_residual_raw(rng, rcols, args.rows)
            rec = run_residual_case(
                spark, con, rcols, scrub_cols, r_as_of, rpdf
            )
            if rec is not None:
                failures.append({
                    "i": i, "family": "residual", **rec,
                    "cols": rcols, "scrub": scrub_cols,
                    "as_of": r_as_of,
                    "rows": rpdf.to_dict("records")[:20],
                })
                print(f"FAIL case {i}: "
                      f"{json.dumps(failures[-1])[:800]}",
                      file=sys.stderr)
            continue
        cols, extra_srcs, cap_cols, as_of = gen_spec(rng)
        pdf = make_raw(rng, cols, extra_srcs, args.rows)
        fuzzy = bool(rng.random() >= 0.25)  # 1 in 4 runs native-only
        rec = run_case(spark, con, cols, extra_srcs, cap_cols, as_of,
                       pdf, fuzzy=fuzzy)
        if args.case is not None:
            print("as_of:", as_of, "cap:", cap_cols)
            print("cols:", [(c.name, c.kind, c.src, c.mapped)
                            for c in cols])
            print("SQL:", oracle_sql(cols, cap_cols, as_of,
                                     list(pdf.columns))[:2000])
        if rec is not None:
            mcols, mcaps, mpdf = minimize(
                spark, con, cols, extra_srcs, cap_cols, as_of, pdf,
                fuzzy=fuzzy,
            )
            failures.append({
                "i": i, **rec,
                "minimized": {
                    "as_of": as_of,
                    "cols": [(c.name, c.kind, c.ddl, c.src, c.mapped)
                             for c in mcols],
                    "cap": list(mcaps),
                    "rows": mpdf.to_dict("records")[:20],
                },
            })
            print(f"FAIL case {i}: {json.dumps(failures[-1])[:800]}",
                  file=sys.stderr)
    print(json.dumps({
        "seed": args.seed, "n": args.n, "rows": args.rows,
        "failures": failures, "ok": not failures,
    }))
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
