"""Property-based tests (hypothesis): tolerant coercions are total
functions with closed output ranges; conformance preserves shape. Each
property evaluates one Spark job over the whole generated batch."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.functions.cleansing import (
    boolean_expr,
    boolean_string_expr,
)
from lcr_etl_upgrade_spark.operators.cleanse import timestamp_expr

text_rows = st.lists(
    st.one_of(st.none(), st.text(max_size=30)), min_size=1, max_size=50
)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(values=text_rows)
@SETTINGS
def test_boolean_expr_total_and_closed(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [r.out for r in df.select(boolean_expr(F.col("v")).alias("out")).collect()]
    assert all(g in (True, False, None) for g in got)
    # token contract: recognized tokens always map, everything else nulls
    for v, g in zip(values, got):
        token = v.strip().lower() if isinstance(v, str) else None
        if token in ("true", "1", "yes", "t"):
            assert g is True or v != v.strip()  # untrimmed stays unrecognized
        elif token in ("false", "0", "no", "f"):
            assert g is False or v != v.strip()


@given(values=text_rows)
@SETTINGS
def test_boolean_string_passthrough_property(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [
        r.out for r in df.select(boolean_string_expr(F.col("v")).alias("out")).collect()
    ]
    for v, g in zip(values, got):
        if v is None:
            assert g is None
        else:
            # output is TRUE/FALSE or the input untouched — never mangled
            assert g in ("TRUE", "FALSE") or g == v


@given(values=text_rows)
@SETTINGS
def test_timestamp_expr_never_throws(spark, values):
    """ANSI mode throws on malformed casts; the cleansing expression must
    stay total over arbitrary junk (fuzzy path included)."""
    df = spark.createDataFrame([(v,) for v in values], "v string")
    out = df.select(timestamp_expr(F.col("v")).alias("out")).collect()
    assert len(out) == len(values)


@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 50)),  # (key, ts)
        min_size=1,
        max_size=20,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 50)),
        min_size=0,
        max_size=20,
    ),
)
@SETTINGS
def test_asof_join_equals_reference_semantics(spark, lefts, rights):
    """asof_join_backward == 'latest right with ts <= left ts per key',
    computed independently in Python, on arbitrary key/ts multisets
    (duplicate timestamps included — ties resolve to max value, matching
    the operator's (ts, value) ordering). A second value column is NULL
    for a deterministic subset of right rows, so the property also pins
    the atomic-row carry: the matched row's NULL must come through, not
    a non-NULL from an older row."""
    from lcr_etl_upgrade_spark.operators.joins import asof_join_backward

    def rval2(k: int, t: int) -> float | None:
        return None if (k + t) % 3 == 0 else float(t)

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lefts)], "pid long, k long, lts long"
    )
    r_schema = "k long, rts long, rval double, rval2 double"
    r_rows = [(k, t, float(t * 10 + k), rval2(k, t)) for k, t in rights]
    right = spark.createDataFrame(r_rows, r_schema)
    got = {
        r.pid: (r.rts, r.rval, r.rval2)
        for r in asof_join_backward(
            left, right, "k", "lts", "rts", ["rval", "rval2"]
        ).collect()
    }
    for i, (k, t) in enumerate(lefts):
        eligible = [(rt, float(rt * 10 + rk)) for rk, rt in rights if rk == k and rt <= t]
        if eligible:
            mrt, mrv = max(eligible)
            expect = (mrt, mrv, rval2(k, mrt))
        else:
            expect = (None, None, None)
        assert got[i] == expect, (i, k, t, got[i], expect)


@given(
    n_cols=st.integers(min_value=1, max_value=5),
    n_missing=st.integers(min_value=0, max_value=3),
)
@SETTINGS
def test_conform_schema_invariant(spark, n_cols, n_missing):
    """conform_columns always yields exactly the target schema, in order,
    regardless of which source columns exist."""
    from lcr_etl_upgrade_spark.operators.conform import conform_columns

    src_cols = [f"c{i}" for i in range(n_cols)]
    df = spark.createDataFrame([tuple("x" for _ in src_cols)], src_cols)
    target = [(f"T{i}", "string") for i in range(n_cols + n_missing)]
    mapping = {f"c{i}": f"T{i}" for i in range(n_cols)}
    out = conform_columns(df, mapping, target)
    assert out.columns == [name for name, _ in target]
    row = out.collect()[0]
    assert all(row[f"T{i}"] == "x" for i in range(n_cols))
    assert all(row[f"T{i}"] is None for i in range(n_cols, n_cols + n_missing))


# --------------------------------------------------------------------------
# Differential scrub fuzz: the lifecycle oracle queries restate the F3
# scrub + native timestamp parse (fuzzy=False) in DuckDB SQL
# (plans/lifecycle.py _PARSE_SQL). That restatement must agree with the
# Spark expression over the WHOLE grammar of dirty strings the queries
# draw from — not just the handful of fixed tokens they happen to emit.
# --------------------------------------------------------------------------

_iso_date = st.builds(
    lambda y, m, d: f"{y:04d}-{m:02d}-{d:02d}",
    st.integers(1970, 2199),
    st.integers(1, 12),
    st.integers(1, 28),
)
_iso_ts = st.builds(
    lambda date, h, mi, s: f"{date} {h:02d}:{mi:02d}:{s:02d}",
    _iso_date,
    st.integers(0, 23),
    st.integers(0, 59),
    st.integers(0, 59),
)
_garbage_alpha = st.text(
    alphabet="abcdefghijXYZ", min_size=1, max_size=3
)  # ^[A-Za-z]{1,3}$ branch
_garbage_short = st.text(max_size=3)  # LENGTH <= 3 branch
_garbage_digitless = st.text(
    alphabet="garbage-/:. N", min_size=4, max_size=12
)  # no-digit branch
_dirty = st.one_of(
    st.none(),
    _iso_date,
    _iso_ts,
    _garbage_alpha,
    _garbage_short,
    _garbage_digitless,
)


_token_casings = st.builds(
    lambda tok, ups: "".join(
        c.upper() if i in ups else c for i, c in enumerate(tok)
    ),
    st.sampled_from(
        ["true", "false", "1", "0", "yes", "no", "t", "f", "maybe", "weird", "x"]
    ),
    st.sets(st.integers(0, 4)),
)
_boolish = st.one_of(
    st.none(), _token_casings, st.text(alphabet=" truefalse01xy", max_size=6)
)


@given(values=st.lists(_boolish, min_size=1, max_size=60))
@SETTINGS
def test_boolean_coercions_match_duckdb_restatement(spark, values):
    """boolean_expr / boolean_string_expr == the oracle queries' CASE
    restatements over arbitrary casings/paddings of the token grammar."""
    import duckdb

    from lcr_etl_upgrade_spark.functions.cleansing import (
        boolean_expr,
        boolean_string_expr,
    )

    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [
        (r.b, r.s)
        for r in df.select(
            boolean_expr(F.col("v")).alias("b"),
            boolean_string_expr(F.col("v")).alias("s"),
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(values)))
    want = con.execute(
        """
        SELECT CASE WHEN LOWER(v) IN ('true','1','yes','t') THEN TRUE
                    WHEN LOWER(v) IN ('false','0','no','f') THEN FALSE
                    ELSE NULL END,
               CASE WHEN v IS NULL THEN NULL
                    WHEN LOWER(v) IN ('true','1','yes','t') THEN 'TRUE'
                    WHEN LOWER(v) IN ('false','0','no','f') THEN 'FALSE'
                    ELSE v END
        FROM t ORDER BY i
        """
    ).fetchall()
    con.close()
    assert got == [tuple(w) for w in want], list(zip(values, got, want))


_numeric_ish = st.one_of(
    st.none(),
    st.builds(
        lambda units, digits: str(units / (10**digits)),
        st.integers(-(10**9), 10**9),
        st.integers(0, 6),
    ),
    st.sampled_from(["NaNope", "garbage", "--", "", "12.34.56", "1 2"]),
)


@given(values=st.lists(_numeric_ish, min_size=1, max_size=60))
@SETTINGS
def test_double_coercion_matches_duckdb_restatement(spark, values):
    """try_cast-to-double (C5) == DuckDB TRY_CAST(v AS DOUBLE) over plain
    decimal strings and the garbage classes the queries synthesize."""
    import duckdb

    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [
        r.d for r in df.select(F.col("v").try_cast("double").alias("d")).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(values)))
    want = [
        r[0]
        for r in con.execute(
            "SELECT TRY_CAST(v AS DOUBLE) FROM t ORDER BY i"
        ).fetchall()
    ]
    con.close()
    assert got == want, list(zip(values, got, want))


@given(values=st.lists(_dirty, min_size=1, max_size=50))
@SETTINGS
def test_scrub_parse_matches_duckdb_restatement(spark, values):
    """Spark scrub+try_to_timestamp == DuckDB's _PARSE_SQL over the dirty
    grammar (valid ISO date/ts + every garbage branch + NULL)."""
    import duckdb

    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [
        r.out
        for r in df.select(
            timestamp_expr(F.col("v"), fuzzy=False).cast("string").alias("out")
        ).collect()
    ]
    from lcr_etl_upgrade_spark.plans.lifecycle import _SCRUB_SQL

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, v VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(values))
    )
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {_SCRUB_SQL.format(v='v')} FROM t ORDER BY i"
        ).fetchall()
    ]
    con.close()
    assert got == want, list(zip(values, got, want))


# --------------------------------------------------------------------------
# Fixed-point dsum/davg: the determinism contract behind every hash-matched
# double aggregate (functions/numeric.py).
# --------------------------------------------------------------------------

# Decimal-valued doubles (<= 6 fractional digits) — the shape real
# money/quantity data has. The rint-based quantization agrees with
# DuckDB's cast PER-ROW across the whole |x| < 1e12 domain (both round
# the double product nearest-even; swept 0/20000 in every band), but
# the FINAL decimal->double cast diverges once the scaled SUM exceeds
# 2^53 (DuckDB's hugeint->double conversion is not correctly rounded) —
# so the bit-match strategy bounds values to 1e8 and the list to 60
# rows, keeping every reachable sum inside the provable zone. Gate data
# (sf0.01) peaks near 2.3e9 total, an order of magnitude inside it.
decimal_valued = st.integers(0, 6).flatmap(
    lambda d: st.integers(-(10 ** (8 + d)), 10 ** (8 + d)).map(
        lambda u, d=d: u / (10.0**d)
    )
)


@given(
    values=st.lists(decimal_valued, min_size=1, max_size=60),
    parts=st.integers(1, 9),
)
@SETTINGS
def test_dsum_davg_bitmatch_duckdb_on_decimal_data(spark, values, parts):
    """dsum/davg == DuckDB's CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)
    bit-for-bit on decimal-valued data, regardless of partitioning."""
    import duckdb

    from lcr_etl_upgrade_spark.functions.numeric import davg, dsum

    df = spark.createDataFrame([(v,) for v in values], "x double").repartition(
        parts
    )
    got = df.select(dsum("x", "s"), davg("x", "a")).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    want_s, want_a = con.execute(
        "SELECT CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE),"
        "       CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(x)"
        " FROM t"
    ).fetchone()
    con.close()
    assert got.s == want_s, (values, got.s, want_s)
    assert got.a == want_a, (values, got.a, want_a)


def test_dsum_large_magnitude_cancellation_matches_duckdb(spark):
    """Above 2^52/1e6 the scaled product loses sub-ulp information — in
    BOTH engines, identically, because DuckDB's double->decimal cast is
    product-based too. The adversarial cancelling pair at the 1e12 edge
    (products collapse to the same double) must yield what DuckDB
    actually computes (0.0) — NOT the 0.1 of Spark's repr-based decimal
    cast, nor the ~0.122 of infinite-precision decimal arithmetic."""
    import duckdb

    from lcr_etl_upgrade_spark.functions.numeric import dsum

    values = [999999999999.0001, -999999999999.0] * 1000
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = df.repartition(9).select(dsum("x", "s")).collect()[0].s
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    want = con.execute(
        "SELECT CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) FROM t"
    ).fetchone()[0]
    con.close()
    assert want == 0.0  # pin the oracle engine's product-based semantics
    assert got == want


@given(
    values=st.lists(
        st.one_of(
            st.floats(allow_nan=True, allow_infinity=True),
            decimal_valued,
        ),
        min_size=1,
        max_size=60,
    ),
    parts=st.integers(1, 8),
)
@SETTINGS
def test_dsum_partition_insensitive_and_total(spark, values, parts):
    """Over ARBITRARY doubles (NaN/inf/huge included) dsum never throws,
    and the result is bit-identical for every partitioning/row order —
    the property AQE re-planning relies on."""
    from lcr_etl_upgrade_spark.functions.numeric import dsum

    df1 = spark.createDataFrame([(v,) for v in values], "x double")
    shuffled = list(values)[::-1]
    df2 = spark.createDataFrame(
        [(v,) for v in shuffled], "x double"
    ).repartition(parts)
    s1 = df1.coalesce(1).select(dsum("x", "s")).collect()[0].s
    s2 = df2.select(dsum("x", "s")).collect()[0].s
    assert s1 == s2, (values, s1, s2)
    # totality: NaN/inf/|x|>=1e12 drop out as NULL; all such -> NULL result
    finite = [v for v in values if v == v and abs(v) < 1e12]
    if not finite:
        assert s1 is None


# --------------------------------------------------------------------------
# Codec properties: encode->decode is the identity; arbitrary bytes either
# decode or raise ValueError — never any other exception (driver-side pure
# functions, no Spark job needed).
# --------------------------------------------------------------------------


@given(
    w=st.integers(1, 8),
    h=st.integers(1, 8),
    data=st.data(),
)
@SETTINGS
def test_ppm_roundtrip_property(w, h, data):
    from lcr_etl_upgrade_spark.operators.multimodal import decode_ppm, encode_ppm

    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    img = decode_ppm(encode_ppm(w, h, px))
    assert (img["width"], img["height"], img["pixels"]) == (w, h, px)


@given(
    rate=st.integers(1, 192_000),
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=64),
)
@SETTINGS
def test_wav_roundtrip_property(rate, samples):
    from lcr_etl_upgrade_spark.operators.multimodal import (
        decode_wav,
        encode_wav_pcm16,
    )

    wav = decode_wav(encode_wav_pcm16(rate, samples))
    assert wav["sample_rate"] == rate
    assert list(wav["samples"]) == samples


@given(payload=st.binary(max_size=200))
@SETTINGS
def test_decoders_total_over_junk(payload):
    """Random bytes (including ones that start with valid magics) must
    either decode or raise ValueError — any other exception would become
    a task failure in the mapInPandas path."""
    from lcr_etl_upgrade_spark.operators.multimodal import (
        _media_features_one,
        decode_ppm,
        decode_wav,
    )

    for dec, prefix in ((decode_ppm, b"P6"), (decode_wav, b"RIFF")):
        for p in (payload, prefix + payload):
            try:
                dec(p)
            except ValueError:
                pass
    # and the feature extractor is total outright
    feats = _media_features_one(payload)
    assert set(feats) >= {"kind", "vmin", "vmax", "rms"}


# --------------------------------------------------------------------------
# C3 date coercion: date_expr == an independent Python restatement of the
# branch order (scrub -> Spark-native cast -> strict dateutil fallback with
# future->NULL) over a structured grammar crossing the as_of boundary.
# Native-branch parses keep futures (the asymmetry the reference bakes in:
# its future->NULL lives only in the UDF fallback, ingest.py:437-441).
# --------------------------------------------------------------------------
_DATE_AS_OF = "2026-08-13"


def _model_date_expr(v, as_of):
    """Pure-Python restatement of date_expr(fuzzy=True, as_of=...)."""
    import datetime as dt
    import re

    import dateutil.parser as du

    if v is None:
        return None
    # scrub_expr: invalid-timestamp predicate nulls the value outright
    if re.fullmatch(r"[A-Za-z]{1,3}", v) or len(v) <= 3 or not re.search(r"\d", v):
        return None
    fmt, y, m, d = v.__grammar__  # attached by the strategy wrapper below
    if fmt in ("iso", "iso_pad", "iso_ts", "year"):  # Spark-native formats
        return dt.date(y, 1, 1) if fmt == "year" else dt.date(y, m, d)
    if fmt == "garbage":
        return None
    # fuzzy branch: strict dateutil parse, future -> NULL
    try:
        parsed = du.parse(v, fuzzy=False).date()
    except (ValueError, OverflowError, TypeError):
        return None
    if parsed > dt.date.fromisoformat(as_of):
        return None
    return parsed


class _GStr(str):
    """str carrying its generation recipe for the model."""


def _make_date_str(fmt, y, m, d):
    s = {
        "iso": f"{y:04d}-{m:02d}-{d:02d}",
        "iso_pad": f" {y:04d}-{m:02d}-{d:02d} ",
        "iso_ts": f"{y:04d}-{m:02d}-{d:02d} 07:05:06",
        "year": f"{y:04d}",
        "slash_us": f"{m:02d}/{d:02d}/{y:04d}",
        "slash_iso": f"{y:04d}/{m:02d}/{d:02d}",
        "month_name": f"{['Jan','Feb','Mar','Apr','May','Jun','Jul','Aug','Sep','Oct','Nov','Dec'][m-1]} {d:02d}, {y:04d}",
        "garbage": "12ab34xz",
    }[fmt]
    out = _GStr(s)
    out.__grammar__ = (fmt, y, m, d)
    return out


_date_strs = st.builds(
    _make_date_str,
    st.sampled_from(
        ["iso", "iso_pad", "iso_ts", "year", "slash_us", "slash_iso", "month_name", "garbage"]
    ),
    st.integers(1900, 2199),  # crosses the 2026 as_of boundary both ways
    st.integers(1, 12),
    st.integers(1, 28),
)


@given(values=st.lists(st.one_of(st.none(), _date_strs), min_size=1, max_size=40))
@SETTINGS
def test_date_expr_matches_python_restatement(spark, values):
    from lcr_etl_upgrade_spark.operators.cleanse import date_expr

    df = spark.createDataFrame([(str(v) if v is not None else None,) for v in values], "v string")
    got = [
        r.d
        for r in df.select(
            date_expr(F.col("v"), fuzzy=True, as_of=_DATE_AS_OF).alias("d")
        ).collect()
    ]
    want = [_model_date_expr(v, _DATE_AS_OF) for v in values]
    assert got == want, list(zip(values, got, want))


# --------------------------------------------------------------------------
# §2.10 incremental cycle: exactly-once append under adversarial boundary
# ties and NULL-key rows. Rows arrive in watermark order (ties allowed to
# SPAN batch boundaries — the boundary-key seam), some with NULL
# MODIFY_DATE (C10 backfill from CREATE_DATE), some with a NULL merge key
# (the advisor-flagged three-valued-logic seam: such rows must re-select,
# never drop).
# --------------------------------------------------------------------------
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 7),  # timestamp grid index
            st.booleans(),      # NULL MODIFY_DATE -> backfill from CREATE_DATE
            st.booleans(),      # NULL merge key
        ),
        min_size=1,
        max_size=24,
    ),
    n_batches=st.integers(1, 4),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_incremental_cycles_exactly_once_append(spark, rows, n_batches, tmp_path_factory):
    import datetime as dt

    from lcr_etl_upgrade_spark.operators.incremental import (
        WatermarkStore,
        run_incremental,
    )

    grid = [dt.datetime(2024, 6, 1) + dt.timedelta(hours=i) for i in range(8)]
    # arrival in watermark order; ties may span batch boundaries
    ordered = sorted(enumerate(rows), key=lambda kv: kv[1][0])
    data = [
        (
            rid,
            None if null_key else str(rid),
            None if null_mod else grid[ts],
            grid[ts],  # CREATE_DATE == the effective instant (backfill target)
        )
        for rid, (ts, null_mod, null_key) in ordered
    ]
    chunk = max(1, -(-len(data) // n_batches))
    store = WatermarkStore(str(tmp_path_factory.mktemp("wm")))
    written: list = []
    sink = lambda d: written.extend(d.collect())  # noqa: E731

    seen = 0
    while seen < len(data):
        seen = min(len(data), seen + chunk)
        src = spark.createDataFrame(
            data[:seen],
            "rid long, k string, MODIFY_DATE timestamp_ntz, CREATE_DATE timestamp_ntz",
        )
        run_incremental(spark, src, "t", store, sink, key_col="k")

    got = sorted(r.rid for r in written)
    all_ids = sorted(d[0] for d in data)
    # nothing lost — a NULL-key row dropped by three-valued logic fails here
    assert set(got) == set(all_ids)
    # duplicates can only be NULL-key rows re-selected at a watermark instant
    from collections import Counter

    dup_ids = [rid for rid, n in Counter(got).items() if n > 1]
    keyed = {d[0] for d in data if d[1] is not None}
    assert not (set(dup_ids) & keyed), (dup_ids, data)
    # and with every key present, the cycle is exactly-once end to end
    if not dup_ids and all(d[1] is not None for d in data):
        assert got == all_ids


# --------------------------------------------------------------------------
# C2 timestamp coercion: timestamp_expr == an independent Python
# restatement of the branch order (scrub -> try_to_timestamp -> dateutil
# strict-then-fuzzy with NY localization + future clamp) over a grammar
# whose native-vs-fuzzy branch is unambiguous. Natively-parsed futures
# stay unclamped (the C2/F5 split); fuzzy parses clamp to as_of — the
# asymmetry is asserted end to end, not just in goldens.
# --------------------------------------------------------------------------
_TS_AS_OF = "2026-08-13T00:00:00"


def _model_timestamp_expr(v, as_of_iso):
    """Pure-Python restatement of timestamp_expr(fuzzy=True, as_of=...)."""
    import datetime as dt
    import re
    from zoneinfo import ZoneInfo

    import dateutil.parser as du

    if v is None:
        return None
    if re.fullmatch(r"[A-Za-z]{1,3}", v) or len(v) <= 3 or not re.search(r"\d", v):
        return None  # scrub_expr
    fmt, y, m, d, hh, mm, ss = v.__grammar__
    if fmt in ("iso_ts", "iso_t"):  # Spark-native; NO clamp (C2/F5 split)
        return dt.datetime(y, m, d, hh, mm, ss)
    if fmt == "iso_date":
        return dt.datetime(y, m, d)
    # fuzzy branch: strict then fuzzy, NY-localize naive, UTC, clamp.
    # Garbage falls through too: dateutil's fuzzy retry day-extracts
    # digit-bearing junk ('12ab34xz' -> today's date with day=12), so the
    # model must run the same branch, not assume NULL.
    for fz in (False, True):
        try:
            parsed = du.parse(v, fuzzy=fz)
        except (ValueError, OverflowError, TypeError):
            continue
        if parsed.tzinfo is None:
            parsed = parsed.replace(tzinfo=ZoneInfo("America/New_York"))
        parsed = parsed.astimezone(dt.timezone.utc).replace(tzinfo=None)
        as_of = dt.datetime.fromisoformat(as_of_iso)
        return min(parsed, as_of)
    return None


def _make_ts_str(fmt, y, m, d, hh, mm, ss):
    iso = f"{y:04d}-{m:02d}-{d:02d}"
    s = {
        "iso_ts": f"{iso} {hh:02d}:{mm:02d}:{ss:02d}",
        "iso_t": f"{iso}T{hh:02d}:{mm:02d}:{ss:02d}",
        "iso_date": iso,
        "slash_us": f"{m:02d}/{d:02d}/{y:04d} {hh:02d}:{mm:02d}:{ss:02d}",
        "month_name": f"{['Jan','Feb','Mar','Apr','May','Jun','Jul','Aug','Sep','Oct','Nov','Dec'][m-1]} {d:02d}, {y:04d} {hh:02d}:{mm:02d}:{ss:02d}",
        "fuzzy_only": f"seen {iso} {hh:02d}:{mm:02d}:{ss:02d} ok",
        "garbage": "12ab34xz",  # fuzzy-extractable: day=12 anchored to today
        "garbage_hard": "9x9x9x9x",  # fails strict AND fuzzy -> NULL
    }[fmt]
    out = _GStr(s)
    out.__grammar__ = (fmt, y, m, d, hh, mm, ss)
    return out


_ts_strs = st.builds(
    _make_ts_str,
    st.sampled_from(
        ["iso_ts", "iso_t", "iso_date", "slash_us", "month_name", "fuzzy_only", "garbage", "garbage_hard"]
    ),
    st.integers(1900, 2199),  # crosses the 2026 as_of boundary both ways
    st.integers(1, 12),
    st.integers(1, 28),
    st.integers(0, 23),  # includes NY DST spring-forward gap hours
    st.integers(0, 59),
    st.integers(0, 59),
)


@given(values=st.lists(st.one_of(st.none(), _ts_strs), min_size=1, max_size=40))
@SETTINGS
def test_timestamp_expr_matches_python_restatement(spark, values):
    df = spark.createDataFrame(
        [(str(v) if v is not None else None,) for v in values], "v string"
    )
    got = [
        r.t
        for r in df.select(
            timestamp_expr(F.col("v"), fuzzy=True, as_of=_TS_AS_OF).alias("t")
        ).collect()
    ]
    want = [_model_timestamp_expr(v, _TS_AS_OF) for v in values]
    assert got == want, list(zip(values, got, want))


# --------------------------------------------------------------------------
# L2 exact Jaccard: jaccard_pairs over the hashed-shingle fast path equals
# brute-force Python shingle-set Jaccard on arbitrary tiny corpora.
# Adversarial coverage for the map-side array-expression shingling:
# boundary cases are docs with < n tokens (no shingles -> pair dropped),
# identical docs (jaccard 1.0), and duplicate shingles (multiset -> set).
# --------------------------------------------------------------------------
_JWORDS = ["aa", "bb", "cc", "dd"]


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_JWORDS), max_size=8), min_size=2, max_size=5
    )
)
@SETTINGS
def test_jaccard_pairs_match_bruteforce(spark, docs):
    from lcr_etl_upgrade_spark.operators.dedup import jaccard_pairs

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id long, text string"
    )
    cand = spark.createDataFrame(
        [(a, b) for a in range(len(docs)) for b in range(a + 1, len(docs))],
        "doc_a long, doc_b long",
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(df, "doc_id", "text", cand, shingle_n=2).collect()
    }
    sets = {
        i: {tuple(ws[j : j + 2]) for j in range(len(ws) - 1)}
        for i, ws in enumerate(docs)
    }
    want = {
        # shingle-less docs (short/empty text) score 0.0 against
        # everything — every REQUESTED pair comes back (round-5 fix: the
        # old inner-join formulation silently dropped such pairs)
        (a, b): (
            len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            if sets[a] | sets[b]
            else 0.0
        )
        for a in range(len(docs))
        for b in range(a + 1, len(docs))
    }
    assert got == want, docs


# --------------------------------------------------------------------------
# Merge composition over ARBITRARY batch sequences — the single-shot oracle
# queries can't see multi-application invariants (exactly the class the
# incremental-cycle property caught a real bug in).
# --------------------------------------------------------------------------
_batches = st.lists(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 99)), max_size=4
    ).map(lambda kvs: list({k: (k, v) for k, v in kvs}.values())),
    min_size=1,
    max_size=4,
)


@given(batches=_batches)
@SETTINGS
def test_upsert_composition_is_last_write_wins(spark, batches):
    from lcr_etl_upgrade_spark.operators.merge import upsert

    cur = spark.createDataFrame([], "k long, v long")
    model: dict[int, int] = {}
    for batch in batches:
        if not batch:
            continue
        cur = upsert(cur, spark.createDataFrame(batch, "k long, v long"), ["k"])
        model.update(dict(batch))
    assert {(r.k, r.v) for r in cur.collect()} == set(model.items())


@given(batches=_batches)
@SETTINGS
def test_scd2_multi_batch_invariants(spark, batches):
    """After any sequence of (key-deduped) update batches: one current
    open-ended version per live key, validity intervals chain exactly
    (VALID_TO[i] == VALID_FROM[i+1]), version counts equal per-key batch
    appearances, and the current value is the latest batch's."""
    import datetime as dt
    from collections import defaultdict

    from lcr_etl_upgrade_spark.operators.merge import scd2_apply

    dim = spark.createDataFrame(
        [],
        "k long, v long, VALID_FROM timestamp_ntz, "
        "VALID_TO timestamp_ntz, IS_CURRENT boolean",
    )
    instants = []
    for i, batch in enumerate(batches):
        if not batch:
            continue
        as_of = f"2024-01-{i + 1:02d} 00:00:00"
        instants.append((dt.datetime(2024, 1, i + 1), batch))
        dim = scd2_apply(
            dim, spark.createDataFrame(batch, "k long, v long"), ["k"], as_of
        )

    by_key = defaultdict(list)
    for r in dim.collect():
        by_key[r.k].append(r)
    want_versions: dict[int, list] = defaultdict(list)
    for ts, batch in instants:
        for k, v in batch:
            want_versions[k].append((ts, v))

    assert set(by_key) == set(want_versions)
    for k, rows in by_key.items():
        rows.sort(key=lambda r: r.VALID_FROM)
        assert [(r.VALID_FROM, r.v) for r in rows] == want_versions[k]
        *closed, current = rows
        assert current.IS_CURRENT and current.VALID_TO is None
        for prev, nxt in zip(rows, rows[1:]):
            assert not prev.IS_CURRENT
            assert prev.VALID_TO == nxt.VALID_FROM


# --------------------------------------------------------------------------
# Sessionization vs an independent Python fold, on arbitrary event sets
# INCLUDING duplicate (user, ts) rows — the tie class whose session
# assignment silently depended on frame order before the event_id
# tiebreaker was added to the running-sum window.
# --------------------------------------------------------------------------
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 2),  # user
            st.integers(0, 120),  # minutes offset (gap = 30 min)
            st.integers(0, 50),  # integer-valued amount (exact as double)
        ),
        min_size=1,
        max_size=25,
    )
)
@SETTINGS
def test_sessionize_matches_python_fold(spark, events):
    import datetime as dt
    from collections import defaultdict

    from lcr_etl_upgrade_spark.plans.events import sessionize

    base = dt.datetime(2024, 6, 1)
    rows = [
        (i, u, base + dt.timedelta(minutes=m), float(v))
        for i, (u, m, v) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, value double"
    )
    got = {
        (r.user_id, r.session_id): (
            r.n_events,
            r.session_start,
            r.session_end,
            r.session_value,
        )
        for r in sessionize(df).collect()
    }

    per_user = defaultdict(list)
    for eid, u, ts, v in rows:
        per_user[u].append((ts, eid, v))
    want = {}
    for u, evs in per_user.items():
        evs.sort()
        sid, prev = 0, None
        sessions = defaultdict(list)
        for ts, _eid, v in evs:
            if prev is None or (ts - prev).total_seconds() > 1800:
                sid += 1
            prev = ts
            sessions[sid].append((ts, v))
        for sid, members in sessions.items():
            want[(u, sid)] = (
                len(members),
                str(min(t for t, _ in members)),
                str(max(t for t, _ in members)),
                sum(v for _, v in members),
            )
    assert got == want, (events, got, want)


# --------------------------------------------------------------------------
# Two INDEPENDENT sessionization formulations — F.session_window (the
# streaming-unified operator) and the lag/cumsum batch plan — must carve
# identical sessions on arbitrary event sets (duplicate timestamps and
# exact 30-minute boundary gaps included).
# --------------------------------------------------------------------------
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 2),  # user
            st.integers(0, 120),  # minutes offset
            st.integers(0, 50),  # integer-valued amount
        ),
        min_size=1,
        max_size=25,
    )
)
@SETTINGS
def test_session_window_equals_lag_cumsum_formulation(spark, events):
    import datetime as dt

    from lcr_etl_upgrade_spark.plans.events import sessionize
    from lcr_etl_upgrade_spark.streaming.windows import sessionized_stream

    base = dt.datetime(2024, 6, 1)
    rows = [
        (i, u, base + dt.timedelta(minutes=m), float(v))
        for i, (u, m, v) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    via_window = {
        (r.user_id, str(r.session_start), r.n_events, r.session_value)
        for r in sessionized_stream(df, gap="30 minutes").collect()
    }
    via_cumsum = {
        (r.user_id, r.session_start, r.n_events, r.session_value)
        for r in sessionize(df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))).collect()
    }
    assert via_window == via_cumsum, events


def test_dsum_tie_rounding_matches_duckdb_cast(spark):
    """Round-9 fuzzer find: odd/2^k doubles (the only binary-exact
    values whose 6-dp expansion ends in ...5) quantize to an EXACT
    half-unit tie, where DuckDB's double->decimal cast rounds AWAY from
    zero and Java's rint rounds half-to-even. dsum/davg must follow the
    oracle spelling. 1/128 -> 0.007813 (not ...12), -1/128 -> -0.007813."""
    import duckdb

    from lcr_etl_upgrade_spark.functions.numeric import davg, dsum

    vals = [1.0 / 128, -1.0 / 128, 3.0 / 128, -3.0 / 128, 5.0 / 512,
            -20.0 / 512, 1.25, -1.25]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got_sum = df.agg(dsum("x", "s")).collect()[0].s
    got_avg = df.agg(davg("x", "a")).collect()[0].a
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"(CAST({v!r} AS DOUBLE))" for v in vals)
        + ") v(x)"
    )
    want_sum, want_avg = con.execute(
        "SELECT CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE), "
        "CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(x) FROM t"
    ).fetchone()
    assert got_sum == want_sum
    assert got_avg == want_avg
    # and the tie itself went AWAY from zero
    one = spark.createDataFrame([(1.0 / 128,)], "x double")
    assert one.agg(dsum("x", "s")).collect()[0].s == 0.007813
