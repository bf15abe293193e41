"""Deterministic numeric aggregation helpers.

Floating-point SUM/AVG depend on accumulation order, which differs between
engines (and between runs under AQE). For oracle-comparable results we
quantize each double to its 6-decimal fixed-point value and sum exactly:

    quantize(x) = rint(x * 1e6)  (IEEE round-to-nearest-even) as long
    SUM(quantize(x)) exactly -> / 1e6 -> double

This matches what the oracle engine computes for the oracle spelling::

    CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)

because DuckDB's double->decimal cast rounds the double product
x * 10^scale under the default FP rounding mode (nearest-even) — exactly
what ``Math.rint`` computes. Measured agreement (the sweep lives in git
history and tests/test_properties.py pins the fixtures): 0/20000 per-row
divergence vs DuckDB on uniform doubles at every magnitude (1e2, 1e8,
1e10, 9.9e11) AND on <=6-decimal-digit data across its whole domain.
Two formulations this replaced were both measurably worse:
``floor(|x|*1e6+0.5)`` (round-half-away on the product) diverged on
ties the product grid creates — 107/20000 on 6-decimal data near 4.4e9,
the whole odd-integer-product band [2^52, 2^53) — and Spark's own
BigDecimal cast (the original per-row formulation) rounds the SHORTEST
DECIMAL REPR instead of the product, diverging in yet other tails (and
costing 3.3x in allocation).

Two residual divergence regimes remain, both unreachable by gate data:
adversarially-engineered doubles whose product lands exactly on a .5
tie at small magnitude (DuckDB rounds some of those away from zero);
and group sums beyond |2^53/1e6| ~ 9e9, where the FINAL cast differs —
Spark correctly-rounds the exact decimal sum while DuckDB converts its
hugeint accumulator to double and divides, which is not correctly
rounded (verified: scaled sum -57636154160389900 resolves to different
doubles). Gate sums at sf0.01 peak near 2.3e9.

Implementation details: the quantized long casts to compact decimal(28,0)
(still long-backed per value — Spark's Decimal stays compact below 1e18
regardless of declared precision), giving the SUM a decimal(38,0)
accumulator: overflow (-> NULL under non-ANSI semantics) only beyond a
~1e32 value-sum, the same headroom as the oracle's DECIMAL(38,6)
accumulator (which errors there). Measured 2.29s -> 0.66s on the sf0.1
Q1 aggregate vs the original cast-per-row formulation.

Domain: |x| < 1e12 (the bound the original decimal(18,6) cast imposed);
NaN, +-inf and out-of-range values quantize to NULL and drop out of both
the sum and - via the matching count filter in davg - the average's
denominator, mirroring an AVG(TRY_CAST(..)) oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALE = 1_000_000
_LIMIT = 1e12  # decimal(18,6) range — values beyond were NULL before too


def _quantized_sql(c: str) -> str:
    """SQL-text twin of _quantized over an expression STRING: the same
    guard/signum/floor composition parsed in one py4j round-trip instead
    of ~15 stacked-Column calls (r13 driver-overhead rule — the d-agg
    helpers appear up to 8x per query). Literals are spelled to parse at
    the Column types: 1e6/1e12 are DOUBLE in Spark SQL (a bare 1000000.0
    would be DECIMAL), 0.5D forces the double addend. Value-equivalence
    is pinned by tests/test_numeric_sql_equiv.py and every d-agg oracle
    row."""
    guard = f"(NOT isnan({c})) AND (abs({c}) < 1e12)"
    away = f"signum({c}) * floor(abs({c}) * 1e6 + 0.5D)"
    return (
        f"CAST(CAST(CASE WHEN {guard} THEN {away} END AS BIGINT)"
        f" AS DECIMAL(28,0))"
    )


def _exact_sum_sql(c: str) -> str:
    """SQL-text twin of _exact_sum (see _quantized_sql)."""
    return (
        f"CAST(sum({_quantized_sql(c)}) AS DECIMAL(38,6))"
        f" / CAST({_SCALE} AS DECIMAL(18,0))"
    )


def _csql(col: str) -> str:
    """String input -> SQL text. A plain identifier is backtick-quoted
    (preserving the old F.col(name) semantics even for reserved words);
    anything else is passed through as trusted SQL expression text —
    which lets callers hand product expressions to the d-aggs without
    paying Column-tree construction."""
    import re

    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", col):
        return f"`{col}`"
    return col


def _quantized(c: Column) -> Column:
    """round-half-AWAY-FROM-ZERO(x * 1e6) as a compact decimal(28,0);
    NULL outside the domain (NaN/±inf/|x| >= 1e12).

    Tie semantics matter (round-9 fuzzer find): DuckDB's double->decimal
    cast — the oracle spelling's per-row rounding — sends an EXACT
    half-unit tie AWAY from zero (1/128 -> 0.007813), where Java's rint
    rounds half-to-even (7812.5 -> 7812). Exact ties are reachable only
    from odd/2^k doubles (the only binary-representable values whose
    6-dp expansion ends in ...5), so the r8 random sweep never hit one;
    ``signum(x) * floor(|x|*1e6 + 0.5)`` reproduces the away-from-zero
    tie and agrees with rint everywhere off the tie, in three codegen
    intrinsics (no BigDecimal on the hot path).

    The domain guard wraps the WHOLE product, not each factor: the r13
    plan audit showed the older per-factor spelling evaluating the
    isnan/abs/limit CASE twice per row (once under signum, once under
    floor) — one guard halves the branch work and shrinks the generated
    code, with identical values and identical NULL domain (signum(c) *
    floor(...) is non-NULL exactly when c is, and the guard handles the
    rest)."""
    away = F.when(
        (~F.isnan(c)) & (F.abs(c) < F.lit(_LIMIT)),
        F.signum(c) * F.floor(F.abs(c) * F.lit(float(_SCALE)) + F.lit(0.5)),
    )
    return away.cast("long").cast("decimal(28,0)")


def _exact_sum(c: Column) -> Column:
    """Exact fixed-point SUM as decimal(38,6), NULL for all-NULL groups."""
    return F.sum(_quantized(c)).cast("decimal(38,6)") / F.lit(_SCALE).cast(
        "decimal(18,0)"
    )


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-insensitive exact SUM of a double column, returned as double
    (the exact decimal sum, correctly rounded)."""
    if isinstance(col, str):
        out = F.expr(f"CAST({_exact_sum_sql(_csql(col))} AS DOUBLE)")
    else:
        out = _exact_sum(col).cast("double")
    return out.alias(alias) if alias else out


def dsum_over(
    col: Column | str, window, alias: str | None = None
) -> Column:
    """dsum's WINDOWED form: exact fixed-point SUM over a window frame,
    matching the oracle spelling ``CAST(SUM(CAST(x AS DECIMAL(38,6)))
    OVER w AS DOUBLE)`` (same quantize-vs-decimal-cast equivalence as
    dsum)."""
    q = (
        F.expr(_quantized_sql(_csql(col)))
        if isinstance(col, str)
        else _quantized(col)
    )
    out = (
        (
            F.sum(q).over(window).cast("decimal(38,6)")
            / F.lit(_SCALE).cast("decimal(18,0)")
        ).cast("double")
    )
    return out.alias(alias) if alias else out


def dquantize(col: Column | str, alias: str | None = None) -> Column:
    """Per-ROW scalar quantize (the dsum input form) as decimal(28,0).

    ``dsum(c)`` ≡ ``dsum_final(dquantize(c))``. Pre-projecting the
    quantized value matters under multi-projection plans: ROLLUP/CUBE/
    GROUPING SETS expand every input row N ways (Expand), and an
    aggregate child expression is evaluated per EXPANDED row — rollup
    over 2 columns runs the quantize chain 3x per input row, cube 4x.
    Quantizing in a projection before the expand runs it once and lets
    Expand copy a long-backed decimal (r13 guide §2.3 "shuffle fewer
    bytes / don't recompute": measured on agg_rollup at sf0.1,
    exec 0.54 s -> 0.4x s)."""
    out = (
        F.expr(_quantized_sql(_csql(col)))
        if isinstance(col, str)
        else _quantized(col)
    )
    return out.alias(alias) if alias else out


def dsum_partial(col: Column | str, alias: str | None = None) -> Column:
    """Map-side half of a TWO-STAGE dsum (e.g. salted aggregation): the
    exact quantized partial sum, still in fixed-point. Finalize with
    ``dsum_final`` over the partial column."""
    if isinstance(col, str):
        out = F.expr(f"sum({_quantized_sql(_csql(col))})")
    else:
        out = F.sum(_quantized(col))
    return out.alias(alias) if alias else out


def descale(col: Column | str, alias: str | None = None) -> Column:
    """Per-ROW descale of a dsum_partial value (or any expression built
    from summing partials, e.g. a window total over an aggregated
    relation) back to the exact double: the non-aggregate counterpart
    of dsum_final."""
    c = F.col(col) if isinstance(col, str) else col
    out = (
        c.cast("decimal(38,6)") / F.lit(_SCALE).cast("decimal(18,0)")
    ).cast("double")
    return out.alias(alias) if alias else out


def dsum_final(col: Column | str, alias: str | None = None) -> Column:
    """Reduce-side half of a two-stage dsum: sum the partials exactly
    and descale to double."""
    c = F.col(col) if isinstance(col, str) else col
    out = (
        (
            F.sum(c).cast("decimal(38,6)")
            / F.lit(_SCALE).cast("decimal(18,0)")
        ).cast("double")
    )
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic AVG: exact fixed-point sum over the count of
    QUANTIZABLE rows (NaN/inf/out-of-range drop from both numerator and
    denominator — a bare count(c) would silently deflate the average).

    The denominator counts a cheap guard expression with the SAME null
    mask as the quantize (NULL iff c is NULL/NaN/out-of-domain) instead
    of the full quantize chain: count() only consumes null-ness, and the
    r13 plan audit showed partial_count(quantized(c)) re-running the
    whole signum/floor/cast chain per row just to test for NULL."""
    if isinstance(col, str):
        cs = _csql(col)
        out = F.expr(
            f"CAST({_exact_sum_sql(cs)} AS DOUBLE)"
            f" / count(CASE WHEN (NOT isnan({cs}))"
            f" AND (abs({cs}) < 1e12) THEN 1 END)"
        )
    else:
        c = col
        countable = F.when(
            (~F.isnan(c)) & (F.abs(c) < F.lit(_LIMIT)), F.lit(1)
        )
        out = _exact_sum(c).cast("double") / F.count(countable)
    return out.alias(alias) if alias else out


def davg_over(
    col: Column | str, window, alias: str | None = None
) -> Column:
    """davg's WINDOWED form: the identical numerator (dsum_over — the
    same quantize/decimal/double chain as dsum) over the identical
    denominator (count of the same cheap guard with davg's null mask),
    evaluated per window partition instead of per group. Bit-identical
    to ``davg`` on the same groups: same double numerator, same long
    count, same single double division. Lets a correlated per-key
    average be computed in ONE pass over the fact table (window) instead
    of aggregate + join-back, which instantiates the child subtree
    twice (r13: q17)."""
    c = F.col(col) if isinstance(col, str) else col
    countable = F.when(
        (~F.isnan(c)) & (F.abs(c) < F.lit(_LIMIT)), F.lit(1)
    )
    out = dsum_over(col, window) / F.count(countable).over(window)
    return out.alias(alias) if alias else out

