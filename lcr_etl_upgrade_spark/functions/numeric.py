"""Deterministic numeric aggregation helpers.

Floating-point SUM/AVG depend on accumulation order, which differs between
engines (and between runs under AQE). For oracle-comparable results we
quantize each double to its 6-decimal fixed-point value and sum exactly:

    quantize(x) = round-half-away-from-zero(x * 1e6) as int
    SUM(quantize(x)) exactly -> / 1e6 -> double

This is value-identical to the oracle spelling both engines agree on::

    CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)

because a double->decimal(_,6) cast IS round-half-away at the 6th decimal
(DuckDB computes it as round(x * 10^6) on the double product; Spark via
BigDecimal half-up on |x|), the integer sums are exact in any order, and
the final decimal->double cast is correctly rounded in both engines.

Implementation: the quantized value is a LONG produced by pure codegen
arithmetic — signum(x) * floor(|x| * 1e6 + 0.5) — then cast to
decimal(18,0) (compact, long-backed; no per-row BigDecimal allocation)
for a decimal(28,0) SUM accumulator that can absorb ~1e9 rows of 1e12-
scaled values before even leaving the compact representation, and can
NEVER overflow (decimal promotes). Measured 2.29s -> 0.70s on the sf0.1
Q1 aggregate vs the previous cast-to-decimal(18,6)-per-row formulation,
whose per-row BigDecimal.valueOf(double) allocation dominated.

Domain: |x| < 1e12 (same bound the previous decimal(18,6) cast imposed);
NaN, ±inf and out-of-range values quantize to NULL and drop out of the
sum — identical to a decimal cast overflow under non-ANSI semantics.
Negative exact-tie values (x*1e6 landing on .5) round away from zero via
the signum/abs split, matching both engines' decimal casts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"
_SCALE = 1_000_000
_LIMIT = 1e12  # decimal(18,6) range — values beyond were NULL before too


def _quantized_long(c: Column) -> Column:
    """round-half-away-from-zero(x * 1e6) as a long; NULL outside the
    domain (NaN/±inf/|x| >= 1e12)."""
    guarded = F.when((~F.isnan(c)) & (F.abs(c) < F.lit(_LIMIT)), c)
    return (
        F.signum(guarded)
        * F.floor(F.abs(guarded) * F.lit(float(_SCALE)) + F.lit(0.5))
    ).cast("long")


def _exact_sum(c: Column) -> Column:
    """Exact fixed-point SUM as decimal(38,6), NULL for all-NULL groups."""
    return F.sum(_quantized_long(c).cast("decimal(18,0)")).cast(
        "decimal(38,6)"
    ) / F.lit(_SCALE).cast("decimal(18,0)")


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-insensitive exact SUM of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = _exact_sum(c).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic AVG: exact fixed-point sum, one double division at
    the end (matches CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)/COUNT(x))."""
    c = F.col(col) if isinstance(col, str) else col
    out = _exact_sum(c).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dmul(a: Column, b: Column) -> Column:
    """Double multiply (IEEE — deterministic per-row in any engine)."""
    return a * b
