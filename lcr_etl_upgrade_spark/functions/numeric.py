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
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


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
