"""Column-expression library for the reference's cleansing semantics.

Pure Column-in/Column-out helpers (JVM-side, codegen-friendly — no UDFs).
Each mirrors a reference operator from SURVEY.md §2.4/§2.5:

- F3 invalid-timestamp predicate   (reference ingest.py:521-527)
- F4 residual-garbage predicate    (reference ingest.py:773-778)
- C6 tolerant boolean coercion     (reference ingest.py:593-608)
- C7 boolean-string normalization  (reference ingest.py:610-618, 386-388)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRUE_TOKENS = ("true", "1", "yes")
FALSE_TOKENS = ("false", "0", "no")

# ---------------------------------------------------------------------------
# SQL-text twins of the Column helpers below. Building a 100-column cleansing
# projection through the Column API costs 2-4 py4j round-trips per method
# call (~0.3 s of pure driver time for the LEAD spec, measured r13); the same
# projection as selectExpr strings is one round-trip total and parses in the
# JVM in microseconds. The Column forms stay for single-column composition;
# the *_sql forms MUST mirror them exactly (tests/test_cleanse_sql_equiv.py
# pins Column-vs-SQL result equality on adversarial inputs).
# ---------------------------------------------------------------------------

_TRUE_SQL = ", ".join(f"'{t}'" for t in TRUE_TOKENS)
_FALSE_SQL = ", ".join(f"'{t}'" for t in FALSE_TOKENS)


def quote_ident(name: str) -> str:
    """Backtick-quote a column identifier for SQL-text expressions."""
    return "`" + name.replace("`", "``") + "`"


def invalid_timestamp_predicate_sql(c: str) -> str:
    """SQL text of ``invalid_timestamp_predicate`` over expression ``c``
    (which must already be a STRING-typed expression)."""
    return f"((length({c}) <= 3) OR (NOT ({c} RLIKE '.*\\\\d+.*')))"


def boolean_expr_sql(c: str) -> str:
    """SQL text of ``boolean_expr`` over expression ``c``."""
    low = f"lower(CAST({c} AS STRING))"
    return (
        f"(CASE WHEN ({low} IN ({_TRUE_SQL}) OR {low} = 't') THEN true "
        f"WHEN ({low} IN ({_FALSE_SQL}) OR {low} = 'f') THEN false "
        f"ELSE CAST(NULL AS BOOLEAN) END)"
    )


def boolean_string_expr_sql(c: str) -> str:
    """SQL text of ``boolean_string_expr`` over expression ``c``."""
    low = f"lower(CAST({c} AS STRING))"
    return (
        f"(CASE WHEN {c} IS NULL THEN CAST(NULL AS STRING) "
        f"WHEN {low} IN ({_TRUE_SQL}, 't') THEN 'TRUE' "
        f"WHEN {low} IN ({_FALSE_SQL}, 'f') THEN 'FALSE' "
        f"ELSE CAST({c} AS STRING) END)"
    )


def invalid_timestamp_predicate(col: Column) -> Column:
    """True when a raw string can't possibly be a timestamp.

    Garbage definition (reference ingest.py:521-527): 1-3 alphabetic chars,
    or total length <= 3, or contains no digit at all. The reference's
    first clause (``^[A-Za-z]{1,3}$``) is fully subsumed by ``length <=
    3`` — identical semantics without a per-row regex on the hot
    cleansing path.
    """
    return (F.length(col) <= 3) | ~col.rlike(".*\\d+.*")


def residual_garbage_predicate(col: Column) -> Column:
    """True when, after stripping timestamp characters, anything remains.

    Reference ingest.py:773-778: strip ``[0-9\\-:. ]`` and flag non-empty
    residue as invalid.
    """
    return F.regexp_replace(col.cast("string"), "[0-9\\-:. ]", "").rlike(".+")


def boolean_expr(col: Column) -> Column:
    """Tolerant text->boolean (reference ingest.py:593-608).

    true/1/yes/t -> true; false/0/no/f -> false; anything else -> null.
    """
    lowered = F.lower(col.cast("string"))
    return (
        F.when(lowered.isin(*TRUE_TOKENS) | (lowered == "t"), F.lit(True))
        .when(lowered.isin(*FALSE_TOKENS) | (lowered == "f"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def boolean_string_expr(col: Column) -> Column:
    """Normalize boolean-ish strings to literal "TRUE"/"FALSE".

    Reference ingest.py:610-618 (token set at ingest.py:386-388): null stays
    null, recognized tokens map to "TRUE"/"FALSE", anything else passes
    through unchanged.
    """
    lowered = F.lower(col.cast("string"))
    return (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(lowered.isin(*TRUE_TOKENS, "t"), F.lit("TRUE"))
        .when(lowered.isin(*FALSE_TOKENS, "f"), F.lit("FALSE"))
        .otherwise(col.cast("string"))
    )
