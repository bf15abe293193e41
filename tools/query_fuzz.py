#!/usr/bin/env python
"""Randomized relational differential: PySpark DataFrame ops vs DuckDB.

Round-8 ask #2. The frozen 87-query registry pins known shapes; this
fuzzer covers what a fixed registry structurally cannot - operator
INTERACTION bugs (the round-6 deletion-vector fail-open class). It
generates random typed query trees over the engine's implemented
relational surface

    scan -> filter/project -> join (equi / null-safe <=>)
         -> agg / rollup / cube / grouping sets (incl. over joins)
         -> window (partition / ROWS / RANGE frames)
         -> orderBy/limit -> distinct
         -> union all / intersect [all] / except [all]

renders each tree BOTH as PySpark DataFrame calls (pyspark.sql.functions
Column expressions - the same API surface plans/relational.py is built
from) and as DuckDB SQL, runs both over the same random NULL-ridden
in-memory tables, and compares row-sorted, column-name-sorted, typed-
normalized rows (the exact comparator of tools/check_oracle.py).

Dialect traps deliberately designed around (each is a REAL semantic
divergence between the engines, not a bug in either):
 - string concatenation: Spark concat() propagates NULL, DuckDB
   concat() SKIPS NULLs -> rendered as `||` on the DuckDB side;
 - sort null placement: Spark ASC defaults to NULLS FIRST, DuckDB to
   NULLS LAST -> every DuckDB ORDER BY carries an explicit
   NULLS FIRST/LAST matching Spark's default;
 - `/` and `%`: Spark 4's ANSI-mode operators THROW on zero divisors
   where DuckDB's yield NULL -> the grammar fuzzes the engines'
   tolerant surfaces instead (round 9): Spark try_divide/try_mod vs
   DuckDB `/` and `%` over a (belt-and-suspenders) NULLIF'd divisor —
   int/int division is DOUBLE in both, mod sign follows the dividend
   in both, and -0.0 divisors are NULL in both (probed);
 - float SUM/AVG: plain Spark doubles sums are partition-order
   dependent, so the ENGINE's deterministic aggregates are fuzzed
   instead (round 9): functions/numeric.dsum/davg vs their oracle
   spelling CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) [/ COUNT(x)]
   — fuzzing the exact fixed-point path the headline queries run;
 - LIMIT determinism: a LIMIT is only emitted under an ORDER BY whose
   key list ends with the table's unique id;
 - bare decimal literals are DECIMAL to DuckDB, DOUBLE to Spark's lit()
   -> double literals render as CAST(x AS DOUBLE);
 - negative zero: DuckDB's abs() on a computed DOUBLE returns -0.0
   where Spark's Math.abs clears the sign bit -> '-0.0' normalizes to
   '0.0' in the comparator (sign of zero is presentation, not
   semantics);
 - dates: Spark date_add(d, n) renders as DuckDB d + n, datediff(a, b)
   as a - b (DuckDB date subtraction yields integer days);
 - grouping over EMPTY input (round 9): Spark's Expand-based
   rollup/cube/grouping-sets yields 0 rows for the grand-total set ()
   where DuckDB (per the SQL standard) yields 1 — verified both ways ->
   rollup/cube and ()-bearing set lists run unfiltered (base tables are
   non-empty by construction); a WHERE-filtered case degrades to
   GROUPING SETS without ();
 - grouping column coverage: Spark refuses to SELECT a grouping column
   absent from EVERY grouping set (DuckDB leniently NULLs it) -> the
   renderer appends the all-keys set when a sampled list leaves a key
   uncovered; per-key single-argument GROUPING() flags are used instead
   of GROUPING_ID (whose bit order could diverge between engines);
 - pivot (round 10): Spark pivot(values) leaves EMPTY cells NULL for
   every aggregate including count -> count(*) cells restate as
   NULLIF(COUNT(CASE..), 0), exact because the probe argument is the
   literal 1; value lists stay lowercase-distinct (the comparator
   lowercases column names);
 - unpivot (round 10): Spark's unpivot KEEPS NULL measure values where
   DuckDB's UNPIVOT drops them by default -> restated as UNION ALL
   branches, pinning include-nulls semantics;
 - JSON (round 10): get_json_object on MALFORMED documents degrades to
   NULL where DuckDB's json_extract_string THROWS -> json_valid() CASE
   guard; scalar extraction parity probed exhaustively (numbers
   normalize identically: 1.50 -> '1.5', 1e2 -> '100.0'); a JSON null
   ARRAY ELEMENT is the one true divergence (Spark: the STRING 'null';
   DuckDB: SQL NULL, indistinguishable from a null OBJECT FIELD where
   Spark gives SQL NULL too) -> generated arrays exclude null elements;
 - RANGE window frames: rows whose ORDER BY key is NULL get
   engine-subtle offset-frame semantics -> the RANGE order key is
   wrapped in coalesce() so both engines see identical non-null data
   (ROWS frames instead use the id tiebreak for a total order).

Every case is reproducible from (seed, index); a failing case is
greedily minimized (drop projections, strip WHERE, unwrap predicate
subtrees) before reporting.

Usage:
    python tools/query_fuzz.py [--seed N] [--n N] [--rows N] [--case I]

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

# --------------------------------------------------------------- datagen

_ALPHABET = list("abcxyz")

_JSON_SCALARS = [1, -7, 42, 0, 1.5, 100.0, "x", "ha\"q", "a\\b", "é", "",
                 True, False, None]
# array elements exclude JSON null: probed REAL divergence — Spark's
# get_json_object returns the STRING 'null' for a null ARRAY ELEMENT
# ({"arr":[null]} $.arr[0] -> 'null') while returning SQL NULL for a
# null OBJECT FIELD ({"a":null} $.a -> NULL); DuckDB returns SQL NULL
# for both and json_extract cannot distinguish the two cases, so no
# oracle spelling can restate Spark's asymmetry — generator exclusion,
# documented like pipeline_fuzz's DST hours
_JSON_ARR_SCALARS = [v for v in _JSON_SCALARS if v is not None]
_BAD_JSON = ["{oops", "not json", "", "[1,", '{"a":}', "{{}}"]


def _rand_json(rng) -> str | None:
    """Random JSON document for the json_extract kind: nested object /
    array structure with randomly absent keys, plus NULL cells and
    INVALID documents (get_json_object degrades them to NULL; the
    DuckDB oracle restates that with a json_valid() guard because
    json_extract_string THROWS on malformed input)."""
    import json as _json

    r = rng.random()
    if r < 0.08:
        return None
    if r < 0.16:
        return _BAD_JSON[int(rng.integers(0, len(_BAD_JSON)))]
    doc: dict = {}
    pick = lambda: _JSON_SCALARS[int(rng.integers(0, len(_JSON_SCALARS)))]  # noqa: E731
    if rng.random() < 0.8:
        doc["a"] = pick()
    if rng.random() < 0.7:
        b: dict = {}
        if rng.random() < 0.8:
            b["c"] = pick()
        if rng.random() < 0.7:
            b["d"] = [int(rng.integers(-9, 10))
                      for _ in range(int(rng.integers(0, 4)))]
        doc["b"] = b
    if rng.random() < 0.6:
        doc["arr"] = [
            _JSON_ARR_SCALARS[int(rng.integers(0, len(_JSON_ARR_SCALARS)))]
            for _ in range(int(rng.integers(0, 5)))
        ]
    return _json.dumps(doc, ensure_ascii=False)


def make_tables(rng: np.random.Generator, rows: int) -> dict[str, pd.DataFrame]:
    """Three NULL-ridden tables with a unique id each."""
    out = {}
    for ti in range(3):
        n = int(rng.integers(max(2, rows // 2), rows + 1))
        nullmask = lambda: rng.random(n) < 0.15  # noqa: E731
        a = rng.integers(-5, 6, n).astype("float64")
        a[nullmask()] = np.nan
        b = rng.integers(-1000, 1001, n).astype("float64")
        b[nullmask()] = np.nan
        c = rng.integers(-64, 65, n).astype("float64") / 8.0
        c[nullmask()] = np.nan
        d = np.array(
            ["".join(rng.choice(_ALPHABET, rng.integers(0, 5))) for _ in range(n)],
            dtype=object,
        )
        d[nullmask()] = None
        e = rng.integers(0, 2, n).astype("float64")
        e[nullmask()] = np.nan
        import datetime as _dt

        days = rng.integers(0, 3000, n)  # 2015-01-01 + [0, 3000) days
        fnull = nullmask()
        f = np.array(
            [
                None
                if fnull[i]
                else _dt.date(2015, 1, 1) + _dt.timedelta(days=int(days[i]))
                for i in range(n)
            ],
            dtype=object,
        )
        out[f"t{ti}"] = pd.DataFrame(
            {
                "id": np.arange(n, dtype="int64"),
                "a_int": pd.array(a, dtype="Int64"),
                "b_int": pd.array(b, dtype="Int64"),
                "c_dbl": a * 0 + c,  # plain float64 with NaN for null
                "d_str": d,
                "e_bool": pd.array(
                    [None if np.isnan(v) else bool(v) for v in e],
                    dtype="boolean",
                ),
                "f_date": f,
                "g_json": np.array(
                    [_rand_json(rng) for _ in range(n)], dtype=object
                ),
            }
        )
    return out


_SPARK_SCHEMA = (
    "id long, a_int long, b_int long, c_dbl double, d_str string, "
    "e_bool boolean, f_date date, g_json string"
)

# ----------------------------------------------------------- expression AST

INT, DBL, STR, BOOL, DATE = "int", "dbl", "str", "bool", "date"
# g_json's type tag "json" is never in a Gen type pool, so random
# expressions don't touch it (JSON text in string ops would drag in
# collation-order questions); only the json_extract kind (and the
# typeless IS NULL leaf, which is dialect-safe) reaches it
_COLS = {"a_int": INT, "b_int": INT, "c_dbl": DBL, "d_str": STR,
         "e_bool": BOOL, "id": INT, "f_date": DATE, "g_json": "json"}


class E:
    """Expression node: renders to a pyspark Column and a SQL string."""

    def __init__(self, typ, sql, col, children=()):
        self.typ = typ
        self._sql = sql          # callable () -> str
        self._col = col          # callable () -> pyspark Column
        self.children = children

    def sql(self) -> str:
        return self._sql()

    def col(self):
        return self._col()


def _F():
    from pyspark.sql import functions as F

    return F


def col_ref(name: str, prefix: str = "") -> E:
    full = f"{prefix}{name}" if prefix else name
    return E(_COLS[name], lambda: full, lambda: _F().col(full))


def lit_int(v: int) -> E:
    return E(INT, lambda: str(v), lambda: _F().lit(v))


def lit_dbl(v: float) -> E:
    # DuckDB types a bare decimal literal as DECIMAL (so -5.625 - 1.375
    # folds to DECIMAL '7.000'), Spark's lit() as DOUBLE - cast so both
    # sides run IEEE double arithmetic
    return E(DBL, lambda: f"CAST({v!r} AS DOUBLE)", lambda: _F().lit(v))


def lit_str(v: str) -> E:
    return E(STR, lambda: "'" + v + "'", lambda: _F().lit(v))


def lit_bool(v: bool) -> E:
    return E(BOOL, lambda: "TRUE" if v else "FALSE", lambda: _F().lit(v))


def binop(op: str, typ: str, lhs: E, rhs: E) -> E:
    sql_op = {"==": "=", "!=": "<>", "&": "AND", "|": "OR"}.get(op, op)
    def col():
        import operator as _o

        f = {"+": _o.add, "-": _o.sub, "*": _o.mul, "<": _o.lt,
             "<=": _o.le, ">": _o.gt, ">=": _o.ge, "==": _o.eq,
             "!=": _o.ne, "&": _o.and_, "|": _o.or_}[op]
        return f(lhs.col(), rhs.col())

    return E(typ, lambda: f"({lhs.sql()} {sql_op} {rhs.sql()})", col,
             (lhs, rhs))


def fn(name_spark: str, typ: str, args: list[E],
       sql_tpl: str | None = None) -> E:
    def sql():
        rendered = [a.sql() for a in args]
        if sql_tpl:
            return sql_tpl.format(*rendered)
        return f"{name_spark}({', '.join(rendered)})"

    def col():
        F = _F()
        return getattr(F, name_spark)(*[a.col() for a in args])

    return E(typ, sql, col, tuple(args))


def is_null(x: E, negate: bool) -> E:
    word = "IS NOT NULL" if negate else "IS NULL"
    return E(BOOL, lambda: f"({x.sql()} {word})",
             lambda: x.col().isNotNull() if negate else x.col().isNull(),
             (x,))


def case_when(cond: E, then: E, other: E) -> E:
    return E(
        then.typ,
        lambda: (f"(CASE WHEN {cond.sql()} THEN {then.sql()} "
                 f"ELSE {other.sql()} END)"),
        lambda: _F().when(cond.col(), then.col()).otherwise(other.col()),
        (cond, then, other),
    )


def concat2(a: E, b: E) -> E:
    # Spark concat() propagates NULL; DuckDB concat() skips NULLs, so
    # the SQL side must use `||` (which propagates).
    return E(STR, lambda: f"({a.sql()} || {b.sql()})",
             lambda: _F().concat(a.col(), b.col()), (a, b))


def substr_(x: E, pos: int, ln: int) -> E:
    return E(STR, lambda: f"substr({x.sql()}, {pos}, {ln})",
             lambda: _F().substring(x.col(), pos, ln), (x,))


def lit_date(y: int, m: int, d: int) -> E:
    import datetime as _dt

    v = _dt.date(y, m, d)
    return E(DATE, lambda: f"DATE '{v.isoformat()}'",
             lambda: _F().lit(v))


def try_div_(a: E, b: E) -> E:
    # Spark 4's ANSI `/` THROWS on zero divisors; the engine's tolerant
    # surface is try_divide (NULL on 0, incl. -0.0 — probed) = DuckDB's
    # non-raising `/` over a NULLIF'd divisor. int/int is DOUBLE in both.
    return E(DBL, lambda: f"({a.sql()} / NULLIF({b.sql()}, 0))",
             lambda: _F().try_divide(a.col(), b.col()), (a, b))


def try_mod_(a: E, b: E) -> E:
    # sign follows the dividend in BOTH engines (-7%3=-1, 7%-3=1, probed)
    return E(INT, lambda: f"({a.sql()} % NULLIF({b.sql()}, 0))",
             lambda: _F().try_mod(a.col(), b.col()), (a, b))


def date_add_(x: E, n: int) -> E:
    # Spark date_add(d, n); DuckDB has date + integer-days
    return E(DATE, lambda: f"({x.sql()} + {n})",
             lambda: _F().date_add(x.col(), n), (x,))


def datediff_(a: E, b: E) -> E:
    # Spark datediff(end, start) = days; DuckDB date - date = days
    return E(INT, lambda: f"({a.sql()} - {b.sql()})",
             lambda: _F().datediff(a.col(), b.col()), (a, b))


def year_(x: E) -> E:
    return E(INT, lambda: f"year({x.sql()})",
             lambda: _F().year(x.col()), (x,))


# --------------------------------------------------------- random generator


class Gen:
    def __init__(self, rng: np.random.Generator, prefixes: list[str]):
        self.rng = rng
        self.prefixes = prefixes

    def pick(self, xs):
        return xs[int(self.rng.integers(0, len(xs)))]

    def column(self, typ=None) -> E:
        names = [n for n, t in _COLS.items()
                 if (typ is None or t == typ) and n != "id"]
        if not names:
            raise ValueError(typ)
        return col_ref(self.pick(names), self.pick(self.prefixes))

    def expr(self, typ: str, depth: int) -> E:
        r = self.rng.random()
        if depth <= 0 or r < 0.35:
            return self.leaf(typ)
        if typ == INT:
            k = self.pick(["bin", "bin", "case", "coalesce", "abs",
                           "datediff", "year", "mod"])
            if k == "datediff":
                return datediff_(self.expr(DATE, depth - 1),
                                 self.expr(DATE, depth - 1))
            if k == "year":
                return year_(self.expr(DATE, depth - 1))
            if k == "mod":
                return try_mod_(self.expr(INT, depth - 1),
                                self.expr(INT, depth - 1))
        if typ in (INT, DBL):
            if typ == DBL:
                k = self.pick(["bin", "bin", "case", "coalesce", "abs",
                               "div"])
            if k == "div":
                t = self.pick([INT, DBL])
                return try_div_(self.expr(t, depth - 1),
                                self.expr(t, depth - 1))
            if k == "bin":
                op = self.pick(["+", "-", "*"])
                return binop(op, typ, self.expr(typ, depth - 1),
                             self.expr(typ, depth - 1))
            if k == "case":
                return case_when(self.expr(BOOL, depth - 1),
                                 self.expr(typ, depth - 1),
                                 self.expr(typ, depth - 1))
            if k == "coalesce":
                return fn("coalesce", typ,
                          [self.expr(typ, depth - 1),
                           self.expr(typ, depth - 1)])
            return fn("abs", typ, [self.expr(typ, depth - 1)])
        if typ == DATE:
            k = self.pick(["date_add", "case", "coalesce", "leaf"])
            if k == "date_add":
                return date_add_(self.expr(DATE, depth - 1),
                                 int(self.rng.integers(-60, 61)))
            if k == "case":
                return case_when(self.expr(BOOL, depth - 1),
                                 self.expr(DATE, depth - 1),
                                 self.expr(DATE, depth - 1))
            if k == "coalesce":
                return fn("coalesce", DATE,
                          [self.expr(DATE, depth - 1),
                           self.expr(DATE, depth - 1)])
            return self.leaf(DATE)
        if typ == STR:
            k = self.pick(["concat", "upper", "lower", "substr", "case",
                           "coalesce"])
            if k == "concat":
                return concat2(self.expr(STR, depth - 1),
                               self.expr(STR, depth - 1))
            if k in ("upper", "lower"):
                return fn(k, STR, [self.expr(STR, depth - 1)])
            if k == "substr":
                return substr_(self.expr(STR, depth - 1),
                               int(self.rng.integers(1, 4)),
                               int(self.rng.integers(0, 4)))
            if k == "case":
                return case_when(self.expr(BOOL, depth - 1),
                                 self.expr(STR, depth - 1),
                                 self.expr(STR, depth - 1))
            return fn("coalesce", STR, [self.expr(STR, depth - 1),
                                        self.expr(STR, depth - 1)])
        # BOOL
        k = self.pick(["cmp", "cmp", "cmp", "and", "or", "not", "isnull",
                       "isnotnull"])
        if k == "cmp":
            t = self.pick([INT, INT, DBL, STR, DATE])
            op = self.pick(["<", "<=", ">", ">=", "==", "!="])
            return binop(op, BOOL, self.expr(t, depth - 1),
                         self.expr(t, depth - 1))
        if k in ("and", "or"):
            return binop("&" if k == "and" else "|", BOOL,
                         self.expr(BOOL, depth - 1),
                         self.expr(BOOL, depth - 1))
        if k == "not":
            inner = self.expr(BOOL, depth - 1)
            return E(BOOL, lambda: f"(NOT {inner.sql()})",
                     lambda: ~inner.col(), (inner,))
        return is_null(self.column(), k == "isnotnull")

    def leaf(self, typ: str) -> E:
        if self.rng.random() < 0.7:
            try:
                return self.column(typ)
            except ValueError:
                pass
        if typ == INT:
            return lit_int(int(self.rng.integers(-20, 21)))
        if typ == DBL:
            return lit_dbl(float(self.rng.integers(-64, 65)) / 8.0)
        if typ == STR:
            return lit_str("".join(
                self.rng.choice(_ALPHABET, self.rng.integers(0, 3))))
        if typ == DATE:
            return lit_date(int(self.rng.integers(2014, 2026)),
                            int(self.rng.integers(1, 13)),
                            int(self.rng.integers(1, 29)))
        return lit_bool(bool(self.rng.integers(0, 2)))


# ------------------------------------------------------------- query shapes


class Case:
    """One randomized query: carries everything needed to (re)run and
    to render both sides."""

    def __init__(self, kind, tables, projections, where=None, group=None,
                 aggs=None, join=None, order=None, limit=None,
                 distinct=False, window=None, union=None, having=None,
                 setop="union_all", gkind=None, gsets=None,
                 nullsafe=False, pivot_values=None, on_extra=None):
        self.kind = kind
        self.tables = tables          # list of table names used
        self.projections = projections  # list[(alias, E)]
        self.where = where            # E | None
        self.group = group            # list[(alias, E)] | None
        self.aggs = aggs              # list[(alias, fn, E|None)] | None
        self.join = join              # (how, key) | None
        self.order = order            # list[(E, asc)] | None (ends with id)
        self.limit = limit
        self.distinct = distinct
        self.window = window          # list[(alias, spec)] | None
        self.union = union            # (projections_b, where_b) | None
        self.having = having          # E over agg output aliases | None
        self.setop = setop            # union_all|intersect|intersect_all
        #                               |except|except_all (with .union)
        self.gkind = gkind            # rollup|cube|gsets (kind 'grouping')
        self.gsets = gsets            # list[tuple[str,...]] of key aliases
        self.nullsafe = nullsafe      # join key compares <=> not =
        self.pivot_values = pivot_values  # kind 'pivot': value list
        self.on_extra = on_extra      # E inside the join ON clause | None

    # ---- DuckDB side
    def to_sql(self) -> str:
        def prefixed(t: str, p: str) -> str:
            cols = ", ".join(f"{c} AS {p}{c}" for c in _COLS)
            return f"(SELECT {cols} FROM {t})"

        if self.kind in ("grouping", "join_grouping"):
            return self._grouping_sql(prefixed)

        if self.kind == "pivot":
            # Spark pivot(values) == conditional aggregation (the
            # documented semantics with an explicit value list); empty
            # cells are NULL for EVERY aggregate in Spark — count(*)
            # restates as NULLIF(COUNT(CASE..),0), which is exact here
            # because the probe argument is the literal 1 (a matched
            # group always counts >= 1)
            (kalias, kexpr), = self.group
            (_, agg, arg), = self.aggs
            cells = []
            for v in self.pivot_values:
                vq = v.replace("'", "''")
                if agg == "count_star":
                    cells.append(
                        f"NULLIF(COUNT(CASE WHEN s0_d_str = '{vq}' "
                        f"THEN 1 END), 0) AS \"{v}\""
                    )
                else:
                    cells.append(
                        f"{agg}(CASE WHEN s0_d_str = '{vq}' THEN "
                        f"{arg.sql()} END) AS \"{v}\""
                    )
            q = (f"SELECT {kexpr.sql()} AS {kalias}, {', '.join(cells)} "
                 f"FROM {prefixed(self.tables[0], 's0_')} s0")
            if self.where is not None:
                q += f" WHERE {self.where.sql()}"
            return q + " GROUP BY 1"

        if self.kind == "unpivot":
            # Spark's unpivot KEEPS NULL measure values (probed; DuckDB
            # UNPIVOT drops them by default) -> restated as UNION ALL
            # branches, which pin the include-nulls semantics exactly
            (ialias, iexpr) = self.projections[0]
            branches = []
            for valias, vexpr in self.projections[1:]:
                b = (f"SELECT {iexpr.sql()} AS {ialias}, '{valias}' AS "
                     f"var, {vexpr.sql()} AS val FROM "
                     f"{prefixed(self.tables[0], 's0_')} s0")
                if self.where is not None:
                    b += f" WHERE {self.where.sql()}"
                branches.append(b)
            return " UNION ALL ".join(branches)

        sql_hows = {"inner": "JOIN", "left": "LEFT JOIN",
                    "right": "RIGHT JOIN", "full": "FULL JOIN",
                    "semi": "SEMI JOIN", "anti": "ANTI JOIN"}
        eq = "IS NOT DISTINCT FROM" if self.nullsafe else "="
        if self.kind == "join3":
            hows, keys = self.join
            t0, t1, t2 = self.tables
            src = (f"{prefixed(t0, 's0_')} s0 {sql_hows[hows[0]]} "
                   f"{prefixed(t1, 's1_')} s1 "
                   f"ON s0.s0_{keys[0]} = s1.s1_{keys[0]} "
                   f"{sql_hows[hows[1]]} {prefixed(t2, 's2_')} s2 "
                   f"ON s1.s1_{keys[1]} = s2.s2_{keys[1]}")
        elif self.join:
            how, key = self.join
            t0, t1 = self.tables
            src = (f"{prefixed(t0, 's0_')} s0 {sql_hows[how]} "
                   f"{prefixed(t1, 's1_')} s1 "
                   f"ON s0.s0_{key} {eq} s1.s1_{key}")
            if self.on_extra is not None:
                src += f" AND ({self.on_extra.sql()})"
        else:
            src = f"{prefixed(self.tables[0], 's0_')} s0"
        cols = []
        if self.group is not None:
            for alias, e in self.group:
                cols.append(f"{e.sql()} AS {alias}")
            for alias, agg, arg in self.aggs:
                cols.append(f"{_agg_sql(agg, arg)} AS {alias}")
        else:
            for alias, e in self.projections:
                cols.append(f"{e.sql()} AS {alias}")
            for alias, spec in (self.window or []):
                cols.append(f"{_win_sql(spec)} AS {alias}")
        sel = "SELECT DISTINCT" if self.distinct else "SELECT"
        q = f"{sel} {', '.join(cols)} FROM {src}"
        if self.where is not None:
            q += f" WHERE {self.where.sql()}"
        if self.group is not None:
            q += " GROUP BY " + ", ".join(
                str(i + 1) for i in range(len(self.group)))
        if self.having is not None:
            # alias-safe HAVING: wrap as a subquery filter (identical
            # semantics; avoids dialect rules on aliases in HAVING)
            q = f"SELECT * FROM ({q}) __hv WHERE {self.having.sql()}"
        if self.union is not None:
            proj_b, where_b = self.union
            cols_b = [f"{e.sql()} AS {a}" for a, e in proj_b]
            q_b = (f"SELECT {', '.join(cols_b)} FROM "
                   f"{prefixed(self.tables[1], 's0_')} s0")
            if where_b is not None:
                q_b += f" WHERE {where_b.sql()}"
            op = {"union_all": "UNION ALL", "intersect": "INTERSECT",
                  "intersect_all": "INTERSECT ALL", "except": "EXCEPT",
                  "except_all": "EXCEPT ALL"}[self.setop]
            q = f"{q} {op} {q_b}"
        if self.order is not None:
            parts = []
            for e, asc in self.order:
                # Spark defaults: ASC -> NULLS FIRST, DESC -> NULLS LAST.
                # DuckDB defaults to NULLS LAST everywhere: be explicit.
                parts.append(f"{e.sql()} {'ASC NULLS FIRST' if asc else 'DESC NULLS LAST'}")
            q += " ORDER BY " + ", ".join(parts)
        if self.limit is not None:
            q += f" LIMIT {self.limit}"
        return q

    # ---- grouping (rollup / cube / grouping sets), both sides: group
    # keys and agg args are PRE-PROJECTED to plain aliases (k0.., v0..)
    # so GROUPING() and the grouping columns resolve identically in both
    # engines, and the per-key grouping flags + set lists are DERIVED
    # from self.group at render time (so the minimizer's generic
    # group/agg drops stay consistent)
    def _grouping_inner(self):
        inner = [(a, e) for a, e in self.group]
        vi = 0  # dense counter, matching _grouping_select/_grouping_df
        for _, _, arg in self.aggs:
            if arg is not None:
                inner.append((f"v{vi}", arg))
                vi += 1
        return inner

    def _grouping_sets_sql(self) -> str:
        keys = [a for a, _ in self.group]
        if self.gkind in ("rollup", "cube"):
            return f"{self.gkind.upper()} ({', '.join(keys)})"
        present = [s for s in self.gsets if all(k in keys for k in s)]
        if not present:
            # minimizer dropped every referenced key; fall back to a
            # NON-empty set under a filter (the empty set diverges on
            # empty input — see the trap note in gen_case)
            present = [(keys[0],)] if self.where is not None else [()]
        # Spark refuses to SELECT a grouping column absent from EVERY
        # grouping set (DuckDB leniently NULLs it): guarantee coverage
        # by appending the all-keys set when needed
        covered = set().union(*present) if present else set()
        if any(k not in covered for k in keys):
            present.append(tuple(keys))
        rendered = ", ".join(f"({', '.join(s)})" for s in present)
        return f"GROUPING SETS ({rendered})"

    def _grouping_select(self) -> list[str]:
        cols = [a for a, _ in self.group]
        cols += [f"grouping({a}) AS g_{a}" for a, _ in self.group]
        vi = 0
        for alias, agg, arg in self.aggs:
            if arg is None:
                cols.append(f"count(*) AS {alias}")
            else:
                cols.append(f"{agg}(v{vi}) AS {alias}")
                vi += 1
        return cols

    def _grouping_sql(self, prefixed) -> str:
        inner_cols = ", ".join(
            f"{e.sql()} AS {a}" for a, e in self._grouping_inner()
        )
        if self.join:
            how, key = self.join
            hows = {"inner": "JOIN", "left": "LEFT JOIN",
                    "full": "FULL JOIN"}
            src = (f"{prefixed(self.tables[0], 's0_')} s0 {hows[how]} "
                   f"{prefixed(self.tables[1], 's1_')} s1 "
                   f"ON s0.s0_{key} = s1.s1_{key}")
        else:
            src = f"{prefixed(self.tables[0], 's0_')} s0"
        q = f"SELECT {inner_cols} FROM {src}"
        if self.where is not None:
            q += f" WHERE {self.where.sql()}"
        return (
            f"SELECT {', '.join(self._grouping_select())} FROM ({q}) __g "
            f"GROUP BY {self._grouping_sets_sql()}"
        )

    def _grouping_df(self, spark, sdfs):
        from pyspark.sql import functions as F

        if self.join:
            how, key = self.join
            d0 = _prefix(sdfs[self.tables[0]], "s0_")
            d1 = _prefix(sdfs[self.tables[1]], "s1_")
            df = d0.join(d1, d0[f"s0_{key}"] == d1[f"s1_{key}"], how)
        else:
            df = _prefix(sdfs[self.tables[0]], "s0_")
        if self.where is not None:
            df = df.filter(self.where.col())
        df = df.select(
            *[e.col().alias(a) for a, e in self._grouping_inner()]
        )
        keys = [a for a, _ in self.group]
        if self.gkind == "gsets":
            df.createOrReplaceTempView("__fuzz_gsets")
            return spark.sql(
                f"SELECT {', '.join(self._grouping_select())} "
                f"FROM __fuzz_gsets GROUP BY {self._grouping_sets_sql()}"
            )
        aggcols = [F.grouping(a).alias(f"g_{a}") for a in keys]
        vi = 0
        for alias, agg, arg in self.aggs:
            if arg is None:
                aggcols.append(F.count(F.lit(1)).alias(alias))
            else:
                aggcols.append(getattr(F, agg)(f"v{vi}").alias(alias))
                vi += 1
        grouped = df.rollup(*keys) if self.gkind == "rollup" else (
            df.cube(*keys)
        )
        return grouped.agg(*aggcols)

    # ---- Spark side
    def to_df(self, spark, sdfs):
        from pyspark.sql import functions as F

        if self.kind in ("grouping", "join_grouping"):
            return self._grouping_df(spark, sdfs)

        if self.kind == "pivot":
            (kalias, kexpr), = self.group
            (_, agg, arg), = self.aggs
            df = _prefix(sdfs[self.tables[0]], "s0_")
            if self.where is not None:
                df = df.filter(self.where.col())
            return (
                df.groupBy(kexpr.col().alias(kalias))
                .pivot("s0_d_str", self.pivot_values)
                .agg(_agg_col(F, agg, arg))
            )

        if self.kind == "unpivot":
            df = _prefix(sdfs[self.tables[0]], "s0_")
            if self.where is not None:
                df = df.filter(self.where.col())
            base = df.select(
                *[e.col().alias(a) for a, e in self.projections]
            )
            return base.unpivot(
                [self.projections[0][0]],
                [a for a, _ in self.projections[1:]],
                "var", "val",
            )

        if self.kind == "join3":
            hows, keys = self.join
            d0 = _prefix(sdfs[self.tables[0]], "s0_")
            d1 = _prefix(sdfs[self.tables[1]], "s1_")
            d2 = _prefix(sdfs[self.tables[2]], "s2_")
            df = d0.join(d1, d0[f"s0_{keys[0]}"] == d1[f"s1_{keys[0]}"],
                         hows[0])
            df = df.join(d2, df[f"s1_{keys[1]}"] == d2[f"s2_{keys[1]}"],
                         hows[1])
        elif self.join:
            how, key = self.join
            d0 = _prefix(sdfs[self.tables[0]], "s0_")
            d1 = _prefix(sdfs[self.tables[1]], "s1_")
            if self.nullsafe:
                cond = d0[f"s0_{key}"].eqNullSafe(d1[f"s1_{key}"])
            else:
                cond = d0[f"s0_{key}"] == d1[f"s1_{key}"]
            if self.on_extra is not None:
                cond = cond & self.on_extra.col()
            spark_how = {"semi": "left_semi", "anti": "left_anti"}.get(how, how)
            df = d0.join(d1, cond, spark_how)
        else:
            df = _prefix(sdfs[self.tables[0]], "s0_")
        if self.where is not None:
            df = df.filter(self.where.col())
        if self.group is not None:
            gcols = [e.col().alias(a) for a, e in self.group]
            aggcols = [_agg_col(F, agg, arg).alias(a)
                       for a, agg, arg in self.aggs]
            df = df.groupBy(*gcols).agg(*aggcols)
        else:
            pcols = [e.col().alias(a) for a, e in self.projections]
            pcols += [_win_col(F, spec).alias(a)
                      for a, spec in (self.window or [])]
            df = df.select(*pcols)
        if self.having is not None:
            df = df.filter(self.having.col())
        if self.union is not None:
            proj_b, where_b = self.union
            d1 = _prefix(sdfs[self.tables[1]], "s0_")
            if where_b is not None:
                d1 = d1.filter(where_b.col())
            rhs = d1.select(*[e.col().alias(a) for a, e in proj_b])
            df = {
                "union_all": df.unionAll,
                "intersect": df.intersect,
                "intersect_all": df.intersectAll,
                "except": df.subtract,          # EXCEPT (distinct)
                "except_all": df.exceptAll,
            }[self.setop](rhs)
        if self.distinct:
            df = df.distinct()
        if self.order is not None:
            df = df.orderBy(*[e.col().asc() if asc else e.col().desc()
                              for e, asc in self.order])
        if self.limit is not None:
            df = df.limit(self.limit)
        return df


def _prefix(df, p):
    return df.select([df[c].alias(f"{p}{c}") for c in df.columns])


def _agg_sql(agg: str, arg) -> str:
    if agg == "count_star":
        return "count(*)"
    if agg == "avg_int":
        return f"avg({arg.sql()})"
    if agg == "dsum":
        return (f"CAST(SUM(CAST({arg.sql()} AS DECIMAL(38,6))) "
                f"AS DOUBLE)")
    if agg == "davg":
        return (f"(CAST(SUM(CAST({arg.sql()} AS DECIMAL(38,6))) "
                f"AS DOUBLE) / COUNT({arg.sql()}))")
    return f"{agg}({arg.sql()})"


def _agg_col(F, agg: str, arg):
    if agg == "count_star":
        return F.count(F.lit(1))
    if agg == "avg_int":
        return F.avg(arg.col())
    if agg in ("dsum", "davg"):
        from lcr_etl_upgrade_spark.functions.numeric import davg, dsum

        return (dsum if agg == "dsum" else davg)(arg.col())
    return getattr(F, agg)(arg.col())


def _frame_bound_sql(v, is_lo: bool) -> str:
    if v is None:
        return "UNBOUNDED PRECEDING" if is_lo else "UNBOUNDED FOLLOWING"
    if v == 0:
        return "CURRENT ROW"
    return f"{-v} PRECEDING" if v < 0 else f"{v} FOLLOWING"


def _win_sql(spec) -> str:
    kind, part, order_sql = spec["kind"], spec["part"], spec["order_sql"]
    over = f"PARTITION BY {part.sql()}"
    if order_sql is not None:
        over += f" ORDER BY {order_sql}"
    if kind == "frame_agg":
        frame = (f"{spec['mode'].upper()} BETWEEN "
                 f"{_frame_bound_sql(spec['lo'], True)} AND "
                 f"{_frame_bound_sql(spec['hi'], False)}")
        if spec["agg"] == "dsum":
            return (f"CAST(SUM(CAST({spec['arg'].sql()} AS "
                    f"DECIMAL(38,6))) OVER ({over} {frame}) AS DOUBLE)")
        return f"{spec['agg']}({spec['arg'].sql()}) OVER ({over} {frame})"
    if kind == "row_number":
        return f"row_number() OVER ({over})"
    if kind == "sum_part":
        return f"sum({spec['arg'].sql()}) OVER ({over})"
    if kind == "lag":
        return f"lag({spec['arg'].sql()}) OVER ({over})"
    raise ValueError(kind)


def _win_col(F, spec):
    from pyspark.sql.window import Window

    kind, part = spec["kind"], spec["part"]
    w = Window.partitionBy(part.col())
    if spec["order_cols"] is not None:
        w = w.orderBy(*spec["order_cols"]())
    if kind == "frame_agg":
        lo = Window.unboundedPreceding if spec["lo"] is None else spec["lo"]
        hi = Window.unboundedFollowing if spec["hi"] is None else spec["hi"]
        w = w.rowsBetween(lo, hi) if spec["mode"] == "rows" else (
            w.rangeBetween(lo, hi)
        )
        if spec["agg"] == "dsum":  # the ENGINE's windowed exact sum
            from lcr_etl_upgrade_spark.functions.numeric import dsum_over

            return dsum_over(spec["arg"].col(), w)
        return getattr(F, spec["agg"])(spec["arg"].col()).over(w)
    if kind == "row_number":
        return F.row_number().over(w)
    if kind == "sum_part":
        return F.sum(spec["arg"].col()).over(w)
    if kind == "lag":
        return F.lag(spec["arg"].col()).over(w)
    raise ValueError(kind)


ALL_KINDS = ["filter_project", "agg", "join", "orderby_limit", "distinct",
             "window", "join_agg", "union_all", "having", "join3",
             "agg_orderby", "grouping", "setop", "window_frame",
             "join_nullsafe", "join_grouping", "pivot", "unpivot",
             "json_extract", "join_onfilter"]

# pivot value pool: same alphabet as d_str's data, so sampled lists mix
# PRESENT values (real cells) and ABSENT ones (all-NULL columns); all
# lowercase-distinct (the comparator lowercases column names, so a
# case-colliding pair like 'a'/'A' would pair ambiguously)
_PIVOT_POOL = ["a", "b", "c", "x", "y", "z", "ab", "xy", "zz", "abc",
               "qqqq"]

_JSON_PATHS = ["$.a", "$.b.c", "$.b.d[0]", "$.b.d[1]", "$.b.d[2]",
               "$.arr[0]", "$.arr[1]", "$.arr[3]", "$.missing",
               "$.b.missing"]


def _json_extract(path: str) -> E:
    """get_json_object vs json_extract_string: scalar extraction parity
    probed exhaustively (numbers NORMALIZE identically in both — 1.50 ->
    '1.5', 1e2 -> '100.0'; quotes/escapes/unicode/empty-string equal;
    missing paths and JSON nulls -> NULL). Malformed documents: Spark
    degrades to NULL, DuckDB THROWS -> the oracle guards with
    json_valid(). Paths stay scalar-valued (object/array extraction
    would compare engine re-rendering, not semantics) and dot-simple
    (quoted-key syntax diverges: Spark $['k'] vs DuckDB $.\"k\")."""
    return E(
        STR,
        lambda: ("CASE WHEN json_valid(s0_g_json) THEN "
                 f"json_extract_string(s0_g_json, '{path}') END"),
        lambda: _F().get_json_object(_F().col("s0_g_json"), path),
    )


def gen_case(rng: np.random.Generator, kinds=None) -> Case:
    pool = kinds or ALL_KINDS
    kind = pool[int(rng.integers(0, len(pool)))]
    t0 = f"t{int(rng.integers(0, 3))}"

    if kind == "pivot":
        g = Gen(rng, ["s0_"])
        kexpr = g.expr(g.pick([INT, STR]), 1)
        agg = g.pick(["sum", "min", "max", "count_star"])
        arg = None if agg == "count_star" else g.expr(INT, 1)
        n_vals = int(rng.integers(2, 5))
        idx = rng.choice(len(_PIVOT_POOL), size=n_vals, replace=False)
        values = [_PIVOT_POOL[i] for i in sorted(idx)]
        where = g.expr(BOOL, 2) if rng.random() < 0.5 else None
        return Case(kind, [t0], [], where=where,
                    group=[("k0", kexpr)], aggs=[("a0", agg, arg)],
                    pivot_values=values)

    if kind == "unpivot":
        g = Gen(rng, ["s0_"])
        projections = [("p0", col_ref("id", "s0_"))]
        for i in range(int(rng.integers(1, 4))):
            projections.append((f"v{i}", g.expr(INT, 2)))
        where = g.expr(BOOL, 2) if rng.random() < 0.5 else None
        return Case(kind, [t0], projections, where=where)

    if kind == "json_extract":
        g = Gen(rng, ["s0_"])
        projections = [("p0", col_ref("id", "s0_"))]
        n_paths = int(rng.integers(1, 4))
        for i in range(n_paths):
            projections.append(
                (f"j{i}",
                 _json_extract(g.pick(_JSON_PATHS)))
            )
        where = None
        if rng.random() < 0.4:
            jx = _json_extract(g.pick(_JSON_PATHS))
            where = E(
                BOOL,
                lambda jx=jx: f"({jx.sql()}) IS NOT NULL",
                lambda jx=jx: jx.col().isNotNull(),
            )
        return Case(kind, [t0], projections, where=where)

    if kind == "grouping":
        # rollup / cube / grouping sets with per-key GROUPING() flags
        # (the flags disambiguate a NULL data key from a superaggregate
        # NULL; single-argument GROUPING() is 0/1 in both engines,
        # where multi-arg GROUPING_ID bit order would diverge)
        g = Gen(rng, ["s0_"])
        n_keys = int(rng.integers(1, 3))
        group = [(f"k{i}", g.expr(g.pick([INT, STR]), 1))
                 for i in range(n_keys)]
        aggs = [("a0", "count_star", None)]
        if rng.random() < 0.7:
            aggs.append(("a1", g.pick(["sum", "min", "max"]),
                         g.expr(INT, 1)))
        # EMPTY-INPUT TRAP: a WHERE can filter everything out, and on
        # empty input Spark's Expand-based grouping yields 0 rows for
        # the grand-total set () where DuckDB (per the SQL standard)
        # yields 1 — verified both ways. So: rollup/cube/sets-with-()
        # run UNfiltered (tables are non-empty by construction), and a
        # filtered case degrades to GROUPING SETS without ().
        where = g.expr(BOOL, 2) if rng.random() < 0.5 else None
        gkind = g.pick(["rollup", "cube", "gsets"])
        gsets = None
        if where is not None:
            gkind = "gsets"
        if gkind == "gsets":
            from itertools import chain, combinations

            keys = [a for a, _ in group]
            min_r = 1 if where is not None else 0
            subsets = list(chain.from_iterable(
                combinations(keys, r)
                for r in range(min_r, len(keys) + 1)
            ))
            take = int(rng.integers(1, len(subsets) + 1))
            idx = rng.choice(len(subsets), size=take, replace=False)
            gsets = [subsets[i] for i in sorted(idx)]
        return Case(kind, [t0], [], where=where, group=group, aggs=aggs,
                    gkind=gkind, gsets=gsets)

    if kind == "join_grouping":
        # GROUPING SETS over a JOIN result — the interaction shape.
        # Always ()-free sets: an inner/full join CAN legitimately come
        # up empty (unlike the non-empty base tables), which would hit
        # the empty-input grand-total trap documented above.
        t1 = f"t{int(rng.integers(0, 3))}"
        g = Gen(rng, ["s0_", "s1_"])
        how = g.pick(["inner", "left", "full"])
        key = g.pick(["a_int", "b_int", "d_str"])
        n_keys = int(rng.integers(1, 3))
        group = [(f"k{i}", g.expr(g.pick([INT, STR]), 1))
                 for i in range(n_keys)]
        aggs = [("a0", "count_star", None)]
        if rng.random() < 0.7:
            aggs.append(("a1", g.pick(["sum", "min", "max"]),
                         g.expr(INT, 1)))
        from itertools import chain, combinations

        keys = [a for a, _ in group]
        subsets = list(chain.from_iterable(
            combinations(keys, r) for r in range(1, len(keys) + 1)
        ))
        take = int(rng.integers(1, len(subsets) + 1))
        idx = rng.choice(len(subsets), size=take, replace=False)
        gsets = [subsets[i] for i in sorted(idx)]
        where = g.expr(BOOL, 2) if rng.random() < 0.4 else None
        return Case(kind, [t0, t1], [], where=where, group=group,
                    aggs=aggs, join=(how, key), gkind="gsets",
                    gsets=gsets)

    if kind == "setop":
        t1 = f"t{int(rng.integers(0, 3))}"
        g = Gen(rng, ["s0_"])
        n_proj = int(rng.integers(1, 3))
        types = [g.pick([INT, STR, BOOL]) for _ in range(n_proj)]
        p_a = [(f"p{i}", g.expr(t, 2)) for i, t in enumerate(types)]
        p_b = [(f"p{i}", g.expr(t, 2)) for i, t in enumerate(types)]
        w_a = g.expr(BOOL, 2) if rng.random() < 0.5 else None
        w_b = g.expr(BOOL, 2) if rng.random() < 0.5 else None
        setop = g.pick(["intersect", "intersect_all", "except",
                        "except_all"])
        return Case(kind, [t0, t1], p_a, where=w_a, union=(p_b, w_b),
                    setop=setop)

    if kind == "window_frame":
        g = Gen(rng, ["s0_"])
        part = g.column(g.pick([INT, STR]))
        agg = g.pick(["sum", "min", "max", "count", "dsum"])
        spec = {
            "kind": "frame_agg", "part": part,
            "agg": agg,
            "arg": g.expr(DBL if agg == "dsum" else INT, 1),
            "mode": g.pick(["rows", "range"]),
        }
        if spec["mode"] == "rows":
            # total order (id tiebreak) makes ROWS frames deterministic
            oexpr = g.expr(INT, 1)
            spec["order_sql"] = (f"{oexpr.sql()} ASC NULLS FIRST, "
                                 f"s0_id ASC NULLS FIRST")
            spec["order_cols"] = lambda oe=oexpr: [
                oe.col().asc(), col_ref("id", "s0_").col().asc()]
        else:
            # RANGE: single NON-NULL numeric key — null rows' offset
            # frames are engine-subtle, and coalesce keeps both engines
            # looking at identical data (peer groups handle ties)
            base = g.expr(INT, 1)
            oexpr = fn("coalesce", INT,
                       [base, lit_int(int(rng.integers(-3, 4)))])
            spec["order_sql"] = f"{oexpr.sql()} ASC"
            spec["order_cols"] = lambda oe=oexpr: [oe.col().asc()]
        lo = g.pick([None, -3, -2, -1, 0, 1])
        his = [None] + [v for v in (-2, -1, 0, 1, 2, 3)
                        if lo is None or v >= lo]
        spec["lo"], spec["hi"] = lo, g.pick(his)
        projections = [("p0", col_ref("id", "s0_")),
                       ("p1", g.expr(g.pick([INT, STR]), 1))]
        return Case(kind, [t0], projections, window=[("w0", spec)])

    if kind == "join_nullsafe":
        t1 = f"t{int(rng.integers(0, 3))}"
        g = Gen(rng, ["s0_", "s1_"])
        how = g.pick(["inner", "left", "full"])
        key = g.pick(["a_int", "b_int", "d_str"])
        projections = [
            (f"p{i}", g.expr(g.pick([INT, STR, BOOL]), 2))
            for i in range(int(rng.integers(1, 4)))
        ]
        where = g.expr(BOOL, 2) if rng.random() < 0.5 else None
        return Case(kind, [t0, t1], projections, where=where,
                    join=(how, key), nullsafe=True)

    if kind == "join3":
        # three-table chain: (t0 J t1) J t2, independent join types/keys
        t1 = f"t{int(rng.integers(0, 3))}"
        t2 = f"t{int(rng.integers(0, 3))}"
        g = Gen(rng, ["s0_", "s1_", "s2_"])
        hows = [g.pick(["inner", "left", "right", "full"])
                for _ in range(2)]
        keys = [g.pick(["a_int", "b_int", "d_str"]) for _ in range(2)]
        projections = [
            (f"p{i}", g.expr(g.pick([INT, DBL, STR, BOOL]), 2))
            for i in range(int(rng.integers(1, 4)))
        ]
        where = g.expr(BOOL, 2) if rng.random() < 0.5 else None
        return Case(kind, [t0, t1, t2], projections, where=where,
                    join=(hows, keys))

    if kind == "agg_orderby":
        # agg -> ORDER BY the (unique) group keys -> LIMIT: deterministic
        # because the key combination is unique per output row
        g = Gen(rng, ["s0_"])
        n_keys = int(rng.integers(1, 3))
        group = [(f"k{i}", g.expr(g.pick([INT, STR]), 1))
                 for i in range(n_keys)]
        aggs = [("a0", "count_star", None),
                ("a1", g.pick(["sum", "min", "max"]), g.expr(INT, 1))]
        where = g.expr(BOOL, 2) if rng.random() < 0.5 else None

        def alias_ref(name):
            return E(INT, lambda n=name: n, lambda n=name: _F().col(n))

        order = [(alias_ref(a), bool(rng.integers(0, 2)))
                 for a, _ in group]
        return Case(kind, [t0], [], where=where, group=group, aggs=aggs,
                    order=order, limit=int(rng.integers(1, 20)))

    if kind == "join_onfilter":
        # Extra predicate INSIDE an outer/semi/anti join's ON clause —
        # the q13 shape, and the classic semantics trap: an ON-filter
        # on the non-preserved side changes which rows MATCH but never
        # drops a preserved-side row (it NULL-pads instead), where the
        # same predicate in WHERE would drop it. Both engines must
        # agree on the preserved-row set and the NULL padding.
        t1 = f"t{int(rng.integers(0, 3))}"
        g = Gen(rng, ["s0_", "s1_"])
        how = g.pick(["left", "right", "full", "semi", "anti"])
        key = g.pick(["a_int", "b_int", "d_str"])
        # the extra term targets the non-preserved side (both for full;
        # for semi/anti the right side is visible inside ON only)
        side = {"left": ["s1_"], "right": ["s0_"]}.get(how, ["s0_", "s1_"])
        if how in ("semi", "anti"):
            side = ["s1_"]
        on_extra = Gen(rng, side).expr(BOOL, 2)
        if how in ("semi", "anti"):
            g = Gen(rng, ["s0_"])  # only left side visible downstream
        n_proj = int(rng.integers(1, 4))
        projections = [
            (f"p{i}", g.expr(g.pick([INT, DBL, STR, BOOL]), 2))
            for i in range(n_proj)
        ]
        where = g.expr(BOOL, 2) if rng.random() < 0.5 else None
        return Case(kind, [t0, t1], projections, where=where,
                    join=(how, key), on_extra=on_extra)

    if kind in ("join", "join_agg"):
        t1 = f"t{int(rng.integers(0, 3))}"
        g = Gen(rng, ["s0_", "s1_"])
        how = g.pick(["inner", "left", "right", "full", "semi", "anti"])
        key = g.pick(["a_int", "b_int", "d_str"])
        if how in ("semi", "anti"):
            g = Gen(rng, ["s0_"])  # only left side visible
        where = g.expr(BOOL, 2) if rng.random() < 0.5 else None
        if kind == "join_agg":
            # aggregate OVER the join result: the composition the frozen
            # registry exercises one shape of (q3/q5) and the fuzzer can
            # now vary freely
            group = [(f"k{i}", g.expr(g.pick([INT, STR, BOOL]), 1))
                     for i in range(int(rng.integers(1, 3)))]
            aggs = [("a0", "count_star", None),
                    ("a1", g.pick(["sum", "avg_int"]), g.expr(INT, 1))]
            return Case(kind, [t0, t1], [], where=where, group=group,
                        aggs=aggs, join=(how, key))
        n_proj = int(rng.integers(1, 4))
        projections = [
            (f"p{i}", g.expr(g.pick([INT, DBL, STR, BOOL]), 2))
            for i in range(n_proj)
        ]
        return Case(kind, [t0, t1], projections, where=where,
                    join=(how, key))

    if kind == "union_all":
        t1 = f"t{int(rng.integers(0, 3))}"
        g = Gen(rng, ["s0_"])
        n_proj = int(rng.integers(1, 3))
        types = [g.pick([INT, STR, BOOL]) for _ in range(n_proj)]
        p_a = [(f"p{i}", g.expr(t, 2)) for i, t in enumerate(types)]
        p_b = [(f"p{i}", g.expr(t, 2)) for i, t in enumerate(types)]
        w_a = g.expr(BOOL, 2) if rng.random() < 0.5 else None
        w_b = g.expr(BOOL, 2) if rng.random() < 0.5 else None
        return Case(kind, [t0, t1], p_a, where=w_a,
                    union=(p_b, w_b))

    if kind == "having":
        g = Gen(rng, ["s0_"])
        group = [("k0", g.expr(g.pick([INT, STR]), 1))]
        aggs = [("a0", "count_star", None),
                ("a1", g.pick(["min", "max"]), g.expr(INT, 1))]
        where = g.expr(BOOL, 2) if rng.random() < 0.5 else None
        # HAVING over the aggregate outputs (rendered post-agg filter on
        # the Spark side - the same plan Spark gives HAVING)
        hv_op = g.pick([">", ">=", "<", "<=", "==", "!="])
        hv_lit = int(rng.integers(0, 6))
        hv_ref = E(INT, lambda: "a0", lambda: _F().col("a0"))
        having = binop(hv_op, BOOL, hv_ref, lit_int(hv_lit))
        return Case(kind, [t0], [], where=where, group=group, aggs=aggs,
                    having=having)

    g = Gen(rng, ["s0_"])
    if kind == "agg":
        n_keys = int(rng.integers(1, 3))
        group = [(f"k{i}", g.expr(g.pick([INT, STR, BOOL, DATE]), 1))
                 for i in range(n_keys)]
        n_aggs = int(rng.integers(1, 4))
        aggs = []
        for i in range(n_aggs):
            a = g.pick(["sum", "count", "count_star", "min", "max",
                        "avg_int", "min", "max", "dsum", "davg"])
            if a == "count_star":
                aggs.append((f"a{i}", a, None))
            elif a in ("sum", "avg_int"):
                aggs.append((f"a{i}", a, g.expr(INT, 1)))
            elif a in ("dsum", "davg"):  # the ENGINE's deterministic
                aggs.append((f"a{i}", a, g.expr(DBL, 1)))  # double aggs
            else:  # count/min/max over any type
                aggs.append((f"a{i}", a,
                             g.expr(g.pick([INT, DBL, STR, DATE]), 1)))
        where = g.expr(BOOL, 2) if rng.random() < 0.5 else None
        return Case(kind, [t0], [], where=where, group=group, aggs=aggs)

    if kind == "orderby_limit":
        projections = [("p0", col_ref("id", "s0_"))]
        for i in range(int(rng.integers(1, 3))):
            projections.append(
                (f"p{i+1}", g.expr(g.pick([INT, DBL, STR, DATE]), 2)))
        # Order by the projected ALIASES: ordering by pre-projection
        # expressions fails to resolve after the select on the Spark
        # side, and a literal in ORDER BY is an ordinal to DuckDB.
        def alias_ref(name):
            return E(INT, lambda: name, lambda: _F().col(name))

        order = [(alias_ref(a), bool(rng.integers(0, 2)))
                 for a, _ in projections[1:]]
        order.append((alias_ref("p0"), True))  # unique id tiebreak
        return Case(kind, [t0], projections, order=order,
                    limit=int(rng.integers(1, 30)))

    if kind == "distinct":
        projections = [
            (f"p{i}", g.expr(g.pick([INT, STR, BOOL]), 1))
            for i in range(int(rng.integers(1, 3)))
        ]
        where = g.expr(BOOL, 2) if rng.random() < 0.5 else None
        return Case(kind, [t0], projections, where=where, distinct=True)

    if kind == "window":
        part = g.column(g.pick([INT, STR]))
        wkind = g.pick(["row_number", "sum_part", "lag"])
        spec = {"kind": wkind, "part": part}
        if wkind == "sum_part":
            spec["arg"] = g.expr(INT, 1)
            spec["order_sql"] = None
            spec["order_cols"] = None
        else:
            if wkind == "lag":
                spec["arg"] = g.expr(g.pick([INT, STR]), 1)
            oexpr = g.expr(INT, 1)
            # id tiebreak makes row_number/lag deterministic
            spec["order_sql"] = (f"{oexpr.sql()} ASC NULLS FIRST, "
                                 f"s0_id ASC NULLS FIRST")
            spec["order_cols"] = lambda oe=oexpr: [
                oe.col().asc(), col_ref("id", "s0_").col().asc()]
        projections = [("p0", col_ref("id", "s0_")),
                       ("p1", g.expr(g.pick([INT, STR]), 1))]
        return Case(kind, [t0], projections, window=[("w0", spec)])

    # filter_project
    projections = [
        (f"p{i}", g.expr(g.pick([INT, DBL, STR, BOOL, DATE]), 3))
        for i in range(int(rng.integers(1, 5)))
    ]
    where = g.expr(BOOL, 3) if rng.random() < 0.7 else None
    return Case(kind, [t0], projections, where=where)


# --------------------------------------------------------------- execution


def run_case(case: Case, spark, sdfs, con) -> dict | None:
    """Returns None on match, a mismatch record otherwise."""
    try:
        df = case.to_df(spark, sdfs)
        srows = df.collect()
        scols = df.columns
    except Exception as exc:
        return {"side": "spark_error", "err": repr(exc)[:400]}
    try:
        res = con.execute(case.to_sql())
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    except Exception as exc:
        return {"side": "duckdb_error", "err": repr(exc)[:400]}
    def _no_negzero(rows):
        # engine quirk, verified: DuckDB's abs() on a computed DOUBLE
        # returns -0.0 for -0.0 (x < 0 ? -x : x), Spark's Math.abs
        # clears the sign bit - and -0.0 == 0.0 everywhere else, so
        # the sign of zero is presentation, not semantics
        return [
            tuple("0.0" if v == "-0.0" else v for v in row) for row in rows
        ]

    s_norm, s_cols = frame_to_rows([tuple(r) for r in srows], scols)
    o_norm, o_cols = frame_to_rows(orows, ocols)
    # normalize THEN re-sort: frame_to_rows sorted before normalization,
    # and '-0.0' -> '0.0' can change a row's sort position, which would
    # fire a spurious order divergence on semantically identical rows
    s_norm, o_norm = sorted(_no_negzero(s_norm)), sorted(_no_negzero(o_norm))
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
                "spark": s_norm[diff_idx] if diff_idx < len(s_norm) else None,
                "duckdb": o_norm[diff_idx] if diff_idx < len(o_norm) else None,
            },
        }
    return None


def minimize(case: Case, spark, sdfs, con) -> Case:
    """Greedy shrink: still-failing variants with fewer moving parts."""

    def fails(c):
        return run_case(c, spark, sdfs, con) is not None

    import copy

    changed = True
    while changed:
        changed = False
        # strip LIMIT / ORDER / WHERE / DISTINCT / HAVING / UNION.
        # ORDER and LIMIT strip TOGETHER: LIMIT without ORDER BY is
        # nondeterministic, so a kept-LIMIT variant would "fail" on
        # arbitrary row choice and lock in a spurious repro.
        if case.order is not None:
            c = copy.copy(case)
            c.order, c.limit = None, None
            if fails(c):
                case = c
                changed = True
        for attr, val in (("limit", None), ("where", None),
                          ("distinct", False), ("having", None),
                          ("union", None), ("on_extra", None)):
            if getattr(case, attr):
                c = copy.copy(case)
                setattr(c, attr, val)
                if fails(c):
                    case = c
                    changed = True
        # drop projection / agg members (keep at least one)
        for attr in ("projections", "aggs", "group", "window"):
            items = getattr(case, attr)
            if items and len(items) > 1:
                for i in range(len(items)):
                    c = copy.copy(case)
                    setattr(c, attr, items[:i] + items[i + 1:])
                    if fails(c):
                        case = c
                        changed = True
                        break
        # unwrap WHERE into a child boolean
        if case.where is not None:
            for ch in case.where.children:
                if ch.typ == BOOL:
                    c = copy.copy(case)
                    c.where = ch
                    if fails(c):
                        case = c
                        changed = True
                        break
    return case


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seed", type=int, default=20260815)
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--rows", type=int, default=300)
    ap.add_argument("--kinds", type=str, default=None,
                    help="comma-separated case kinds to generate "
                         "(default: all of ALL_KINDS)")
    ap.add_argument("--case", type=int, default=None,
                    help="run only case index I (for repro)")
    args = ap.parse_args()

    import duckdb

    from lcr_etl_upgrade_spark.session import get_session

    spark = get_session("query_fuzz")
    data_rng = np.random.default_rng(args.seed)
    tables = make_tables(data_rng, args.rows)
    con = duckdb.connect()
    sdfs = {}
    for name, pdf in tables.items():
        con.register(name, pdf)
        sdfs[name] = spark.createDataFrame(
            pdf.astype(object).where(pdf.notna(), None), _SPARK_SCHEMA
        ).cache()
        sdfs[name].count()

    failures = []
    for i in range(args.n):
        if args.case is not None and i != args.case:
            continue  # each case seeds its own rng from (seed, i)
        case_rng = np.random.default_rng(args.seed * 1_000_003 + i)
        kinds = args.kinds.split(",") if args.kinds else None
        case = gen_case(case_rng, kinds=kinds)
        rec = run_case(case, spark, sdfs, con)
        if args.case is not None:
            print("SQL :", case.to_sql())
        if rec is not None:
            small = minimize(case, spark, sdfs, con)
            failures.append({
                "i": i, "kind": case.kind, **rec,
                "sql": case.to_sql(),
                "minimized_sql": small.to_sql(),
            })
            print(f"FAIL case {i}: {json.dumps(failures[-1])[:600]}",
                  file=sys.stderr)
    print(json.dumps({
        "seed": args.seed, "n": args.n, "rows": args.rows,
        "failures": failures, "ok": not failures,
    }))
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
