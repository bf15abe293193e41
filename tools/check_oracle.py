"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given SF dir, runs the
matching ``oracle_sql()`` in DuckDB over the same parquet (tables registered
as views), and compares row count, column names/kinds, and values
(column-name-sorted, row-sorted, exact — floats must match to the last
digit of a repr round-trip, which is stricter than any sane hasher).

Usage: python tools/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

``--json`` additionally writes a per-query artifact in the driver's
CORRECTNESS_r{N}.json shape (rows_match / schema_match / hash_match /
spark_rows / oracle_rows / err) so every registered query carries a
durable green row each round (committed as ORACLE_FULL_r{N}.json), not
just the driver-pinned subset.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(value):
    """Typed normalization: NULL, booleans and strings carry a type tag
    so cross-type collisions are impossible — the untyped version
    mapped SQL NULL and the literal string 'NULL' (and True vs 'true',
    5 vs '5') to the same token, letting a real engine divergence
    report PASS. Numeric/temporal values keep their exact old string
    forms (repr for floats — a full round-trip repr, stricter than any
    hasher)."""
    if value is None:
        return "\x00N"
    if isinstance(value, bool):
        return "\x00B:true" if value else "\x00B:false"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return repr(value)
    if isinstance(value, str):
        return "\x00S:" + value
    return str(value)


def frame_to_rows(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append(tuple(normalize(row[i]) for i in order))
    out.sort()
    return out, [columns[i] for i in order]


def _row(rows_match, schema_match, hash_match, spark_rows, oracle_rows, err):
    return {
        "rows_match": rows_match,
        "schema_match": schema_match,
        "hash_match": hash_match,
        "spark_rows": spark_rows,
        "oracle_rows": oracle_rows,
        "err": err,
    }


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: check_oracle.py [--json OUT.json] [sf_dir] [query ...]")
            return 2
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    report: dict[str, dict] = {}

    import __spark_entry__ as e
    from lcr_etl_upgrade_spark.session import get_session

    unknown = only - set(e.queries())
    if unknown:
        # a typo'd name used to run ZERO queries and still print
        # 'all queries match' with exit 0 — a green gate over nothing
        print(f"unknown query names: {sorted(unknown)}")
        return 2

    spark = get_session("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:
            failures.append(name)
            report[name] = _row(None, None, None, None, None, f"spark error: {exc}")
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            # rows-only checks are real checks, not free passes:
            # - zero rows on fixture data means the sketch path broke
            # - declared in-result CONTRACT columns (recall floors, HLL
            #   error bounds) must hold on every row — they existed
            #   precisely to make these queries checkable, so failing to
            #   check them made the contract decorative
            problems = []
            if len(srows) == 0:
                problems.append("zero rows on fixture data")
            for contract_col in ("meets_floor", "within_bound"):
                if contract_col in scols:
                    bad = sum(
                        1 for r in srows if r[contract_col] is not True
                    )
                    if bad:
                        problems.append(
                            f"{bad}/{len(srows)} rows violate {contract_col}"
                        )
            if problems:
                failures.append(name)
                msg = "; ".join(problems)
                report[name] = _row(
                    None, None, None, len(srows), None, f"rows-only: {msg}"
                )
                print(f"FAIL  {name}: rows-only: {msg}")
            else:
                print(
                    f"ok?   {name}: rows-only ({len(srows)} rows, "
                    f"{time.time()-t0:.1f}s)"
                )
                report[name] = _row(
                    None, None, None, len(srows), None, "no_oracle"
                )
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            failures.append(name)
            report[name] = _row(None, None, None, len(srows), None, f"duckdb error: {exc}")
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue

        s_norm, s_cols = frame_to_rows([tuple(r) for r in srows], scols)
        d_norm, d_cols = frame_to_rows(drows, dcols)
        status = []
        if len(s_norm) != len(d_norm):
            status.append(f"rowcount {len(s_norm)} vs {len(d_norm)}")
        if s_cols != d_cols:
            status.append(f"columns {s_cols} vs {d_cols}")
        if not status and s_norm != d_norm:
            n_bad = sum(1 for a, b in zip(s_norm, d_norm) if a != b)
            status.append(f"values differ in {n_bad}/{len(s_norm)} rows")
            for a, b in zip(s_norm, d_norm):
                if a != b:
                    print(f"      spark: {a}")
                    print(f"      duck : {b}")
                    break
        report[name] = _row(
            len(s_norm) == len(d_norm),
            s_cols == d_cols,
            s_norm == d_norm,
            len(s_norm),
            len(d_norm),
            "; ".join(status) or None,
        )
        if status:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(status)}")
        else:
            print(f"PASS  {name} ({len(s_norm)} rows, {time.time()-t0:.1f}s)")

    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(report, fh, indent=2)
        print(f"\nwrote {json_out} ({len(report)} queries)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {' '.join(failures)}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
