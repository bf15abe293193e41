"""Totality probe: run every registered query against degenerate twins
of the test tables — zero rows, and all-NULL nullable columns — and
report any query that raises instead of returning a (possibly empty)
DataFrame.

Why: at 100 TB a filter-to-nothing stage or an all-NULL column slice is
routine (partition pruning, late data, schema drift), and an operator
that crashes there takes the job down instead of degrading to an empty
result. This probe found three real crashes on first run (KMeans.fit on
an empty/all-NULL corpus, numpy axis errors on an empty query matrix) —
see operators/similarity.py.

Usage:
    python tools/totality_probe.py [src_sf_dir]    # default sf0.001

Exit code 0 iff every query completes on both twins.
"""

from __future__ import annotations

import glob
import os
import sys


def build_twins(src: str, base: str = "/tmp/spark_graft_twins") -> dict[str, str]:
    """Empty twin: same schemas, 0 rows. NULL twin: key-ish columns kept
    (joins still key), every other column NULL, 200 rows per table."""
    import duckdb

    twins = {"empty": f"{base}/empty", "nulls": f"{base}/nulls"}
    con = duckdb.connect()
    for kind, dst in twins.items():
        os.makedirs(dst, exist_ok=True)
        for f in sorted(glob.glob(f"{src}/*.parquet")):
            name = os.path.basename(f)
            if kind == "empty":
                sel, limit = "*", 0
            else:
                cols = con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet('{f}')"
                ).fetchall()
                parts = []
                for cname, ctype, *_ in cols:
                    lc = cname.lower()
                    if lc.endswith("key") or lc.endswith("_id") or lc in (
                        "doc_id",
                        "vec_id",
                    ):
                        parts.append(f'"{cname}"')
                    else:
                        parts.append(f'CAST(NULL AS {ctype}) AS "{cname}"')
                sel, limit = ", ".join(parts), 200
            con.execute(
                f"COPY (SELECT {sel} FROM read_parquet('{f}') LIMIT {limit}) "
                f"TO '{dst}/{name}' (FORMAT PARQUET)"
            )
    con.close()
    return twins


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    twins = build_twins(src)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    queries = entry.queries()
    failures = 0
    for kind, sf_dir in twins.items():
        for name, fn in sorted(queries.items()):
            try:
                fn(spark, sf_dir).collect()
            except Exception as exc:  # noqa: BLE001 — the probe's whole point
                failures += 1
                # splitlines() of an EMPTY message is [] — indexing it
                # would crash the probe mid-sweep instead of recording
                lines = str(exc).splitlines()
                first = (lines[0] if lines else type(exc).__name__)[:160]
                print(f"FAIL [{kind}] {name}: {first}", flush=True)
    print(f"totality: {len(queries)} queries x {len(twins)} twins, "
          f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
