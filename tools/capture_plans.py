"""Capture .explain("formatted") for headline queries into plans/<round>/
(round from $SPARK_GRAFT_PLAN_ROUND, default r14).

Usage: python tools/capture_plans.py <suffix> [query ...]
  suffix: "before" or "after" (file name becomes <query>_<suffix>.txt)
  query:  optional subset; default = bench.py HEADLINE list.

Plans are captured at the bench SF dir ($SPARK_GRAFT_SF_DIR, default
/root/testdata/sf0.1) on the same session configuration bench.py uses, so
the committed plan text is the plan the bench actually timed (modulo AQE
final re-planning, which explain() cannot show pre-execution).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    import bench
    from lcr_etl_upgrade_spark.plans import QUERIES
    from lcr_etl_upgrade_spark.session import get_session

    names = sys.argv[2:] or bench.HEADLINE
    spark = get_session(
        "capture_plans", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    rnd = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        rnd,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
