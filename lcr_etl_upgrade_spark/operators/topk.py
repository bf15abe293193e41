"""Per-group top-k (W1 surface, SURVEY.md §2.8) as a reusable operator
with an explicit scale strategy.

Two strategies, both exact and hash-identical:

- ``window`` (default): one ranking-window pass — ``row_number`` over
  ``partitionBy(group)``, filter ``<= k``. The exchange carries every
  input row. MEASURED fastest on local[32] at 1x AND 100x in both group
  regimes (see SCALE.md "topk strategy experiment"): with an in-memory
  shuffle, the exchange is cheaper than any Python-side pruning pass.
- ``prefilter``: a per-Arrow-batch partial top-k (``mapInArrow`` +
  pyarrow C++ sort + vectorized numpy run-length ranking, never per-row
  Python) runs BEFORE the window as a narrow map stage, so the exchange
  carries at most k rows per group per input batch — map-side combine
  applied to top-k, which no built-in Spark aggregate expresses
  (``max_by`` has no k-arg in Spark 4.1). MEASURED to cut exchange input
  ~30x in the big-group regime (100x rows per group: 15M -> ~0.5M rows)
  while LOSING wall-clock locally (3.2s -> 5.7s — the Arrow crossing
  costs more than the in-memory shuffle it saves). On a real cluster
  where the exchange is network+disk, that trade inverts; this is the
  strategy a 1000-executor 100 TB job with large groups should pick.

Exactness of the prune: any row in the global top-k of its group is in
the top-k of every subset containing it, so a per-batch prune under the
SAME ordering can never drop a winner. Rows with NULL in any order-by
column are always kept by the prune (conservative superset), so Spark's
NULLS FIRST/LAST semantics are decided only by the final window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _order_columns(order_by: list[tuple[str, bool]]) -> list[Column]:
    return [
        F.col(c).asc() if asc else F.col(c).desc() for c, asc in order_by
    ]


def topk_per_group(
    df: DataFrame,
    group_cols: list[str] | tuple[str, ...],
    order_by: list[tuple[str, bool]],
    k: int,
    strategy: str = "window",
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the top ``k`` rows of each group under ``order_by``
    (``[(column, ascending), ...]``). ``rank_col`` optionally exposes the
    1-based rank. Ties broken by the order spec itself — make it total
    (include a unique key) for deterministic results."""
    group_cols = list(group_cols)
    w = W.partitionBy(*group_cols).orderBy(*_order_columns(order_by))

    def ranked(d: DataFrame) -> DataFrame:
        name = rank_col or "__topk_rn"
        out = d.withColumn(name, F.row_number().over(w)).filter(
            F.col(name) <= k
        )
        return out if rank_col else out.drop(name)

    if strategy == "window":
        return ranked(df)
    if strategy != "prefilter":
        raise ValueError(
            f"strategy must be window|prefilter, got {strategy!r}"
        )

    schema = df.schema
    names = [f.name for f in schema.fields]
    missing = [c for c, _ in order_by if c not in names] + [
        c for c in group_cols if c not in names
    ]
    if missing:
        raise ValueError(f"columns {missing} not in DataFrame {names}")
    sort_keys = [(c, "ascending") for c in group_cols] + [
        (c, "ascending" if asc else "descending") for c, asc in order_by
    ]
    order_names = [c for c, _ in order_by]
    kk = k

    def local_topk(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            idx = pc.sort_indices(b, sort_keys=sort_keys).to_numpy()
            idx_arr = pa.array(idx)
            new_run = np.zeros(n, dtype=bool)
            new_run[0] = True
            if n > 1:
                for g in group_cols:
                    # compare adjacent sorted keys ARROW-side: converting
                    # an int64 column with nulls to numpy coerces to
                    # float64 and merges distinct keys above 2^53; a
                    # null-vs-anything comparison (null result) breaks
                    # the run conservatively
                    col = b.column(names.index(g)).take(idx_arr)
                    neq = pc.fill_null(
                        pc.invert(
                            pc.equal(col.slice(1), col.slice(0, n - 1))
                        ),
                        True,
                    ).to_numpy(zero_copy_only=False)
                    np.logical_or(new_run[1:], neq, out=new_run[1:])
            run_start = np.maximum.accumulate(
                np.where(new_run, np.arange(n), 0)
            )
            keep = (np.arange(n) - run_start) < kk
            # conservative: never prune rows with NULL order keys — their
            # global NULLS FIRST/LAST rank is the window's call, not ours
            null_mask = np.zeros(n, dtype=bool)
            for c in order_names:
                arr = b.column(names.index(c))
                if arr.null_count:
                    null_mask |= pc.is_null(arr).to_numpy(
                        zero_copy_only=False
                    )[idx]
            keep |= null_mask
            yield b.take(pa.array(idx[keep]))

    return ranked(df.mapInArrow(local_topk, schema))
