"""Stream-stream and stream-static joins (SURVEY.md §2.10 [EXT]).

The missing piece of the streaming surface after windows/dedup/state:
correlating two live streams (the canonical impression->click
attribution shape) and enriching a stream with a slowly-changing static
dimension. Public APIs only; every function also accepts batch frames
and produces the identical relational result, which the tests exploit
for stream==batch parity.

Scale shape: a stream-stream join buffers BOTH sides in the state
store until the watermark plus the interval bound lets rows expire —
state is O(rows inside the time window), not O(stream). The interval
condition is therefore not an optimization hint but the state-eviction
contract: without the time bound Spark must keep every row forever
(and refuses outer joins entirely). Equality keys shuffle both sides
to the same state partitions — one exchange each, the minimum any
key-correlated join needs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    upper: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join rows sharing ``key_cols`` where ``right_ts`` falls in
    ``[left_ts, left_ts + upper]`` (attribution semantics: the right
    event happens at or after the left one, within the horizon).

    On streams, both sides get ``watermark`` and the time bound doubles
    as the state-eviction contract; ``how`` may be ``inner`` or
    ``leftOuter`` (outer emission waits for the watermark to pass, per
    Spark's semantics — late right matches are gone by then, which is
    the point). ``left_ts`` and ``right_ts`` must be DISTINCT column
    names so the joined row carries both."""
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be inner|leftOuter, got {how!r}")
    if not re.fullmatch(r"\d+\s+[A-Za-z]+", upper.strip()):
        # `upper` is spliced into F.expr — accept only "<n> <unit>" so a
        # malformed value fails here with a clear message, not inside
        # the SQL parser (and can never smuggle arbitrary SQL)
        raise ValueError(
            f"upper must look like '1 hour' / '30 minutes', got {upper!r}"
        )
    if left_ts == right_ts:
        raise ValueError(
            "left_ts and right_ts must be distinct column names "
            f"(both {left_ts!r}); rename one side before joining"
        )
    overlap = (set(left.columns) & set(right.columns)) - set(key_cols)
    if overlap:
        raise ValueError(
            f"non-key columns {sorted(overlap)} exist on both sides; "
            "rename them before joining so the output is unambiguous"
        )
    lsrc, rsrc = left, right
    if lsrc.isStreaming:
        lsrc = lsrc.withWatermark(left_ts, watermark)
    if rsrc.isStreaming:
        rsrc = rsrc.withWatermark(right_ts, watermark)
    expr = (F.col(right_ts) >= F.col(left_ts)) & (
        F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}")
    )
    for k in key_cols:
        expr = (lsrc[k] == rsrc[k]) & expr
    joined = lsrc.join(rsrc, on=expr, how=how)
    # collapse the duplicated key columns to the left side's
    keep = (
        [lsrc[k].alias(k) for k in key_cols]
        + [c for c in left.columns if c not in key_cols]
        + [c for c in right.columns if c not in key_cols]
    )
    return joined.select(*keep)


def stream_static_join(
    stream: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Enrich a stream with a STATIC dimension (re-read per micro-batch
    by Spark for file-based dims — the public slowly-changing-dim
    pattern). No state store involvement, no watermark needed.

    ``broadcast=True`` (default) hints the dim side — right for the
    bounded dimension tables this operator is built for. Pass
    ``broadcast=False`` for a LARGE dimension: a forced broadcast of an
    outsized dim risks driver/executor OOM, whereas without the hint
    Spark's size-based planning (autoBroadcastJoinThreshold) decides."""
    dim_side = F.broadcast(dim) if broadcast else dim
    return stream.join(dim_side, on=key_cols, how=how)
