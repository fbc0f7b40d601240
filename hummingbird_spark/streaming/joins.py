"""Stream-stream interval joins (ST10 extension — absent in the
reference, which replays a single oplog stream; exposed because a
100 TB event pipeline correlates streams constantly: click->purchase
attribution, request->response pairing, sensor->alert windows).

The batch analogue is operators/joins.asof_join / range_join; this is
the Structured Streaming form. Spark requirements encoded here
(both are correctness requirements, not style):

  - BOTH sides carry a watermark: that is what lets the join state
    store evict rows once they can no longer match (without it, state
    grows unboundedly and the job dies at scale).
  - The join condition is equi-key(s) AND a bounded time range on the
    two event-time columns — the bound is what makes eviction sound
    (right rows older than left_ts + upper can never match a future
    left row).

State size ~ input rate x (watermark + interval) per key — bounded and
independent of total stream length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "30 minutes",
    lower: str = "0 seconds",
    upper: str = "15 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING frames where right_ts in
    [left_ts + lower, left_ts + upper], matching on equality key(s).

    `left`/`right` must be distinct streaming DataFrames whose columns
    are disjoint apart from `on` and the ts columns (rename first if
    not — this keeps the result schema unambiguous). For outer joins
    Spark emits the unmatched side only after the watermark passes the
    interval bound (late-arrival safety), so expect nulls to trail by
    one trigger.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    # disambiguate ts columns in the join condition via the parent refs
    cond: Column = F.lit(True)
    for k in on:
        cond = cond & (lw[k] == rw[k])
    cond = (
        cond
        & (rw[right_ts] >= lw[left_ts]
           + F.expr(f"INTERVAL {_normalize(lower)}"))
        & (rw[right_ts] <= lw[left_ts]
           + F.expr(f"INTERVAL {_normalize(upper)}"))
    )
    joined = lw.join(rw, cond, how)
    # drop the duplicated key columns from the right side
    for k in on:
        joined = joined.drop(rw[k])
    return joined


def _normalize(spec: str) -> str:
    """'15 minutes' -> '15 minutes' (validated); raises on junk so a
    bad config fails at plan time, not inside the stream."""
    parts = spec.strip().split()
    if len(parts) != 2 or not parts[0].lstrip("-").isdigit():
        raise ValueError(f"bad interval spec: {spec!r}")
    unit = parts[1].lower().rstrip("s")
    if unit not in {"second", "minute", "hour", "day"}:
        raise ValueError(f"bad interval unit: {spec!r}")
    return f"{parts[0]} {unit}"
