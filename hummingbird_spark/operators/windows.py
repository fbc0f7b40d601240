"""Event-time windowing (SURVEY §2.9 ST10 — absent in the reference,
exposed by the engine over the `events` fixture).

All three window kinds work identically on batch DataFrames and
Structured Streaming frames (add .withWatermark upstream for late-data
bounds in streaming — see streaming tests). Aggregations are
partial+final hash aggs; the window column is a plan-time struct, so no
state is held for batch runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(df: DataFrame, time_col: str, duration: str,
                        *group_cols: str,
                        aggs: list | None = None) -> DataFrame:
    """Fixed non-overlapping windows, epoch-aligned (window())."""
    w = F.window(F.col(time_col), duration)
    out = df.groupBy(w.alias("win"), *group_cols).agg(
        *(aggs or [F.count(F.lit(1)).alias("n_events")])
    )
    return out.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        *group_cols,
        *[c for c in out.columns if c not in ("win", *group_cols)],
    )


def sliding_window_agg(df: DataFrame, time_col: str, duration: str,
                       slide: str, *group_cols: str,
                       aggs: list | None = None) -> DataFrame:
    """Overlapping windows every `slide` (each row lands in
    duration/slide windows)."""
    w = F.window(F.col(time_col), duration, slide)
    out = df.groupBy(w.alias("win"), *group_cols).agg(
        *(aggs or [F.count(F.lit(1)).alias("n_events")])
    )
    return out.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        *group_cols,
        *[c for c in out.columns if c not in ("win", *group_cols)],
    )


def session_window_agg(df: DataFrame, time_col: str, gap: str,
                       *group_cols: str,
                       aggs: list | None = None) -> DataFrame:
    """Gap-based sessions: a session extends while successive events are
    within `gap`; closes at last_ts + gap (session_window())."""
    w = F.session_window(F.col(time_col), gap)
    out = df.groupBy(w.alias("win"), *group_cols).agg(
        *(aggs or [F.count(F.lit(1)).alias("n_events")])
    )
    return out.select(
        F.col("win.start").alias("session_start"),
        F.col("win.end").alias("session_end"),
        *group_cols,
        *[c for c in out.columns if c not in ("win", *group_cols)],
    )
