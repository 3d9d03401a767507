"""Time-series operators: sessionization and windowed aggregation.

Beyond the reference's line-oriented tools (SURVEY.md training-data
extensions): event streams need gap-based sessions and event-time
windows. Both are pure Catalyst — the window functions shuffle once on
the user key; tumbling windows are just a grouping expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, user_col: str, ts_col: str,
               gap_minutes: float = 30.0,
               order_cols: list[str] | None = None,
               out_col: str = "session_id") -> DataFrame:
    """Assign gap-based session ids per user: a new session starts when
    the inactivity gap exceeds ``gap_minutes``.

    Comparisons are integer microseconds (exact, engine-portable — the
    same contract the events_sessions oracle relies on). ``order_cols``
    breaks timestamp ties deterministically (defaults to the timestamp
    alone). Session ids are per-user ordinals starting at 1; the global
    key is (user, session_id). One shuffle on the user key.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    gap_us = int(gap_minutes * 60_000_000)
    new_s = F.when(prev.isNull() | ((us - prev) > gap_us),
                   F.lit(1)).otherwise(F.lit(0))
    return df.withColumn(out_col,
                         F.sum(new_s).over(
                             w.rowsBetween(Window.unboundedPreceding, 0)))


def session_stats(df: DataFrame, user_col: str, ts_col: str,
                  gap_minutes: float = 30.0) -> DataFrame:
    """Per-user session counts (the tsv-summarize-style rollup of
    ``sessionize``)."""
    s = sessionize(df, user_col, ts_col, gap_minutes=gap_minutes)
    # session ids are dense per-user ordinals from 1, so max == count
    # distinct — without the per-group hash set a distinct agg builds
    return s.groupBy(user_col).agg(
        F.max("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"))


def windowed_agg(df: DataFrame, ts_col: str, duration: str,
                 group_cols: list[str] | None = None,
                 aggs: list[Column] | None = None) -> DataFrame:
    """Tumbling event-time window aggregation — the window is just a
    grouping expression, so the plan keeps the standard partial/final
    aggregate shape (no extra shuffle vs a plain groupBy)."""
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    keys = [F.window(ts_col, duration).alias("w")] + \
        [F.col(c) for c in (group_cols or [])]
    return df.groupBy(*keys).agg(*aggs)
