"""Time-series operators: sessionization and windowed aggregation.

Beyond the reference's line-oriented tools (SURVEY.md training-data
extensions): event streams need gap-based sessions and event-time
windows. Both are pure Catalyst — the window functions shuffle once on
the user key; tumbling windows are just a grouping expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _time_num(df: DataFrame, col: str):
    """Normalize a time-like column to an exactly-comparable numeric:
    timestamps/dates -> integer MICROSECONDS (unix_micros — exact,
    engine-portable; float64 cannot hold modern epoch-us), numerics ->
    double. Returns (column_expr, is_micros)."""
    dt = df.schema[col].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return F.unix_micros(F.col(col).cast("timestamp")), True
    return F.col(col).cast("double"), False


def asof_join(left: DataFrame, right: DataFrame, on: list[str] | str,
              left_time: str, right_time: str | None = None, *,
              direction: str = "backward", tolerance: float | None = None,
              right_order: list[str] | None = None,
              right_prefix: str = "") -> DataFrame:
    """As-of join: for every left row, attach the single right row with
    the nearest ``right_time`` at-or-before (``direction='backward'``)
    or at-or-after (``'forward'``) the left row's ``left_time``, per
    join key — the event-attribution / last-known-value join Spark has
    no built-in operator for.

    Scale shape (the merge-join formulation, not a broadcast or UDF):
    both sides are UNIONED, shuffled ONCE on the join keys, sorted by
    (time, side) inside each partition, and the match is a running
    ``last(payload, ignorenulls)`` window — O(n log n) per key group,
    no per-row Python, no quadratic candidate join, works at any right
    size. Equal timestamps match (right sorts before left at the same
    instant); ``right_order`` breaks ties between equal-time RIGHT rows
    deterministically (latest in that order wins).

    ``tolerance`` (seconds for timestamp/date columns, same units as
    the column otherwise) nulls the match when the time gap exceeds it.
    Unmatched left rows keep NULL right columns (left-outer semantics,
    same as DuckDB/pandas ASOF). Right columns colliding with left
    names need ``right_prefix``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, "
                         f"got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    right_time = right_time or left_time
    if right_time in keys:
        raise ValueError("right_time cannot be a join key")
    rp = [c for c in right.columns if c not in keys]
    out_names = {c: right_prefix + c for c in rp}
    clash = sorted(set(out_names.values()) & set(left.columns))
    if clash:
        raise ValueError(f"right columns {clash} collide with left "
                         f"columns — pass right_prefix")
    lp = [c for c in left.columns if c not in keys]
    l_struct = T.StructType([left.schema[c] for c in lp])
    p_struct = T.StructType([right.schema[c] for c in rp])

    lt, l_us = _time_num(left, left_time)
    rt, r_us = _time_num(right, right_time)
    if l_us != r_us:
        raise ValueError("left_time and right_time must both be "
                         "time-typed or both numeric")
    # a usable time is non-NULL and (on numeric axes) non-NaN: NaN is
    # isNotNull in Spark and sorts AFTER every value, so an unguarded
    # NaN left row would match the globally latest right row and a NaN
    # right row could become a match — pandas/DuckDB ASOF both treat it
    # as no-position
    def usable(c):
        ok = c.isNotNull()
        return ok if l_us else ok & ~F.isnan(c)

    l2 = left.select(*keys, lt.alias("__t"), F.lit(1).alias("__side"),
                     F.lit(None).cast(p_struct).alias("__p"),
                     F.struct(*lp).alias("__l"))
    r2 = right.select(*keys, rt.alias("__t"), F.lit(0).alias("__side"),
                      F.struct(*rp).alias("__p"),
                      F.lit(None).cast(l_struct).alias("__l")) \
              .where(usable(F.col("__t")))
    u = l2.unionByName(r2)

    backward = direction == "backward"
    order = [F.col("__t").asc() if backward else F.col("__t").desc(),
             F.col("__side").asc()]
    for c in (right_order or []):
        order.append(F.col("__p")[c].asc_nulls_first())
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, 0))
    m = F.last("__p", ignorenulls=True).over(w)
    if tolerance is not None:
        tol = float(tolerance) * (1_000_000 if l_us else 1.0)
        mrt = F.unix_micros(m[right_time].cast("timestamp")) if l_us \
            else m[right_time].cast("double")
        gap = (F.col("__t") - mrt) if backward else (mrt - F.col("__t"))
        m = F.when(gap <= F.lit(tol), m)
    # a NULL/NaN left time matches nothing (no position on the axis)
    m = F.when(usable(F.col("__t")), m)

    left_out = [F.col(c) if c in keys else F.col("__l")[c].alias(c)
                for c in left.columns]
    return (u.withColumn("__m", m)
             .where(F.col("__side") == 1)
             .select(*left_out,
                     *[F.col("__m")[c].alias(out_names[c]) for c in rp]))


def range_join(points: DataFrame, intervals: DataFrame,
               on: list[str] | str, point_col: str,
               start_col: str, end_col: str, *,
               bucket: float,
               max_buckets_per_interval: int = 10_000,
               interval_prefix: str = "") -> DataFrame:
    """Interval containment join: every (point, interval) pair sharing
    the join keys with ``start <= point <= end`` — one output row per
    containing interval.

    Scale shape (bucketed blocking, not an inequality join): the time
    axis is cut into ``bucket``-wide cells (seconds for timestamp/date
    columns, column units otherwise); each interval EXPLODES into the
    cells it covers, each point lands in exactly one cell, and the
    candidate join is a plain EQUI-join on (keys, cell) that Catalyst
    hashes/shuffles like any other — followed by the exact containment
    filter. Pick ``bucket`` near the typical interval length: one
    interval then explodes into ~2 cells. ``max_buckets_per_interval``
    raises IN-PLAN on a degenerate interval (e.g. an open-ended range
    spanning the whole axis) before it can explode the shuffle.
    Interval columns colliding with point names need
    ``interval_prefix``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    ip = [c for c in intervals.columns if c not in keys]
    out_names = {c: interval_prefix + c for c in ip}
    clash = sorted(set(out_names.values()) & set(points.columns))
    if clash:
        raise ValueError(f"interval columns {clash} collide with point "
                         f"columns — pass interval_prefix")
    pn, p_us = _time_num(points, point_col)
    sn, s_us = _time_num(intervals, start_col)
    en, e_us = _time_num(intervals, end_col)
    if not (p_us == s_us == e_us):
        raise ValueError("point/start/end must all be time-typed or "
                         "all numeric")
    # cell id = floor(time / width). Micros are LONGs: floor through
    # double division loses exactness past 2^53, so use integer DIV
    # (truncates toward zero — shift negatives down one width first for
    # a true floor). Numeric axes use double floor.
    if p_us:
        wi = int(bucket * 1_000_000)
        if wi <= 0:
            raise ValueError("bucket must be >= 1 microsecond")

        def cell(df, num_col, out):
            shifted = F.when(F.col(num_col) < 0,
                             F.col(num_col) - wi + 1) \
                       .otherwise(F.col(num_col))
            return df.withColumn("__shift", shifted) \
                     .withColumn(out, F.expr(f"__shift DIV {wi}")) \
                     .drop("__shift")
    else:
        def cell(df, num_col, out):
            return df.withColumn(
                out, F.floor(F.col(num_col) / float(bucket)).cast("long"))

    p2 = cell(points.withColumn("__pn", pn), "__pn", "__cell")
    i2 = (intervals
          .withColumn("__sn", sn).withColumn("__en", en)
          .where(F.col("__sn").isNotNull() & F.col("__en").isNotNull()
                 & (F.col("__sn") <= F.col("__en"))))
    i2 = cell(cell(i2, "__sn", "__b0"), "__en", "__b1")
    n_cells = F.col("__b1") - F.col("__b0") + 1
    guard = F.when(
        n_cells > max_buckets_per_interval,
        F.raise_error(F.concat(
            F.lit("range_join: interval spans "),
            n_cells.cast("string"),
            F.lit(f" cells > max_buckets_per_interval="
                  f"{max_buckets_per_interval} — raise bucket or cap "
                  f"the interval")))
    ).otherwise(F.col("__b1"))
    i2 = (i2.withColumn("__cell", F.explode(F.sequence(F.col("__b0"),
                                                       guard)))
            .select(*[F.col(k).alias(f"__k_{k}") for k in keys],
                    "__cell", "__sn", "__en",
                    F.struct(*ip).alias("__i")))
    cond = [p2[k] == i2[f"__k_{k}"] for k in keys] + \
           [p2["__cell"] == i2["__cell"]]
    j = (p2.join(i2, cond)
           .where((F.col("__sn") <= F.col("__pn"))
                  & (F.col("__pn") <= F.col("__en"))))
    return j.select(*points.columns,
                    *[F.col("__i")[c].alias(out_names[c]) for c in ip])


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
