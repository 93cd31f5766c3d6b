"""Temporal / event-stream operators Spark lacks natively: sessionization,
as-of join, range join.

None exist in the reference (its one query shape has no joins at all) — but
they're the bread-and-butter of event analytics next to funnels, and the
classic "custom operator" exercises for a Spark engine. All three are pure
DataFrame algebra:

* sessionization — lag + cumulative-sum over a per-group window (one shuffle)
* as-of join     — the union trick: interleave both sides on the time axis,
                   carry the right side's values forward with
                   ``last(..., ignorenulls)``; ONE shuffle, no per-group
                   Python, no bucketing approximation
* range join     — bucketize the point column so Catalyst gets an equi-join
                   key, then re-filter exactly; without it Spark falls back
                   to a broadcast-nested-loop over the inequality
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize_idx(df: DataFrame, group_col: str, ts_col: str, gap: int,
                   idx_col: str = "__session_idx") -> DataFrame:
    """Assign integer session indexes (0, 1, ... per group): a new session
    starts when the gap to the previous event of the same group exceeds
    ``gap`` (same units as the ts column). One window over (group, ts): a
    single exchange, reused by downstream per-session aggregations."""
    w = Window.partitionBy(group_col).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w)
    new_session = (
        prev_ts.isNull() | (F.col(ts_col) - prev_ts > F.lit(gap))
    ).cast("long")
    session_idx = (
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - F.lit(1)
    )
    return df.withColumn(idx_col, session_idx)


def sessionize(df: DataFrame, group_col: str, ts_col: str, gap: int,
               session_col: str = "session_id") -> DataFrame:
    """Like :func:`sessionize_idx` but with string session ids
    "<group>#<n>" — deterministic and join-friendly. Prefer the integer
    form for anything that aggregates afterwards: the string concat runs
    per ROW here, per SESSION there."""
    return (
        sessionize_idx(df, group_col, ts_col, gap)
        .withColumn(session_col,
                    F.concat_ws("#", F.col(group_col),
                                F.col("__session_idx").cast("string")))
        .drop("__session_idx")
    )


def session_stats(df: DataFrame, group_col: str, ts_col: str, gap: int) -> DataFrame:
    """Per-session rollup: (group, session_id, n_events, start_ts, end_ts,
    duration).

    Groups by the INTEGER session index (the (group, idx) groupBy reuses
    the window's hashpartitioning — no second exchange) and renders the
    "<group>#<n>" id string once per SESSION on the aggregate, not once
    per row of the full stream.
    """
    sess = sessionize_idx(df, group_col, ts_col, gap)
    return (
        sess.groupBy(group_col, "__session_idx").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
            (F.max(ts_col) - F.min(ts_col)).alias("duration"),
        )
        .withColumn("session_id",
                    F.concat_ws("#", F.col(group_col),
                                F.col("__session_idx").cast("string")))
        .select(group_col, "session_id", "n_events", "start_ts", "end_ts",
                "duration")
    )


def as_of_join(left: DataFrame, right: DataFrame, on: str,
               left_ts: str, right_ts: str,
               value_cols: Optional[list[str]] = None,
               tolerance: Optional[int] = None,
               direction: str = "backward") -> DataFrame:
    """As-of join: each left row gets the latest right row with
    ``right_ts <= left_ts`` (``direction="backward"``, default) or the
    earliest with ``right_ts >= left_ts`` (``direction="forward"``); ties
    match in both directions, per ``on`` key — `pd.merge_asof` semantics.

    The union trick: tag both sides, interleave on the time axis, and carry
    right-side values forward with ``last(..., ignorenulls=True)`` over one
    (key, time) window — exact, one shuffle, scales like any window query.
    Forward is the same plan with the time axis reversed. ``tolerance``
    (same units as ts) nulls out matches farther than ``tolerance`` from
    ``left_ts``, like ``pd.merge_asof``. A carried column whose name also
    exists on the left (shared-schema sides) comes out suffixed
    ``<col>_right``, like merge_asof's suffixes.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)]

    lhs = left.select(
        F.col(on), F.col(left_ts).alias("__t"), F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left.columns if c not in (on,)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols],
    )
    rhs = right.select(
        F.col(on), F.col(right_ts).alias("__t"), F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != on],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = lhs.unionByName(rhs)

    # right rows sort BEFORE left rows at equal time → ties match; forward
    # walks the time axis in reverse so "carry forward" finds the earliest
    # right row at-or-after the left row
    t_order = (F.col("__t").asc() if direction == "backward"
               else F.col("__t").desc())
    w = (Window.partitionBy(on).orderBy(t_order, F.col("__is_left").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # carry under a reserved name: aliasing straight to c would collide
    # with a SAME-NAMED left column (the common shared-schema case, e.g.
    # both sides carrying 'price') and make the final select ambiguous.
    # Like pd.merge_asof's suffixes, a carried column whose name exists
    # on the left comes out as '<c>_right'; distinct names keep c.
    carried = [F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
               for c in value_cols]

    def out_name(c: str) -> str:
        if c not in left.columns:
            return c
        # pd.merge_asof raises on suffix collision rather than emitting
        # two identically named columns; match that
        if f"{c}_right" in left.columns:
            raise ValueError(
                f"as_of_join: cannot carry right column {c!r} — both "
                f"{c!r} and {c + '_right'!r} already exist on the left "
                "frame; rename one before joining")
        return f"{c}_right"

    # collisions AMONG the output names too: right carrying both 'price'
    # (suffixed to 'price_right' because the left has 'price') and a
    # literal 'price_right' would otherwise emit two identically named
    # columns — the exact ambiguity the suffix exists to prevent
    seen: dict[str, str] = {}
    for c in value_cols:
        n = out_name(c)
        if n in seen:
            raise ValueError(
                f"as_of_join: carried columns {seen[n]!r} and {c!r} "
                f"both come out as {n!r}; rename one before joining")
        seen[n] = c
    carried_ts = F.last(F.when(F.col("__is_left") == 0, F.col("__t")),
                        ignorenulls=True).over(w)

    out = unioned.select(
        "*", *carried, carried_ts.alias("__rt")
    ).filter(F.col("__is_left") == 1)
    if tolerance is not None:
        keep = (F.col("__rt") >= F.col("__t") - F.lit(tolerance)
                if direction == "backward"
                else F.col("__rt") <= F.col("__t") + F.lit(tolerance))
        out = out.select(
            *[c for c in left.columns],
            *[F.when(keep, F.col(f"__c_{c}")).alias(out_name(c))
              for c in value_cols],
        )
    else:
        out = out.select(*[c for c in left.columns],
                         *[F.col(f"__c_{c}").alias(out_name(c))
                           for c in value_cols])
    return out


def time_rollup(df: DataFrame, ts_col: str, every: int,
                group_cols: Optional[list[str]] = None,
                aggs: Optional[list[Column]] = None,
                bucket_col: str = "bucket_start") -> DataFrame:
    """Hypertable-style time-bucketed rollup: aggregate into fixed windows of
    ``every`` (same units as the numeric ts column).

    bucket_start = ts - (ts mod every) — the continuous-aggregate shape
    (TimescaleDB's time_bucket / Druid's granularity). Plain groupBy: partial
    aggregation map-side, shuffle keyed on (bucket, *group_cols) — uniform by
    construction, no skew. Pair with date-partitioned storage and each bucket
    touches one partition.
    """
    bucket = (F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(every))).alias(bucket_col)
    keys = [bucket] + [F.col(c) for c in (group_cols or [])]
    aggs = aggs or [F.count(F.lit(1)).alias("n_rows")]
    return df.groupBy(*keys).agg(*aggs)


# Above this many ranges rows, auto mode stops broadcasting and bucketizes.
_BROADCAST_RANGES_MAX = 100_000


def range_join(points: DataFrame, ranges: DataFrame, point_col: str,
               lo_col: str, hi_col: str, bucket_size: float,
               strategy: str = "auto",
               max_buckets_per_range: int = 100_000) -> DataFrame:
    """Join points to [lo, hi) ranges; two physical strategies.

    ``broadcast`` — broadcast the ranges side and let Catalyst run a
    BroadcastNestedLoopJoin on the inequality predicate. No shuffle of the
    points side at all; each point scans the (small) ranges table. The right
    plan whenever ranges is dimension-sized — including unbounded bands like
    ``[200, +inf)`` that the bucketized path cannot represent cheaply.

    ``bucketed`` — explode each range to the ``bucket_size``-wide buckets it
    overlaps, equi-join points on their own bucket, re-filter exactly.
    Turns the inequality into a hash-join key: the scalable path when BOTH
    sides are large (ranges shuffles ~width/bucket_size rows per range).
    A range spanning more than ``max_buckets_per_range`` buckets raises —
    a wide-open interval would otherwise silently explode to millions of
    rows (pick a bigger ``bucket_size``, or use ``broadcast``).

    ``auto`` — broadcast if a bounded peek shows ranges has at most
    ``_BROADCAST_RANGES_MAX`` rows, else bucketed. The peek is a
    ``limit(n+1).count()``: cost is capped regardless of ranges' true size.
    """
    if strategy == "auto":
        small = ranges.limit(_BROADCAST_RANGES_MAX + 1).count() <= _BROADCAST_RANGES_MAX
        strategy = "broadcast" if small else "bucketed"

    on = ((F.col(point_col) >= F.col(lo_col))
          & (F.col(point_col) < F.col(hi_col)))
    if strategy == "broadcast":
        return points.join(F.broadcast(ranges), on=on)
    if strategy != "bucketed":
        raise ValueError(f"strategy must be auto|broadcast|bucketed: {strategy!r}")

    b = F.lit(bucket_size)
    lo_b = F.floor(F.col(lo_col) / b)
    # floor(hi/b) with NO epsilon: the exact `on` filter below already
    # drops boundary points, and subtracting 1e-9 silently LOST matches
    # for float hi within 1e-9 above a bucket boundary (a point at 3.0
    # vs hi=3.0000000005, bucket 1.0 — the hazard interval_join's
    # long-arithmetic path fixed). A hi exactly on a boundary now costs
    # one extra candidate bucket that verification empties — superset
    # then filter, never a dropped match.
    hi_b = F.floor(F.col(hi_col) / b)
    n_buckets = hi_b - lo_b + 1
    guard = F.when(
        n_buckets <= F.lit(max_buckets_per_range), hi_b
    ).otherwise(F.raise_error(F.concat(
        F.lit(f"range_join: a range spans more than {max_buckets_per_range} "
              f"buckets of size {bucket_size} ([" ),
        F.col(lo_col).cast("string"), F.lit(", "),
        F.col(hi_col).cast("string"),
        F.lit(")); increase bucket_size or use strategy='broadcast'"))))
    ranged = ranges.withColumn("__bucket", F.explode(F.sequence(lo_b, guard)))
    pointed = points.withColumn("__bucket", F.floor(F.col(point_col) / b))
    return (
        pointed.join(ranged, on="__bucket")
        .filter(on)
        .drop("__bucket")
    )


def interval_join(left: DataFrame, right: DataFrame,
                  l_start: str, l_end: str, r_start: str, r_end: str,
                  bucket_size: float, strategy: str = "auto",
                  max_buckets_per_interval: int = 100_000) -> DataFrame:
    """Interval-overlap join: pairs where ``[l_start, l_end)`` intersects
    ``[r_start, r_end)`` (i.e. ``l_start < r_end AND r_start < l_end``) —
    the op behind concurrency analysis, campaign/session attribution, and
    shift/booking conflicts, which Spark would otherwise plan as a
    nested-loop join.

    ``broadcast`` — broadcast the right side; BroadcastNestedLoopJoin on
    the inequality pair. Right whenever one side is dimension-sized.

    ``bucketed`` — the big×big path: BOTH sides explode to the
    ``bucket_size``-wide grid cells they cover and equi-join on the cell.
    A pair that overlaps may meet in MANY shared cells, so each pair is
    attributed to exactly ONE cell — the cell containing the overlap's
    start, ``max(l_start, r_start)`` — making the output exact with no
    ``distinct`` pass at all (the usual dedup shuffle disappears). Each
    side shuffles ~width/bucket_size rows per interval; the guard raises on
    intervals spanning more than ``max_buckets_per_interval`` cells rather
    than silently exploding.

    ``auto`` — broadcast if a bounded peek shows the right side at most
    ``_BROADCAST_RANGES_MAX`` rows, else bucketed.
    """
    if strategy == "auto":
        small = (right.limit(_BROADCAST_RANGES_MAX + 1).count()
                 <= _BROADCAST_RANGES_MAX)
        strategy = "broadcast" if small else "bucketed"

    on = ((F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end)))
    if strategy == "broadcast":
        return left.join(F.broadcast(right), on=on)
    if strategy != "bucketed":
        raise ValueError(
            f"strategy must be auto|broadcast|bucketed: {strategy!r}")

    b = F.lit(bucket_size)
    # For integer coordinates (e.g. int64 epoch-nanos ~1e18) the double
    # epsilon is a no-op past ~2^53 and double division itself rounds, so
    # bucket math runs in pure long arithmetic: exclusive end becomes
    # (end - 1) and floor-division uses SQL `div` (truncating) with a
    # negative-operand adjustment. Floats keep the epsilon path.
    from pyspark.sql.types import (ByteType, IntegerType, LongType,
                                   ShortType)

    _integral = (ByteType, ShortType, IntegerType, LongType)
    long_coords = (float(bucket_size).is_integer() and bucket_size >= 1 and
                   all(isinstance(df.schema[c].dataType, _integral)
                       for df, c in ((left, l_start), (left, l_end),
                                     (right, r_start), (right, r_end))))
    bs = int(bucket_size)

    def fdiv(col_sql: str) -> Column:
        """floor(col / bs) in long space: `div` truncates toward zero, so
        negatives take the -ceil(-x / bs) form."""
        return F.expr(f"(CASE WHEN ({col_sql}) >= 0 "
                      f"THEN ({col_sql}) div {bs} "
                      f"ELSE -(((-({col_sql})) + {bs} - 1) div {bs}) END)")

    def grid(df, start, end):
        if long_coords:
            lo_b = fdiv(f"`{start}`")
            hi_b = fdiv(f"`{end}` - 1")
        else:
            lo_b = F.floor(F.col(start) / b)
            hi_b = F.floor((F.col(end) - F.lit(1e-9)) / b)
        n = hi_b - lo_b + 1
        guard = F.when(
            n <= F.lit(max_buckets_per_interval), hi_b
        ).otherwise(F.raise_error(F.concat(
            F.lit(f"interval_join: an interval spans more than "
                  f"{max_buckets_per_interval} buckets of size "
                  f"{bucket_size} (["),
            F.col(start).cast("string"), F.lit(", "),
            F.col(end).cast("string"),
            F.lit(")); increase bucket_size or use strategy='broadcast'"))))
        return df.withColumn("__cell", F.explode(F.sequence(lo_b, guard)))

    joined = grid(left, l_start, l_end).join(
        grid(right, r_start, r_end), on="__cell")
    # Single-cell attribution must use the SAME bucket arithmetic as grid()
    # or a boundary overlap-start could attribute to no surviving cell.
    if long_coords:
        ov_cell = fdiv(f"greatest(`{l_start}`, `{r_start}`)")
    else:
        overlap_start = F.greatest(F.col(l_start), F.col(r_start))
        ov_cell = F.floor(overlap_start / b)
    return (joined
            .filter(on & (ov_cell == F.col("__cell")))
            .drop("__cell"))
