"""Behavioral / product-analytics operators over grouped event streams.

The reference engine (funnel-rocket) answers "which users did X then Y"
(`engine/query_engine.py`, SURVEY §2.5); these operators answer the
follow-on questions every product-analytics stack asks of the same
event-stream data model — cohort retention, common paths, attribution,
conversion delay. None exist in the reference (SURVEY §2 gaps); each is a
pure DataFrame program whose shuffles stay keyed on the group column, so
on a layout bucketed by group (sources/ingest.py) they run shuffle-free
for the per-group phases.

Time values are exact int64 epoch-nanos (`benchqueries.ts_ns` normalizes
timestamp columns); period math is integer arithmetic — engine-portable
and drift-free.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NANOS_DAY = 86_400_000_000_000
NANOS_WEEK = 7 * NANOS_DAY


def _group_partitioned_activity(df: DataFrame, group_col: str, ts_col: str,
                                period: int) -> DataFrame:
    """DISTINCT (group, period) built on an EXPLICIT group-hash exchange.

    Letting the planner pick gives hash(group, period) for the distinct
    and a SECOND full exchange (hash(group)) for the cohort window right
    after it. When activity barely shrinks (sparse groups: most events
    land in their own period — the common case at high group counts), that
    is two shuffles of a near-full-size frame. Partitioning by group alone
    satisfies the distinct's clustering requirement (a subset of the keys)
    AND the window's, so both run on ONE exchange — measured 42.3 s →
    18.9 s at 250M rows / 25M groups. Fan-out uses the AQE
    initialPartitionNum (explicit repartitions aren't AQE-coalesced, so
    the width must suit the BIG case; the extra empty tasks at toy scale
    are microseconds each).
    """
    conf = df.sparkSession.conf
    try:
        n = int(conf.get(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum"))
    except Exception:
        n = int(conf.get("spark.sql.shuffle.partitions"))
    # pmod, not %: sign-preserving % would collapse (-period, period)
    # into one double-width bucket for pre-epoch timestamps — pmod gives
    # true floor-bucketing, matching time_rollup in operators/temporal.py
    # (identical on the non-negative epochs of ordinary data)
    bucket = (F.col(ts_col)
              - F.pmod(F.col(ts_col), F.lit(period))).alias("__period")
    return (df.select(F.col(group_col), bucket)
            .repartition(n, F.col(group_col)).distinct())


def _cohort_labeled_activity(df: DataFrame, group_col: str, ts_col: str,
                             period: int) -> DataFrame:
    """Distinct (group, period) activity labeled with the group's cohort
    (its min period, via window — see retention_cohorts for why not a
    groupBy+join). Shared by retention_cohorts and retention_rates so the
    cohort-labeling semantics cannot diverge between the two."""
    activity = _group_partitioned_activity(df, group_col, ts_col, period)
    w = Window.partitionBy(group_col)
    return activity.withColumn("__cohort", F.min("__period").over(w))


def retention_cohorts(df: DataFrame, group_col: str, ts_col: str,
                      period: int = NANOS_WEEK) -> DataFrame:
    """Cohort retention triangle: (cohort, period_index, n_active).

    cohort = the period of the group's FIRST activity; a group counts as
    active in every period it has ≥1 event. Classic layout: row = cohort,
    column = periods since cohort start, cell = distinct active groups.

    Scale shape: the raw stream first collapses to DISTINCT (group,
    period) — the only pass over full data, map-side combinable. The
    cohort label is a min() WINDOW over that shrunken frame — not a
    groupBy + self-join: activity barely shrinks when most (group,
    period) pairs are unique, so the join was a sort-merge of two
    near-full-size frames (measured 2.5× slower at 50M rows). The final
    count(*) per (cohort, index) needs no countDistinct because
    (group, period) is already unique. Every shuffle key includes the
    group column (no skew beyond real power users, which AQE splits).
    """
    labeled = _cohort_labeled_activity(df, group_col, ts_col, period)
    return (
        labeled
        .groupBy(
            F.col("__cohort").alias("cohort"),
            # integer DIV, not `/`: nanos deltas exceed 2^53, so a double
            # quotient can land on x.9999... and truncate one period off
            F.expr(f"(__period - __cohort) DIV {int(period)}")
            .alias("period_index"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def top_paths(df: DataFrame, group_col: str, ts_col: str, step_col: str,
              order_cols: Optional[list] = None, length: int = 3,
              top: int = 20, sep: str = " > ") -> DataFrame:
    """Most common length-``length`` event paths: (path, n_paths, n_groups).

    A path is ``length`` CONSECUTIVE events of one group in time order.
    lead() windows over (group, ts) assemble the steps — one exchange on
    the group column, the same partitioning the funnel engine uses, then a
    count-per-path aggregation (map-side combinable; path cardinality ≪
    row count). Deterministic under ties via ``order_cols``.
    """
    order_cols = order_cols or [ts_col]
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    steps = [F.col(step_col)] + [
        F.lead(step_col, i).over(w) for i in range(1, length)]
    named = df.select(
        F.col(group_col),
        *[s.alias(f"__s{i}") for i, s in enumerate(steps)])
    # ALL steps must be non-null: checking only the lead-horizon column
    # would let a null step value vanish inside concat_ws ("a > c" from
    # (a, NULL, c)), diverging from SQL `||` semantics where a null step
    # nulls the whole path.
    non_null = F.lit(True)
    for i in range(length):
        non_null = non_null & F.col(f"__s{i}").isNotNull()
    complete = named.filter(non_null)
    path = F.concat_ws(sep, *[F.col(f"__s{i}") for i in range(length)])
    return (
        complete.select(F.col(group_col), path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_paths"),
             F.count_distinct(group_col).alias("n_groups"))
        .orderBy(F.desc("n_paths"), F.asc("path"))
        .limit(top)
    )


def last_touch_attribution(df: DataFrame, group_col: str, ts_col: str,
                           type_col: str,
                           conversion: str,
                           touch_types: list[str],
                           value_col: Optional[str] = None,
                           order_col: Optional[str] = None) -> DataFrame:
    """Last-touch attribution: credit each conversion to the most recent
    preceding touch event of the same group → (channel, n_conversions
    [, total_value]).  Conversions with no preceding touch land in the
    ``(none)`` channel, so totals reconcile with the raw conversion count.

    Physical shape: ONE window pass over (group, ts) carrying the last
    touch type forward (``last(..., ignorenulls=True)`` — the same
    union-free formulation as :func:`temporal.as_of_join` but inlined,
    since both sides are the same table), then a tiny per-channel
    aggregate. No join, one exchange on the group column — and only the
    touch/conversion event types cross it: every other type can neither
    earn nor receive credit, so the filter (pushed to the scan) shrinks
    the window's input by the full share of irrelevant events before any
    shuffle happens.
    """
    df = df.filter(F.col(type_col).isin(*touch_types, conversion))
    order = [F.col(ts_col).asc()]
    if order_col:
        # same-timestamp ties: order by (ts, order_col) so "preceding" is
        # deterministic in any engine
        order.append(F.col(order_col).asc())
    w = (Window.partitionBy(group_col).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, -1))
    touch = F.when(F.col(type_col).isin(*touch_types), F.col(type_col))
    carried = F.last(touch, ignorenulls=True).over(w)
    conv = df.withColumn("__channel", carried).filter(
        F.col(type_col) == conversion)
    aggs = [F.count(F.lit(1)).alias("n_conversions")]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 2).alias("total_value"))
    return (
        conv.groupBy(
            F.coalesce(F.col("__channel"), F.lit("(none)")).alias("channel"))
        .agg(*aggs)
    )


def conversion_delay(df: DataFrame, group_col: str, ts_col: str,
                     type_col: str, start: str, end: str,
                     bucket: int = NANOS_DAY) -> DataFrame:
    """Time-to-convert histogram: (delay_bucket, n_groups).

    delay = first ``end`` event AT-OR-AFTER the group's first ``start``
    event, bucketed to ``bucket`` (default: whole days); groups that never
    start, or never convert after starting, are excluded. The sequence-
    anchor formulation (same shape as the engine's funnel step-1 anchor,
    `planner/compiler.py` with_sequence_anchors): one window min for the
    start anchor, then a conditional min over later end events — two
    passes, both keyed on the group column, no joins. Only the
    start/end event types are read (scan-pushed isin filter): other
    types can't move either anchor.
    """
    df = df.filter(F.col(type_col).isin(start, end))
    w = Window.partitionBy(group_col)
    anchored = df.withColumn(
        "__s", F.min(F.when(F.col(type_col) == start, F.col(ts_col))).over(w))
    per_group = (
        anchored.filter(F.col("__s").isNotNull())
        .groupBy(group_col)
        .agg(F.first("__s").alias("__s"),
             F.min(F.when((F.col(type_col) == end)
                          & (F.col(ts_col) >= F.col("__s")),
                          F.col(ts_col))).alias("__e"))
        .filter(F.col("__e").isNotNull())
    )
    return (
        # integer DIV (see retention_cohorts: double quotients of
        # >2^53-nanos deltas truncate wrong at bucket boundaries)
        per_group.select(
            F.expr(f"(__e - __s) DIV {int(bucket)}").alias("delay_bucket"))
        .groupBy("delay_bucket")
        .agg(F.count(F.lit(1)).alias("n_groups"))
    )


def session_funnel(df: DataFrame, group_col: str, ts_col: str,
                  type_col: str, steps: list, gap: int,
                  session_col: str = "__session_idx",
                  max_duration: Optional[int] = None) -> DataFrame:
    """Funnel scoped to sessions: (step, step_type, n_sessions) — how many
    SESSIONS (gap-delimited, like temporal.sessionize) complete each
    prefix of ``steps``, each step strictly later than the previous one
    and inside the same session.

    ``steps`` entries are event-type strings, or dicts
    ``{"type": ..., "rowFound": False}`` for negative steps. The step
    semantics — strict ``>`` chaining, ``max_duration`` bounding every
    step ≥ 1 to within the duration of the FIRST step's anchor, and
    ``rowFound: False`` ("the step must NOT have happened after the
    previous anchor") — are the main engine's, verbatim: the anchors come
    from the same ``with_sequence_anchors`` compiler routine, windowed by
    (group, session) instead of group.

    The whole-history funnel (planner/compiler.py) answers "did the user
    ever convert"; this answers "does a single visit convert" — the
    actionable product question. Physical shape: ONE exchange on the
    group column serves the sessionization window, the per-(group,
    session) anchor windows (same partitioning, prefix-compatible sort),
    and the final per-session collapse; only the tiny per-step count
    crosses a second (single-partition) exchange.
    """
    from funnel_rocket_spark.operators.temporal import sessionize_idx
    from funnel_rocket_spark.planner.compiler import (
        compile_sequence, with_sequence_anchors)

    norm = [{"type": s} if isinstance(s, str) else dict(s) for s in steps]
    seq = []
    for st in norm:
        # expanded filter form, as the validator would emit
        step = {"filter": {"column": type_col, "op": "==",
                           "value": st["type"]}}
        if st.get("rowFound", True) is False:
            step["rowFound"] = False
        seq.append(step)
    spec = compile_sequence(seq, prefix="__sf_", max_duration=max_duration)

    sess = sessionize_idx(df, group_col, ts_col, gap, idx_col=session_col)
    anchored = with_sequence_anchors(sess, spec, [group_col, session_col],
                                     ts_col)
    anchors = [spec.anchor(i) for i in range(len(seq))]
    per_session = anchored.groupBy(group_col, session_col).agg(
        *[F.first(a).alias(a) for a in anchors])
    counts = per_session.agg(
        *[F.count(a).alias(f"__n{i}") for i, a in enumerate(anchors)])
    steps_arr = F.array(*[
        F.struct(F.lit(i).alias("step"),
                 F.lit(st["type"]).alias("step_type"),
                 F.col(f"__n{i}").alias("n_sessions"))
        for i, st in enumerate(norm)])
    return counts.select(F.inline(steps_arr))


def retention_rates(df: DataFrame, group_col: str, ts_col: str,
                    period: int = NANOS_DAY,
                    horizons: list[int] = (1, 7)) -> DataFrame:
    """The classic DN-retention KPI: per cohort, the fraction of its
    groups active again exactly N periods later — (cohort, n_groups,
    rate_p{N}...). D1/D7 with daily periods by default.

    Derived from the same distinct-activity + cohort-window frame as
    :func:`retention_cohorts` (one extra conditional-count aggregate, no
    new shuffle shape); rates are one double division per cohort row.
    """
    labeled = _cohort_labeled_activity(df, group_col, ts_col, period)
    idx = F.expr(f"(__period - __cohort) DIV {int(period)}")
    per_cohort = labeled.groupBy(F.col("__cohort").alias("cohort")).agg(
        F.sum((idx == 0).cast("long")).alias("n_groups"),
        *[F.sum((idx == h).cast("long")).alias(f"__n{h}")
          for h in horizons])
    return per_cohort.select(
        "cohort", "n_groups",
        *[F.round(F.col(f"__n{h}") / F.col("n_groups"), 6)
          .alias(f"rate_p{h}") for h in horizons])
