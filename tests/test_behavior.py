"""Unit semantics for operators/behavior.py on tiny hand-built frames —
the oracle parity suite covers engine-vs-DuckDB equality on real data;
these pin the intended SEMANTICS (cohort alignment, tie order, attribution
to the latest touch, at-or-after conversion) on cases small enough to
eyeball.
"""

import pytest
from pyspark.sql import functions as F

from funnel_rocket_spark.operators import behavior

DAY = behavior.NANOS_DAY
WEEK = behavior.NANOS_WEEK


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts long, event_type string, value double, "
              "event_id long")


def test_retention_floor_buckets_negative_timestamps(spark):
    """Period bucketing must be floor-based (pmod): a sign-preserving %
    collapses (-period, period) into one double-width bucket, merging
    pre- and post-epoch activity — and disagreeing with time_rollup on
    the same inputs."""
    df = spark.createDataFrame(
        [("u", -3), ("u", 3), ("v", 3)], "g string, ts long")
    got = {(r["cohort"], r["period_index"]): r["n_active"]
           for r in behavior.retention_cohorts(df, "g", "ts",
                                               period=10).collect()}
    # u: cohort floor(-3/10)*10 = -10, active in periods -10 and 0
    assert got == {(-10, 0): 1, (-10, 1): 1, (0, 0): 1}


def test_retention_cohorts_triangle(spark):
    rows = [
        # user 1: weeks 0, 1, 3 — cohort 0
        (1, 0, "view", 0.0, 1), (1, WEEK + 5, "view", 0.0, 2),
        (1, 3 * WEEK, "view", 0.0, 3),
        # two events in the SAME week count once
        (1, 3 * WEEK + 7, "click", 0.0, 4),
        # user 2: week 1 only — cohort WEEK
        (2, WEEK + 1, "view", 0.0, 5),
    ]
    out = behavior.retention_cohorts(
        _events(spark, rows), "user_id", "ts", period=WEEK)
    got = {(r["cohort"], r["period_index"]): r["n_active"]
           for r in out.collect()}
    assert got == {(0, 0): 1, (0, 1): 1, (0, 3): 1, (WEEK, 0): 1}


def test_top_paths_orders_and_ties(spark):
    rows = [
        (1, 10, "a", 0.0, 1), (1, 20, "b", 0.0, 2), (1, 30, "c", 0.0, 3),
        (1, 40, "d", 0.0, 4),
        # same-timestamp tie broken by event_id: a(5) then b(6) then c(7)
        (2, 10, "a", 0.0, 5), (2, 10, "b", 0.0, 6), (2, 10, "c", 0.0, 7),
    ]
    out = behavior.top_paths(
        _events(spark, rows), "user_id", "ts", "event_type",
        order_cols=["ts", "event_id"], length=3, top=10)
    got = {r["path"]: (r["n_paths"], r["n_groups"]) for r in out.collect()}
    assert got == {"a > b > c": (2, 2), "b > c > d": (1, 1)}


def test_top_paths_null_step_drops_whole_path(spark):
    """A null step value must null out the whole path (SQL || semantics),
    not silently vanish inside the separator join: (a, NULL, c) is NOT the
    path 'a > c'."""
    rows = [
        (1, 10, "a", 0.0, 1), (1, 20, None, 0.0, 2), (1, 30, "c", 0.0, 3),
        (2, 10, "a", 0.0, 4), (2, 20, "b", 0.0, 5), (2, 30, "c", 0.0, 6),
    ]
    out = behavior.top_paths(
        _events(spark, rows), "user_id", "ts", "event_type",
        order_cols=["ts", "event_id"], length=3, top=10)
    got = {r["path"] for r in out.collect()}
    assert got == {"a > b > c"}


def test_last_touch_attribution_latest_wins(spark):
    rows = [
        # view then click then purchase → credited to click (latest)
        (1, 10, "view", 0.0, 1), (1, 20, "click", 0.0, 2),
        (1, 30, "purchase", 5.0, 3),
        # purchase before any touch → (none); later purchase → view
        (2, 10, "purchase", 7.0, 4), (2, 20, "view", 0.0, 5),
        (2, 30, "purchase", 9.0, 6),
        # error events are not touches and don't steal credit
        (3, 10, "view", 0.0, 7), (3, 20, "error", 0.0, 8),
        (3, 30, "purchase", 1.0, 9),
    ]
    out = behavior.last_touch_attribution(
        _events(spark, rows), "user_id", "ts", "event_type",
        conversion="purchase", touch_types=["view", "click"],
        value_col="value", order_col="event_id")
    got = {r["channel"]: (r["n_conversions"], r["total_value"])
           for r in out.collect()}
    assert got == {"click": (1, 5.0), "(none)": (1, 7.0),
                   "view": (2, 10.0)}


def test_conversion_delay_at_or_after_first_start(spark):
    rows = [
        # purchase BEFORE first view must not count; the one 2 days after does
        (1, 0, "purchase", 0.0, 1), (1, DAY, "view", 0.0, 2),
        (1, 3 * DAY, "purchase", 0.0, 3),
        # converts within the same bucket (delay 0 days)
        (2, 0, "view", 0.0, 4), (2, 5, "purchase", 0.0, 5),
        # never converts after starting
        (3, 2 * DAY, "view", 0.0, 6),
        # converts exactly at the first view timestamp (>= is inclusive)
        (4, DAY, "view", 0.0, 7), (4, DAY, "purchase", 0.0, 8),
    ]
    out = behavior.conversion_delay(
        _events(spark, rows), "user_id", "ts", "event_type",
        start="view", end="purchase", bucket=DAY)
    got = {r["delay_bucket"]: r["n_groups"] for r in out.collect()}
    assert got == {2: 1, 0: 2}


def test_rolling_time_agg_gap_aware(spark):
    from funnel_rocket_spark.operators import olap

    rows = [("2024-01-01", 100), ("2024-01-02", 200),
            # 8-day gap: Jan 10's 7-day window must NOT include Jan 1-2
            ("2024-01-10", 50), ("2024-01-12", 30)]
    df = spark.createDataFrame(rows, "d string, cents long").select(
        F.to_timestamp("d").alias("d"), "cents")
    out = olap.rolling_time_agg(df, "d", "cents", window_periods=7,
                                period="day")
    got = {str(r["period_start"])[:10]: r["rolling_sum"]
           for r in out.collect()}
    assert got == {"2024-01-01": 100, "2024-01-02": 300,
                   "2024-01-10": 50, "2024-01-12": 80}


def test_window_share_sums_to_one(spark):
    from funnel_rocket_spark.operators import olap

    rows = [("r1", "a", 10), ("r1", "b", 30), ("r2", "c", 5)]
    df = spark.createDataFrame(rows, "region string, nation string, v long")
    out = olap.window_share(df, ["nation"], ["region"], "v")
    got = {r["nation"]: r["share"] for r in out.collect()}
    assert got == {"a": 0.25, "b": 0.75, "c": 1.0}


def test_basket_pairs_counts(spark):
    from funnel_rocket_spark.operators import olap

    rows = [(1, "x"), (1, "y"), (1, "x"),  # dup item in basket counts once
            (2, "x"), (2, "y"), (2, "z"),
            (3, "y"), (3, "x")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = olap.basket_pairs(df, "basket", "item", min_support=2, top=10)
    got = {(r["item_a"], r["item_b"]): r["n_baskets"] for r in out.collect()}
    assert got == {("x", "y"): 3}


def test_retention_join_free_shuffle_shape(spark):
    """Plan gate: retention = distinct + cohort window + final agg, all
    keyed on the group column, JOIN-FREE — the groupBy-min + self-join
    formulation sort-merges two near-full-size frames at scale."""
    from funnel_rocket_spark import benchqueries as bq
    from funnel_rocket_spark.plans import count_exchanges, formatted_plan

    ev = bq.ts_ns(bq.load_table(spark, "/root/testdata/sf0.001", "events"))
    out = behavior.retention_cohorts(ev.select("user_id", "ts"),
                                     "user_id", "ts")
    assert count_exchanges(out) <= 3
    assert "Join" not in formatted_plan(out)


def test_attribution_single_window_exchange(spark):
    """Plan gate: attribution is ONE window exchange on the group column
    plus the tiny channel aggregate — no join in the plan."""
    from funnel_rocket_spark import benchqueries as bq
    from funnel_rocket_spark.plans import count_exchanges, formatted_plan

    ev = bq.ts_ns(bq.load_table(spark, "/root/testdata/sf0.001", "events"))
    out = behavior.last_touch_attribution(
        ev, "user_id", "ts", "event_type", conversion="purchase",
        touch_types=["view", "click"], value_col="value",
        order_col="event_id")
    plan = formatted_plan(out)
    assert count_exchanges(out) <= 2
    assert "Join" not in plan


def test_session_funnel_single_data_exchange(spark):
    """Plan gate: sessionization window, per-(group, session) anchor
    windows, and the per-session collapse all ride ONE exchange on the
    group column — HashPartitioning(group) satisfies the (group, session)
    clustering, so only the tiny final count crosses a second
    (single-partition) exchange. Join-free."""
    from funnel_rocket_spark import benchqueries as bq
    from funnel_rocket_spark.plans import count_exchanges, formatted_plan

    ev = bq.ts_ns(bq.load_table(spark, "/root/testdata/sf0.001", "events"))
    for steps, dur in ([["view", "purchase"], None],
                       [["view", {"type": "error", "rowFound": False},
                         "purchase"], 1800 * 10**9]):
        out = behavior.session_funnel(
            ev, "user_id", "ts", "event_type", steps,
            gap=2 * 3600 * 10**9, max_duration=dur)
        plan = formatted_plan(out)
        assert count_exchanges(out) <= 2, plan
        assert "Join" not in plan


def test_retention_rates_join_free(spark):
    """Plan gate: DN retention = one distinct-activity exchange + cohort
    window + per-cohort agg, all on the group column, join-free."""
    from funnel_rocket_spark import benchqueries as bq
    from funnel_rocket_spark.plans import count_exchanges, formatted_plan

    ev = bq.ts_ns(bq.load_table(spark, "/root/testdata/sf0.001", "events"))
    out = behavior.retention_rates(ev.select("user_id", "ts"),
                                   "user_id", "ts")
    plan = formatted_plan(out)
    assert count_exchanges(out) <= 4, plan
    assert "Join" not in plan


def test_conversion_delay_and_step_timing_shapes(spark):
    """Plan gate: conversion delay and funnel step timing are each a
    single group-keyed window/aggregate pass plus the tiny bucket/step
    aggregate — join-free."""
    from funnel_rocket_spark import benchqueries as bq
    from funnel_rocket_spark.plans import count_exchanges, formatted_plan

    ev = bq.ts_ns(bq.load_table(spark, "/root/testdata/sf0.001", "events"))
    delay = behavior.conversion_delay(
        ev, "user_id", "ts", "event_type", start="view", end="purchase")
    plan = formatted_plan(delay)
    assert count_exchanges(delay) <= 3, plan
    assert "Join" not in plan

    # step timing unions one window branch per transition and joins the
    # TINY per-transition aggregates — the gate is that those joins stay
    # broadcast (never sort-merge on the full frame) and the exchange
    # count stays bounded at one data exchange per transition branch +
    # final reduces.
    timing = bq._funnel_step_timing_fn(spark, "/root/testdata/sf0.001")
    plan = formatted_plan(timing)
    assert "SortMergeJoin" not in plan, plan
    assert count_exchanges(timing) <= 8, plan


def test_session_funnel_resets_across_sessions(spark):
    GAP = 100
    rows = [
        # user 1, session 0: view then purchase → completes both steps
        (1, 10, "view", 0.0, 1), (1, 20, "purchase", 0.0, 2),
        # user 1, session 1 (gap > 100): view only
        (1, 500, "view", 0.0, 3),
        # user 2, one session: purchase BEFORE view → step 1 not completed
        (2, 10, "purchase", 0.0, 4), (2, 20, "view", 0.0, 5),
        # user 3: purchase in the NEXT session must not credit session 0
        (3, 10, "view", 0.0, 6), (3, 400, "purchase", 0.0, 7),
    ]
    df = _events(spark, rows)
    out = {(r["step"], r["step_type"]): r["n_sessions"]
           for r in behavior.session_funnel(
               df, "user_id", "ts", "event_type", ["view", "purchase"],
               gap=GAP).collect()}
    # sessions with a view: u1s0, u1s1, u2s0, u3s0 = 4; completing
    # view->purchase within the session: only u1s0
    assert out == {(0, "view"): 4, (1, "purchase"): 1}


def test_session_funnel_max_duration(spark):
    GAP = 1000
    rows = [
        # u1: purchase 30 after view → inside maxDuration 50
        (1, 10, "view", 0.0, 1), (1, 40, "purchase", 0.0, 2),
        # u2: purchase 200 after view — same session (gap 1000) but beyond
        # maxDuration 50 → step not completed
        (2, 10, "view", 0.0, 3), (2, 210, "purchase", 0.0, 4),
    ]
    out = {(r["step"], r["step_type"]): r["n_sessions"]
           for r in behavior.session_funnel(
               _events(spark, rows), "user_id", "ts", "event_type",
               ["view", "purchase"], gap=GAP, max_duration=50).collect()}
    assert out == {(0, "view"): 2, (1, "purchase"): 1}


def test_session_funnel_row_found_false(spark):
    GAP = 1000
    rows = [
        # u1: view, no error, purchase → passes all three
        (1, 10, "view", 0.0, 1), (1, 30, "purchase", 0.0, 2),
        # u2: error between view and purchase → negative step fails, and
        # the purchase step can't anchor past a failed step
        (2, 10, "view", 0.0, 3), (2, 20, "error", 0.0, 4),
        (2, 30, "purchase", 0.0, 5),
        # u3: error BEFORE the view doesn't count (strict ts > anchor)
        (3, 5, "error", 0.0, 6), (3, 10, "view", 0.0, 7),
        (3, 30, "purchase", 0.0, 8),
    ]
    steps = ["view", {"type": "error", "rowFound": False}, "purchase"]
    out = {(r["step"], r["step_type"]): r["n_sessions"]
           for r in behavior.session_funnel(
               _events(spark, rows), "user_id", "ts", "event_type",
               steps, gap=GAP).collect()}
    assert out == {(0, "view"): 3, (1, "error"): 2, (2, "purchase"): 2}
