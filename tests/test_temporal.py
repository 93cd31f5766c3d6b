"""Temporal operators: sessionization, as-of join (incl. tolerance), range
join — unit semantics on hand-built data (the catalog queries cover the
DuckDB differential)."""

from funnel_rocket_spark.operators import temporal


def test_sessionize(spark):
    rows = [
        ("u1", 0), ("u1", 10), ("u1", 100), ("u1", 105),  # 2 sessions (gap 50)
        ("u2", 7),                                          # 1 session
    ]
    df = spark.createDataFrame(rows, "g string, ts long")
    out = temporal.session_stats(df, "g", "ts", gap=50).collect()
    stats = {r["session_id"]: (r["n_events"], r["duration"]) for r in out}
    assert stats == {"u1#0": (2, 10), "u1#1": (2, 5), "u2#0": (1, 0)}


def test_as_of_join_semantics(spark):
    trades = spark.createDataFrame(
        [("A", 5), ("A", 10), ("A", 2), ("B", 7)], "sym string, t long")
    quotes = spark.createDataFrame(
        [("A", 3, 1.0), ("A", 5, 2.0), ("A", 9, 3.0), ("C", 1, 9.9)],
        "sym string, t long, px double")
    out = temporal.as_of_join(trades, quotes, on="sym", left_ts="t",
                              right_ts="t")
    got = {(r["sym"], r["t"]): r["px"] for r in out.collect()}
    # t=5 matches the equal-ts quote (ties included); t=2 has none; B has none
    assert got == {("A", 2): None, ("A", 5): 2.0, ("A", 10): 3.0,
                   ("B", 7): None}


def test_as_of_join_tolerance(spark):
    trades = spark.createDataFrame([("A", 100)], "sym string, t long")
    quotes = spark.createDataFrame([("A", 10, 1.0)], "sym string, t long, px double")
    with_tol = temporal.as_of_join(trades, quotes, "sym", "t", "t",
                                   tolerance=50).collect()[0]
    assert with_tol["px"] is None  # quote is 90 old, tolerance 50
    without = temporal.as_of_join(trades, quotes, "sym", "t", "t").collect()[0]
    assert without["px"] == 1.0


def test_range_join(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 45.0), (3, 99.9), (4, 250.0)], "id long, v double")
    ranges = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 100.0, "mid"), (100.0, 1000.0, "high")],
        "lo double, hi double, label string")
    for strategy in ("auto", "broadcast", "bucketed"):
        out = temporal.range_join(points, ranges, "v", "lo", "hi",
                                  bucket_size=50.0, strategy=strategy)
        got = {r["id"]: r["label"] for r in out.collect()}
        assert got == {1: "low", 2: "low", 3: "mid", 4: "high"}, strategy


def test_as_of_join_shared_schema_suffixes(spark):
    """Both sides carrying the same value-column name (the common
    shared-schema case) must not raise an ambiguous-reference error; the
    carried right value lands on '<col>_right' like pd.merge_asof's
    suffixes, the left original keeps the bare name."""
    left = spark.createDataFrame(
        [("A", 5, 10.0), ("A", 9, 20.0)], "sym string, t long, price double")
    right = spark.createDataFrame(
        [("A", 4, 1.5), ("A", 8, 2.5)], "sym string, t long, price double")
    out = temporal.as_of_join(left, right, on="sym", left_ts="t",
                              right_ts="t")
    assert out.columns.count("price") == 1
    assert "price_right" in out.columns
    got = {(r["sym"], r["t"]): (r["price"], r["price_right"])
           for r in out.collect()}
    assert got == {("A", 5): (10.0, 1.5), ("A", 9): (20.0, 2.5)}
    # tolerance branch shares the naming
    tol = temporal.as_of_join(left, right, "sym", "t", "t",
                              tolerance=1).collect()
    assert {(r["sym"], r["t"]): r["price_right"] for r in tol} == \
        {("A", 5): 1.5, ("A", 9): 2.5}


def test_range_join_bucketed_float_boundary_hazard(spark):
    """hi within 1e-9 ABOVE a bucket boundary: a point exactly on the
    boundary is inside [lo, hi) and must match — the old epsilon bucket
    arithmetic silently dropped it. An exact-boundary hi stays exclusive
    (the verification filter, not the bucket math, decides)."""
    points = spark.createDataFrame([(1, 3.0)], "id long, v double")
    ranges = spark.createDataFrame(
        [(0.0, 3.0000000005, "r")], "lo double, hi double, label string")
    out = temporal.range_join(points, ranges, "v", "lo", "hi",
                              bucket_size=1.0, strategy="bucketed")
    assert [r["label"] for r in out.collect()] == ["r"]
    exact_end = spark.createDataFrame(
        [(0.0, 3.0, "r")], "lo double, hi double, label string")
    assert temporal.range_join(points, exact_end, "v", "lo", "hi",
                               bucket_size=1.0,
                               strategy="bucketed").count() == 0


def test_range_join_broadcast_handles_unbounded_band(spark):
    """A [lo, +huge) band is fine under broadcast — and is exactly the case
    the bucketized path must refuse rather than explode to millions of
    bucket rows."""
    import pytest

    points = spark.createDataFrame([(1, 5.0), (2, 1e8)], "id long, v double")
    ranges = spark.createDataFrame(
        [(0.0, 10.0, "low"), (10.0, 1e9, "rest")],
        "lo double, hi double, label string")
    out = temporal.range_join(points, ranges, "v", "lo", "hi",
                              bucket_size=10.0)  # auto → broadcast
    assert {r["id"]: r["label"] for r in out.collect()} == {1: "low", 2: "rest"}

    with pytest.raises(Exception, match="increase bucket_size|spans more"):
        temporal.range_join(points, ranges, "v", "lo", "hi", bucket_size=10.0,
                            strategy="bucketed").collect()


def test_sessionize_agrees_with_session_window(spark):
    """Cross-validation: gap-based sessionize == Spark's built-in
    session_window aggregation (session COUNT per group must match)."""
    from funnel_rocket_spark import benchqueries as bq
    from pyspark.sql import functions as F

    ev = bq.ts_ns(bq.load_table(spark, "/root/testdata/sf0.001", "events"))
    gap_ns = 2 * 3600 * 10**9
    mine = (temporal.session_stats(ev.select("user_id", "ts"), "user_id",
                                   "ts", gap=gap_ns)
            .groupBy("user_id").count())
    builtin = (
        ev.select("user_id", F.timestamp_micros(F.expr("ts DIV 1000")).alias("t"))
        .groupBy("user_id", F.session_window("t", "2 hours"))
        .count()
        .groupBy("user_id").count()
    )
    a = {r["user_id"]: r["count"] for r in mine.collect()}
    b = {r["user_id"]: r["count"] for r in builtin.collect()}
    assert a == b


def test_time_rollup_units(spark):
    rows = [("a", 5, 1.0), ("a", 15, 2.0), ("b", 12, 4.0), ("a", 25, 8.0)]
    df = spark.createDataFrame(rows, "g string, ts long, v double")
    from pyspark.sql import functions as F

    out = temporal.time_rollup(df, "ts", every=10, group_cols=["g"],
                               aggs=[F.sum("v").alias("s")])
    got = {(r["bucket_start"], r["g"]): r["s"] for r in out.collect()}
    assert got == {(0, "a"): 1.0, (10, "a"): 2.0, (10, "b"): 4.0, (20, "a"): 8.0}


def test_asof_forward_matches_pandas(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    lpdf = pd.DataFrame({
        "k": rng.integers(0, 4, 60), "t": rng.integers(0, 100, 60),
        "lv": np.arange(60)}).sort_values("t").reset_index(drop=True)
    rpdf = pd.DataFrame({
        "k": rng.integers(0, 4, 40), "t": rng.integers(0, 100, 40),
        "price": rng.random(40).round(3)}).sort_values("t")
    # merge_asof needs unique-ish ordering; drop duplicate (k, t) on the
    # right keeping the LAST so ties are deterministic on both engines...
    # forward direction takes the FIRST right row at-or-after, so keep first.
    rpdf = rpdf.drop_duplicates(["k", "t"], keep="first")

    want = pd.merge_asof(lpdf, rpdf, on="t", by="k", direction="forward")

    ldf = spark.createDataFrame(lpdf.rename(columns={"t": "lt"}))
    rdf = spark.createDataFrame(rpdf.rename(columns={"t": "rt"}))
    got = temporal.as_of_join(ldf, rdf, on="k", left_ts="lt", right_ts="rt",
                              direction="forward").toPandas()
    got = got.sort_values("lv").reset_index(drop=True)
    want = want.sort_values("lv").reset_index(drop=True)
    assert len(got) == len(want)
    for i in range(len(want)):
        w, g = want["price"].iloc[i], got["price"].iloc[i]
        assert (pd.isna(w) and pd.isna(g)) or w == g, (i, w, g)


def test_asof_forward_tolerance(spark):
    ldf = spark.createDataFrame([(1, 10), (1, 50)], "k long, lt long")
    rdf = spark.createDataFrame(
        [(1, 12, 1.0), (1, 90, 2.0)], "k long, rt long, price double")
    got = {r["lt"]: r["price"] for r in temporal.as_of_join(
        ldf, rdf, on="k", left_ts="lt", right_ts="rt",
        direction="forward", tolerance=5).collect()}
    assert got[10] == 1.0      # 12 is within 10+5
    assert got[50] is None     # 90 is beyond 50+5


def test_as_of_join_suffix_collision_raises(spark):
    """When the left frame already carries BOTH '<col>' and
    '<col>_right', suffixing the carried right column would emit two
    identically named outputs — raise like pd.merge_asof does on suffix
    collision instead of reintroducing the ambiguity downstream."""
    import pytest

    left = spark.createDataFrame(
        [("A", 5, 10.0, 0.0)],
        "sym string, t long, price double, price_right double")
    right = spark.createDataFrame(
        [("A", 4, 1.5)], "sym string, t long, price double")
    with pytest.raises(ValueError, match="price_right"):
        temporal.as_of_join(left, right, on="sym", left_ts="t",
                            right_ts="t").collect()


def test_as_of_join_carried_name_collision_raises(spark):
    """Collision AMONG carried columns: right carries both 'price'
    (suffixed to 'price_right' because the left has 'price') and a
    literal 'price_right' — two outputs would share one name; raise."""
    import pytest

    left = spark.createDataFrame(
        [("A", 5, 10.0)], "sym string, t long, price double")
    right = spark.createDataFrame(
        [("A", 4, 1.5, 2.5)],
        "sym string, t long, price double, price_right double")
    with pytest.raises(ValueError, match="both come out as"):
        temporal.as_of_join(left, right, on="sym", left_ts="t",
                            right_ts="t").collect()
