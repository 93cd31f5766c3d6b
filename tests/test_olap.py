"""Histogram-form exact percentiles: equivalence with Spark's native
``percentile`` (holistic sort aggregate) across edge cases — the catalog
query `olap_percentiles` adds the DuckDB quantile_cont differential."""

import random

import pytest
from pyspark.sql import functions as F

from funnel_rocket_spark.operators import olap


QS = {"q0": 0.0, "q25": 0.25, "q50": 0.5, "q90": 0.9, "q100": 1.0}


def _native(df, key, val_col):
    return df.groupBy(key).agg(
        *[F.percentile(val_col, F.lit(q)).alias(name) for name, q in QS.items()]
    )


def _assert_same(spark, df, key, val_col):
    got = {
        r[key]: [r[n] for n in QS]
        for r in olap.grouped_exact_percentiles(df, [key], val_col, QS).collect()
    }
    want = {r[key]: [r[n] for n in QS] for r in _native(df, key, val_col).collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], nan_ok=True), k


def test_all_null_group_yields_null_row(spark):
    """A group whose values are ALL null must still emit a row (with null
    quantiles) — like SQL GROUP BY + quantile_cont. The old isNotNull
    pre-filter dropped the group entirely."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", None), ("b", None)],
        "g string, v double")
    rows = {r["g"]: r for r in olap.grouped_exact_percentiles(
        df, ["g"], "v", {"p50": 0.5}).collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["p50"] == 2.0
    assert rows["b"]["p50"] is None
    # mixed group: nulls ignored, like percentile/quantile_cont
    df2 = spark.createDataFrame(
        [("c", None), ("c", 10.0), ("c", 20.0)], "g string, v double")
    assert olap.grouped_exact_percentiles(
        df2, ["g"], "v", {"p50": 0.5}).collect()[0]["p50"] == 15.0


def test_window_share_zero_total_is_null(spark):
    """A zero within-group total (refunds cancelling sales) yields null
    shares, not an ANSI DIVIDE_BY_ZERO that kills the query."""
    df = spark.createDataFrame(
        [("w1", "p1", 5.0), ("w1", "p2", -5.0), ("w2", "p1", 4.0)],
        "w string, p string, v double")
    rows = {(r["w"], r["p"]): r["share"]
            for r in olap.window_share(df, ["p"], ["w"], "v").collect()}
    assert rows[("w1", "p1")] is None and rows[("w1", "p2")] is None
    assert rows[("w2", "p1")] == 1.0


def test_matches_native_percentile_random(spark):
    rng = random.Random(7)
    rows = [
        (rng.choice("abc"),
         float(rng.randint(0, 50)) if rng.random() < 0.5 else rng.uniform(0, 9))
        for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    _assert_same(spark, df, "k", "v")


def test_edge_groups_and_nulls(spark):
    rows = [
        ("single", 42.0),
        ("dup", 5.0), ("dup", 5.0), ("dup", 5.0),
        ("two", 1.0), ("two", 2.0),
        ("withnull", 10.0), ("withnull", None), ("withnull", 30.0),
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    _assert_same(spark, df, "k", "v")


def test_all_null_group_yields_nulls(spark):
    df = spark.createDataFrame([("x", None), ("x", None)], "k string, v double")
    out = olap.grouped_exact_percentiles(df, ["k"], "v", {"p50": 0.5}).collect()
    # all-null groups keep their row with null quantiles — matching both
    # native percentile and SQL GROUP BY + quantile_cont (the histogram
    # once dropped such groups entirely)
    assert len(out) == 1
    assert out[0]["k"] == "x" and out[0]["p50"] is None


def test_bad_quantile_rejected(spark):
    df = spark.createDataFrame([("x", 1.0)], "k string, v double")
    with pytest.raises(ValueError, match="outside"):
        olap.grouped_exact_percentiles(df, ["k"], "v", {"p": 1.5})


def test_multi_matches_single_value_calls(spark):
    """grouped_exact_percentiles_multi == per-value single calls, on random
    data with nulls and a group missing one value entirely; plus the plan
    gate — ONE scan of the input serves every stacked value."""
    rng = random.Random(11)
    rows = []
    for _ in range(1500):
        k = rng.choice("abc")
        a = float(rng.randint(0, 99)) if rng.random() < 0.9 else None
        b = rng.uniform(-5, 5) if rng.random() < 0.8 else None
        if k == "c":
            b = None  # group with NO values for b at all
        rows.append((k, a, b))
    df = spark.createDataFrame(rows, "k string, a double, b double")

    multi = {r["k"]: (r["a50"], r["a90"], r["b25"]) for r in
             olap.grouped_exact_percentiles_multi(
                 df, ["k"],
                 {"a": "a", "b": "b"},
                 {"a50": ("a", 0.5), "a90": ("a", 0.9),
                  "b25": ("b", 0.25)}).collect()}
    sa = {r["k"]: (r["a50"], r["a90"]) for r in
          olap.grouped_exact_percentiles(
              df, ["k"], "a", {"a50": 0.5, "a90": 0.9}).collect()}
    sb = {r["k"]: r["b25"] for r in
          olap.grouped_exact_percentiles(
              df, ["k"], "b", {"b25": 0.25}).collect()}
    assert set(multi) == set(sa)  # every group with ANY value present
    for k in multi:
        assert multi[k][:2] == pytest.approx(sa[k])
        if k in sb:
            assert multi[k][2] == pytest.approx(sb[k])
        else:
            assert multi[k][2] is None  # missing value -> null, group kept

    # plan gate: the stacked form reads its input ONCE
    plan = olap.grouped_exact_percentiles_multi(
        df, ["k"], {"a": "a", "b": "b"},
        {"a50": ("a", 0.5), "b25": ("b", 0.25)}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1


def test_distributed_cumsum_cross_partition_offsets(spark):
    """The range-partitioned cumulative pass (_ranged_cumulative) must
    stitch partition-local counts with the in-plan offsets: force many
    more range partitions than groups, heavy duplicates, and nulls, so
    every group's histogram spans several partitions."""
    rng = random.Random(23)
    rows = [("g", float(rng.randint(0, 6))) for _ in range(400)]
    rows += [("h", 1.0)] * 40 + [("h", None)] * 10 + [("i", None)] * 5
    df = spark.createDataFrame(rows, "k string, v double")
    got = {r["k"]: [r[n] for n in QS]
           for r in olap.grouped_exact_percentiles(
               df, ["k"], "v", QS, partitions=16).collect()}
    want = {r["k"]: [r[n] for n in QS]
            for r in _native(df, "k", "v").collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], nan_ok=True), k
    assert got["i"] == [None] * len(QS)  # all-null group keeps its row

    # plan gate (on the FINAL adaptive plan): both branches must read the
    # PERSISTED ranged frame — materialized once, so the sampled range
    # bounds cannot differ between the offsets branch and the main branch
    # (r12 ADVICE medium: relying on ReuseExchange to share the sampled
    # exchange was plan-inferred and could silently break)
    q = olap.grouped_exact_percentiles(df, ["k"], "v", QS, partitions=16)
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert ("InMemoryTableScan" in final
            or "TableCacheQueryStage" in final)


def test_distributed_cumsum_correct_without_exchange_reuse(spark):
    """r12 ADVICE (medium): _ranged_cumulative's offsets must not depend
    on ReuseExchange firing. With exchange reuse disabled, the persisted
    ranged frame is the only thing keeping both branches on one physical
    partitioning — values must still match the native percentile."""
    rng = random.Random(31)
    rows = [("g", float(rng.randint(0, 6))) for _ in range(300)]
    rows += [("h", 2.0)] * 30 + [("h", None)] * 7
    df = spark.createDataFrame(rows, "k string, v double")
    old = spark.conf.get("spark.sql.exchange.reuse")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        got = {r["k"]: [r[n] for n in QS]
               for r in olap.grouped_exact_percentiles(
                   df, ["k"], "v", QS, partitions=16).collect()}
        want = {r["k"]: [r[n] for n in QS]
                for r in _native(df, "k", "v").collect()}
        assert got.keys() == want.keys()
        for k in want:
            assert got[k] == pytest.approx(want[k], nan_ok=True), k
    finally:
        spark.conf.set("spark.sql.exchange.reuse", old)


def test_multi_rejects_unknown_value_and_bad_q(spark):
    df = spark.createDataFrame([("x", 1.0)], "k string, v double")
    with pytest.raises(ValueError, match="unknown value"):
        olap.grouped_exact_percentiles_multi(
            df, ["k"], {"v": "v"}, {"p": ("nope", 0.5)})
    with pytest.raises(ValueError, match="outside"):
        olap.grouped_exact_percentiles_multi(
            df, ["k"], {"v": "v"}, {"p": ("v", 1.5)})


def test_exact_ntile_matches_sql_semantics(spark):
    from funnel_rocket_spark.operators import olap
    from pyspark.sql import functions as F

    # N=12, n=10 -> q=1, r=2: buckets 1,2 get 2 rows, buckets 3..10 get 1
    df = spark.createDataFrame([(i, 100 - i) for i in range(12)], "k INT, v INT")
    out = olap.exact_ntile(df, 10, [F.desc("v"), F.asc("k")],
                           partitions=3, out_col="b")
    got = {r["k"]: r["b"] for r in out.collect()}
    # v descends as k ascends, so rank == k+1
    want = {0: 1, 1: 1, 2: 2, 3: 2, 4: 3, 5: 4, 6: 5, 7: 6, 8: 7, 9: 8,
            10: 9, 11: 10}
    assert got == want


def test_exact_ntile_fewer_rows_than_buckets(spark):
    from funnel_rocket_spark.operators import olap
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1,), (2,), (3,)], "k INT")
    out = olap.exact_ntile(df, 10, [F.asc("k")], partitions=2, out_col="b")
    assert {r["k"]: r["b"] for r in out.collect()} == {1: 1, 2: 2, 3: 3}
