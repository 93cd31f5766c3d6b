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
    # all-null groups drop out of the histogram entirely (native percentile
    # returns a null row; both mean "no data")
    assert out == []


def test_bad_quantile_rejected(spark):
    df = spark.createDataFrame([("x", 1.0)], "k string, v double")
    with pytest.raises(ValueError, match="outside"):
        olap.grouped_exact_percentiles(df, ["k"], "v", {"p": 1.5})


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
