"""Skew-path aggregations must be EXACTLY equal to the plain formulation —
they're a physical strategy, not an approximation."""

from pyspark.sql import functions as F

from funnel_rocket_spark.operators import skew


def _skewed_df(spark):
    # 'hot' owns 90% of rows across many groups; cold values tiny
    hot = spark.range(9000).select(
        F.lit("hot").alias("v"), (F.col("id") % 500).alias("g"))
    cold = spark.range(1000).select(
        F.concat(F.lit("cold"), (F.col("id") % 7)).alias("v"),
        (F.col("id") % 13).alias("g"))
    return hot.unionAll(cold)


def test_groups_per_value_skewed_exact(spark):
    df = _skewed_df(spark)
    expected = {
        r["v"]: r["n"]
        for r in df.groupBy("v").agg(F.count_distinct("g").alias("n")).collect()
    }
    got = {r["value"]: r["groups"]
           for r in skew.groups_per_value_skewed(df, "v", "g").collect()}
    assert got == expected
    assert got["hot"] == 500


def test_salted_count_per_value_exact(spark):
    df = _skewed_df(spark)
    expected = {r["v"]: r["count"] for r in df.groupBy("v").count().collect()}
    got = {r["value"]: r["count"]
           for r in skew.salted_count_per_value(df, "v").collect()}
    assert got == expected
    assert got["hot"] == 9000
