"""Audience set algebra: combine the matched-group sets of two queries.

The reference uses set operations only internally (includeZero set
difference, `query_engine.py:171-173`; uniqueness checks) and returns
counts only — users cannot ask "who matched query A but not query B".
With `QueryPlan.matching_group_ids()` exporting audiences as DataFrames,
the combinators become first-class: overlap analysis, holdout carve-outs,
suppression lists.

Scale shape: ONE full-outer join on the group key (AQE broadcasts the
smaller audience when it fits) replaces the three semi/anti joins the naive
formulation needs; the segment rollup after it is a partial-aggregated
groupBy over ≤3 keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def audience_segments(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    """(segment, n_groups) with segment ∈ {a_only, b_only, both} — the full
    Venn decomposition of two audiences in one join + one tiny aggregate.
    Inputs are id sets (deduplicated here for safety)."""
    left = a.select(key).distinct().withColumn("__a", F.lit(1))
    right = b.select(key).distinct().withColumn("__b", F.lit(1))
    joined = left.join(right, on=key, how="full_outer")
    segment = (F.when(F.col("__a").isNotNull() & F.col("__b").isNotNull(),
                      "both")
               .when(F.col("__a").isNotNull(), "a_only")
               .otherwise("b_only"))
    return (joined.select(segment.alias("segment"))
            .groupBy("segment").agg(F.count(F.lit(1)).alias("n_groups")))


def audience_intersect(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    """Groups matching both queries (left-semi join on the key)."""
    return a.select(key).distinct().join(
        b.select(key).distinct(), on=key, how="left_semi")


def audience_except(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    """Groups matching A but not B (left-anti join) — suppression lists,
    "did X but never Y" audiences without includeZero gymnastics."""
    return a.select(key).distinct().join(
        b.select(key).distinct(), on=key, how="left_anti")


def audience_union(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    """Groups matching either query."""
    return a.select(key).union(b.select(key)).distinct()
