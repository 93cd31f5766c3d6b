"""Skew-aware aggregation paths.

At 100 TB, per-value aggregations (reference A5-A8) meet power-law columns: a
handful of values own most rows, and ``groupBy(value).agg(countDistinct(g))``
concentrates those values' entire row sets on single reducers. Two standard
remedies, both pure DataFrame algebra:

* **two-phase distinct** — aggregate (value, group) first (the heavy key is
  spread across its many groups), then count per value. Spark's planner does
  this internally for a SINGLE count_distinct, but the explicit form also
  de-skews the first shuffle via salting.
* **salted partial aggregation** — prepend a random salt to the hot key for
  the partial round, then merge.

AQE's skew-join handling covers joins; these cover aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def groups_per_value_skewed(df: DataFrame, value_col: str, group_col: str,
                            salt_buckets: int = 64) -> DataFrame:
    """Exact distinct-group count per value, skew-resistant.

    Phase 1 aggregates on (value, salt(group)) — the salt here is NOT random:
    hashing the group id keeps the pair-space deterministic and spreads a hot
    value across ``salt_buckets`` reducers. Phase 2 merges per-bucket distinct
    sets by summing bucket-level distinct counts after a (value, salt,
    group)-dedup, which is exact because each group lands in exactly one salt
    bucket.

    Returns (value, groups) — same contract as the A6 aggregation.
    """
    salt = F.pmod(F.xxhash64(F.col(group_col)), F.lit(salt_buckets)).alias("__salt")
    per_bucket = (
        df.select(F.col(value_col).alias("value"), salt, F.col(group_col))
        .groupBy("value", "__salt")
        .agg(F.count_distinct(F.col(group_col)).alias("__bucket_groups"))
    )
    return (
        per_bucket.groupBy("value")
        .agg(F.sum("__bucket_groups").cast("long").alias("groups"))
    )


def salted_count_per_value(df: DataFrame, value_col: str,
                           salt_buckets: int = 64) -> DataFrame:
    """Row count per value with a salted partial round (A5 under skew).

    Plain ``groupBy(value).count()`` already partial-aggregates map-side, so
    salting only matters when the value cardinality is so low that even the
    partial outputs skew; the salted form guarantees ``salt_buckets``-way
    spread of the final shuffle.
    """
    salt = F.pmod(F.spark_partition_id(), F.lit(salt_buckets)).alias("__salt")
    partial = (
        df.select(F.col(value_col).alias("value"), salt)
        .groupBy("value", "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy("value").agg(
        F.sum("__partial").cast("long").alias("count"))
