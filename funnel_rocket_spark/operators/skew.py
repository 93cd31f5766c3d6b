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


def heavy_hitters(df: DataFrame, col: str, k: int = 10,
                  counters: int = 4096) -> DataFrame:
    """EXACT top-k most frequent values in two bounded-memory passes:
    (value, cnt), ordered by cnt desc then value — without ever shuffling
    the full (value → count) keyspace.

    Pass 1 runs Misra–Gries with ``counters`` counters per partition
    (Arrow-batched; memory is O(counters), not O(distinct values)) and
    unions the per-partition candidate values — a superset of every value
    with global frequency > N/(counters+1). Pass 2 recounts ONLY the
    candidates exactly (broadcast semi filter, then a tiny aggregation of
    ≤ partitions×counters keys).

    Exactness condition (checked, not assumed): the result is provably the
    true top-k iff the k-th recounted frequency exceeds N/(counters+1) —
    below that bound a non-candidate could hide in the long tail. A result
    that fails the check raises, telling the caller to raise ``counters``
    (or accept ``spark.stat.freqItems``-style approximation elsewhere).
    This is the 100 TB alternative to ``groupBy(col).count().orderBy``
    when the column has billions of distinct values but the question is
    only about the head.
    """
    import pandas as pd

    def mg_partition(batches):
        # weighted Misra–Gries, fully vectorized: merge each batch's
        # value_counts into a pandas Series (C-speed index-aligned add),
        # and prune back to ``counters`` entries by subtracting the
        # (counters+1)-th largest count from all and dropping
        # non-positives. Pruning is amortized (only when the series grows
        # past 4× counters) — the bound proof only needs each subtraction
        # charged against ≥ counters+1 entries, which a larger series
        # satisfies a fortiori. Any value with partition frequency >
        # n_p/(counters+1) provably survives.
        acc = None
        pruned = False
        n_nonnull = 0
        for pdf in batches:
            nn = pdf[col].dropna()
            n_nonnull += len(nn)
            vc = nn.value_counts()
            acc = vc if acc is None else acc.add(vc, fill_value=0)
            if len(acc) > 4 * counters:
                pruned = True
                cut = acc.nlargest(counters + 1).iloc[-1]
                acc = acc[acc > cut] - cut
        if acc is not None and len(acc) > counters:
            pruned = True
            cut = acc.nlargest(counters + 1).iloc[-1]
            acc = acc[acc > cut] - cut
        values = list(acc.index) if acc is not None else []
        # a NULL-value marker row carries the pruned flag AND the
        # partition's exact non-null row count even when pruning emptied
        # the counters (uniform data can zero every counter at once);
        # NULL never matches the semi-join, so it can't pollute the
        # recount. Carrying the count here saves a third full table scan
        # that previously computed N for the certification bound.
        yield pd.DataFrame({"value": values + [None],
                            "pruned": [pruned] * (len(values) + 1),
                            "n": [0] * len(values) + [n_nonnull]})

    field = df.schema[col].dataType.simpleString()
    cands = df.select(col).mapInPandas(
        mg_partition, schema=f"value {field}, pruned boolean, n long")
    from funnel_rocket_spark.operators.dedup import bounded_persist
    cands = bounded_persist(cands)
    try:
        candidates = cands.select("value").distinct()
        exact = (df.join(F.broadcast(candidates),
                         df[col] == candidates["value"], "left_semi")
                 .groupBy(F.col(col).alias("value"))
                 .agg(F.count(F.lit(1)).alias("cnt"))
                 .orderBy(F.desc("cnt"), F.asc("value")).limit(k))
        # ONE collect for the recount AND the certification aggregate:
        # the two are independent branches of a tagged union, so their
        # stages run concurrently instead of as two sequential driver
        # round-trips (the fused-collect idiom from the LM/DSIR
        # trainers). Union order is not guaranteed across branches, so
        # the top-k rows are re-sorted driver-side by the same
        # (cnt desc, value asc) key the orderBy used.
        vcol = F.col("value").cast(field)
        tagged = (exact.select(
                      F.lit(0).alias("__t"), vcol.alias("value"), "cnt",
                      F.lit(None).cast("boolean").alias("pruned"),
                      F.lit(None).cast("long").alias("n"))
                  .unionByName(cands.agg(
                      F.max("pruned").alias("pruned"),
                      F.coalesce(F.sum(F.when(F.col("value").isNull(),
                                              F.col("n"))),
                                 F.lit(0)).alias("n"))
                      .select(F.lit(1).alias("__t"),
                              F.lit(None).cast(field).alias("value"),
                              F.lit(None).cast("long").alias("cnt"),
                              "pruned", "n")))
        collected = tagged.collect()
        agg_row = next(r for r in collected if r["__t"] == 1)
        any_pruned, total = bool(agg_row["pruned"]), int(agg_row["n"])
        rows = sorted(((r["value"], r["cnt"])
                       for r in collected if r["__t"] == 0),
                      key=lambda r: (-r[1], r[0]))
        # if no partition ever pruned, the candidate set is ALL values and
        # the recount is trivially the exact answer; otherwise certify via
        # the sketch bound
        bound = total / (counters + 1)
        if any_pruned and (len(rows) < k or
                           (rows and rows[-1][1] <= bound)):
            kth = rows[-1][1] if rows else 0
            raise ValueError(
                f"heavy_hitters: k-th frequency {kth} is not above the "
                f"Misra-Gries bound N/(counters+1) = {bound:.1f}; raise "
                f"`counters` for a provably exact top-{k}")
    finally:
        # the raise-and-retry-with-larger-counters path must not leak the
        # cached candidate frame
        cands.unpersist()
    return df.sparkSession.createDataFrame(
        rows, schema=f"value {field}, cnt long")
