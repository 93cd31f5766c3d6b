"""General-OLAP operators beyond the reference's aggregation set.

Currently: exact grouped percentiles in histogram form. Spark's native
``percentile`` is a holistic TypedImperativeAggregate — every partial buffer
carries ALL raw values to as many reduce tasks as there are groups, so a
3-group percentile over 100 TB funnels the whole column through 3 tasks.
The histogram formulation keeps everything in whole-stage codegen:

1. ``groupBy(keys, value).count()`` — map-side partial aggregation compresses
   repeated values BEFORE the shuffle; shuffle keys are (key, value), spread
   across all partitions.
2. One window pass per key over the (much smaller) distinct-value histogram
   computes cumulative and total counts.
3. Each requested quantile becomes two conditional ``min()`` aggregates
   (the floor/ceil neighbors of the target rank) + linear interpolation —
   bit-identical to ``percentile`` / DuckDB ``quantile_cont`` semantics
   (rank ``q*(n-1)``, nulls ignored).

The reference has no percentile aggregations at all (SURVEY §2.4 "absent").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_exact_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value,
    quantiles: dict[str, float],
) -> DataFrame:
    """Exact linear-interpolation percentiles of ``value`` per group.

    ``quantiles`` maps output column name → q in [0, 1]. Returns one row per
    group with a double column per requested quantile. Null values are
    ignored (matching ``percentile`` / ``quantile_cont``); a group whose
    values are all null yields nulls.
    """
    for name, q in quantiles.items():
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {name}={q} outside [0, 1]")
    val = value if isinstance(value, Column) else F.col(value)

    hist = (
        df.where(val.isNotNull())
        .groupBy(*group_cols, val.alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    h = hist.select(
        *group_cols,
        "__v",
        F.sum("__c").over(w_cum).alias("__cum"),
        F.sum("__c").over(w_all).alias("__n"),
    )

    aggs = []
    for name, q in quantiles.items():
        pos = F.lit(q) * (F.col("__n") - 1)
        lo, hi = F.floor(pos), F.ceil(pos)
        # the value covering zero-indexed rank r is the first histogram row
        # with cumulative count > r
        v_lo = F.min(F.when(F.col("__cum") >= lo + 1, F.col("__v")))
        v_hi = F.min(F.when(F.col("__cum") >= hi + 1, F.col("__v")))
        frac = F.min(pos - lo)  # per-group constant
        aggs.append(
            (v_lo.cast("double") + frac * (v_hi - v_lo).cast("double")).alias(name)
        )
    return h.groupBy(*group_cols).agg(*aggs)


def exact_ntile(df: DataFrame, n: int, order_cols: list[Column | str],
                partitions: int | None = None,
                out_col: str = "bucket") -> DataFrame:
    """Exact global ``ntile(n)`` without the single-partition window trap.

    ``ntile`` over ``Window.orderBy(...)`` (no partitionBy) funnels the
    ENTIRE dataset through one task — the classic Spark cluster-killer for
    global ranking. This formulation keeps every step distributed:

    1. ``repartitionByRange`` on the order columns — a distributed sort
       shuffle; ranges sampled, data spread over ``partitions`` tasks.
    2. Per-partition row counts (a tiny ``spark_partition_id`` aggregate,
       ~#partitions rows) → cumulative offsets, broadcast back.
    3. ``row_number`` windowed *per partition* (distributed) + the
       partition's offset = exact global rank; total N rides the same
       broadcast.
    4. ntile bucket from (rank, N) arithmetic, matching SQL semantics
       bit-for-bit: with N = n*q + r, the first r buckets get q+1 rows.

    The offsets are computed IN-PLAN from the same range exchange the final
    ranking reads (both branches share one canonicalized shuffle →
    ReusedExchange), never via a separate collect job: range bounds are
    *sampled*, so a second job over nondeterministically-ordered upstream
    rows (e.g. a hash aggregate) can re-sample different bounds, and
    offsets measured on partitioning A applied to partitioning B yield
    phantom ranks > N (observed as an 11th decile of size 1). One action =
    one exchange = one consistent partitioning. Order must be total
    (include a unique tie-break column) for deterministic buckets.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    p = partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    ranged = (df.repartitionByRange(int(p), *cols)
              .withColumn("__pid", F.spark_partition_id()))
    # per-partition sizes → cumulative offsets + grand total. ~p rows, so
    # the single-partition windows are trivial; the broadcast back to the
    # big side is p rows too.
    w_cum = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    offsets = (
        ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c"))
        .select(
            "__pid",
            F.coalesce(F.sum("__c").over(w_cum), F.lit(0)).alias("__off"),
            F.sum("__c").over(w_all).alias("__n")))
    w = Window.partitionBy("__pid").orderBy(*cols)
    joined = ranged.join(F.broadcast(offsets), "__pid")
    rank = F.col("__rank")
    q = F.floor(F.col("__n") / n)          # small-bucket size
    r = F.col("__n") % n                   # number of (q+1)-sized buckets
    # first r buckets have q+1 rows; ranks beyond r*(q+1) fall into q-sized
    # buckets (guard q == 0: fewer rows than buckets → bucket == rank)
    big_span = r * (q + 1)
    bucket = (
        F.when(rank <= big_span, F.ceil(rank / (q + 1)))
        .when(q > 0, r + F.ceil((rank - big_span) / q))
        .otherwise(rank))
    return (joined
            .withColumn("__rank",
                        F.row_number().over(w) + F.col("__off"))
            .withColumn(out_col, bucket.cast("int"))
            .drop("__pid", "__rank", "__off", "__n", "__c"))
