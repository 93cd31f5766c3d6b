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

    The only driver-side data is one row per partition. Order must be
    total (include a unique tie-break column) for deterministic buckets.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    p = partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    ranged = (df.repartitionByRange(int(p), *cols)
              .sortWithinPartitions(*cols)
              .withColumn("__pid", F.spark_partition_id()))
    sizes = ranged.groupBy("__pid").count().orderBy("__pid").collect()
    offs, total, acc = {}, 0, 0
    for row in sizes:
        offs[row["__pid"]] = acc
        acc += row["count"]
    total = acc
    off_map = F.create_map(
        *[F.lit(x) for kv in offs.items() for x in kv]) if offs else F.create_map()
    w = Window.partitionBy("__pid").orderBy(*cols)
    rank = (F.row_number().over(w) + off_map[F.col("__pid")]).alias("__rank")
    q, r = divmod(total, n)
    # first r buckets have q+1 rows; ranks beyond r*(q+1) fall into q-sized
    # buckets (guard q == 0: fewer rows than buckets → bucket == rank)
    big_span = r * (q + 1)
    in_big = F.col("__rank") <= F.lit(big_span)
    bucket = F.when(in_big, F.ceil(F.col("__rank") / F.lit(q + 1)))
    bucket = (bucket.otherwise(
        F.lit(r) + F.ceil((F.col("__rank") - F.lit(big_span)) / F.lit(q)))
        if q > 0 else bucket.otherwise(F.col("__rank")))
    return (ranged.select("*", rank)
            .withColumn(out_col, bucket.cast("int"))
            .drop("__pid", "__rank"))
