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
