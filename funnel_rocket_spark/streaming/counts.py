"""Streaming per-value counts — the continuous twin of the engine's
countPerValue / groupsPerValue aggregations (reference
``engine/query_aggregations.py``, SURVEY §2.4 A5/A6; the reference has no
streaming at all, §2.10).

Windowed groupBy over the event-time axis with a watermark: each
(window, value) row finalizes once the watermark passes the window end —
append-mode output, so downstream sinks see each bucket exactly once.
Distinct groups per value uses HLL ``approx_count_distinct``: exact
distinct across an unbounded stream would need unbounded state, and the
engine's batch path already exposes the same approx/exact trade under
``approx: true``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_value_counts(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    window: str = "1 minute",
    watermark: str = "30 seconds",
    group_col: Optional[str] = None,
) -> DataFrame:
    """(bucket_start, value, count[, approx_groups]) per closed window.

    State per trigger is one row per (open window, distinct value) —
    bounded by value cardinality × windows inside the watermark horizon.
    The aggregation is map-side combinable before the shuffle, exactly
    like its batch twin.
    """
    aggs = [F.count(F.lit(1)).alias("count")]
    if group_col is not None:
        aggs.append(F.approx_count_distinct(group_col).alias("approx_groups"))
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("__w"), F.col(value_col))
        .agg(*aggs)
    )
    cols = [F.col("__w.start").alias("bucket_start"),
            F.col(value_col).alias("value"), F.col("count")]
    if group_col is not None:
        cols.append(F.col("approx_groups"))
    return out.select(*cols)
