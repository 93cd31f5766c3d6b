"""Streaming time-bucketed rollup: watermark + windowed aggregation.

EXTENSION beyond the reference (funnel-rocket is strictly batch). This is
the continuous version of ``operators.temporal.time_rollup``: the same
fixed-window buckets, maintained incrementally by Structured Streaming.
Late events within the watermark delay still land in their (already open)
bucket; buckets older than the watermark are finalized and evicted from
state — bounded memory at any input rate.

Scale notes: state is keyed by (window, *group_cols) — uniform by
construction, the same no-skew property as the batch rollup. Partial
aggregation happens map-side before the state-store shuffle, so per-batch
shuffle volume is bounded by cardinality, not input rows.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def nanos_to_timestamp(col: Column) -> Column:
    """int64 epoch-nanos (how TIMESTAMP(NANOS) parquet arrives under
    ``nanosAsLong``) → TimestampType, truncated to microseconds.

    Division goes through decimal, not ``/``: long ``/`` promotes to
    double, whose ~256 ns ulp at epoch scale can round UP before the
    long cast — an event exactly at a window/session boundary would land
    in the wrong bucket. decimal(20,0)/1000 is exact; the long cast
    truncates the fraction (true truncation, as documented)."""
    return F.timestamp_micros(
        (col.cast("decimal(20,0)") / F.lit(1000)).cast("long"))


def streaming_time_rollup(events: DataFrame, ts_col: str, every: str,
                          watermark: str = "10 minutes",
                          group_cols: Optional[list[str]] = None,
                          aggs: Optional[list[Column]] = None) -> DataFrame:
    """Streaming DF → per-(window, *group_cols) aggregates, append mode.

    ``ts_col`` must be TimestampType (use :func:`nanos_to_timestamp` for the
    raw int64-nanos columns this engine's datasets carry). ``every`` and
    ``watermark`` are interval strings ("1 day", "5 minutes"). Returns
    (bucket_start, bucket_end, *group_cols, *aggs); with append output mode
    each bucket emits exactly once, when the watermark passes its end.
    """
    keys = [F.window(F.col(ts_col), every).alias("__w")]
    keys += [F.col(c) for c in (group_cols or [])]
    aggs = aggs or [F.count(F.lit(1)).alias("n_rows")]
    out = (events.withWatermark(ts_col, watermark)
           .groupBy(*keys).agg(*aggs))
    return out.select(F.col("__w.start").alias("bucket_start"),
                      F.col("__w.end").alias("bucket_end"),
                      *[c for c in out.columns if c != "__w"])
