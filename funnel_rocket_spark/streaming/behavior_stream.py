"""Always-on retention / activity reports over an event stream (r12).

The batch behavior suite's retention operators
(:func:`~funnel_rocket_spark.operators.behavior.retention_cohorts`,
:func:`~funnel_rocket_spark.operators.behavior.retention_rates`) reduce
the raw stream to ONE sufficient statistic: the DISTINCT (group, period)
activity frame — cohort labels, period indices, triangle counts and
DN-rates are all derived from it with bounded aggregates. That makes the
streaming twin almost free: maintain the activity frame incrementally as
an update-mode JVM aggregation (state = one Tungsten row per live
(group, period) — exactly the cardinality the batch distinct
materializes, no Python anywhere), upsert it into the same parquet
"latest-value" store the funnel reports use, and rebuild the reports
read-time BY CALLING THE BATCH OPERATORS on the store. Parity is by
construction, not by re-implementation: the store rows feed
``retention_cohorts`` / ``retention_rates`` verbatim, so the two code
paths cannot drift.

Unlike the sequence stream, retention needs no watermark and no arrival
order: distinct-ness and min() are order-insensitive, so any
interleaving of micro-batches converges to the batch answer the moment
the source drains — there is nothing to seal. (A late event can only
flip a (group, period) cell 0→1 or move a cohort earlier, and the
update-mode aggregation emits exactly those changed keys.)

Scale: the only pass over full data is the map-side-combinable
streaming aggregation; the store holds live (group, period) keys; each
report rewrite is a bounded aggregate over the store (the same frames
the batch engine builds), republished atomically via temp-write → swap.
The batch engine remains the bulk-backfill path (docs/operators.md).

Reference scope note: the reference has no streaming surface
(SURVEY §2.10); this extends the r12 report-stream family
(``report_stream.py``) to the behavior suite, closing the roadmap's
"retention/behavior report battery" candidate.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from funnel_rocket_spark.operators.behavior import (
    NANOS_WEEK,
    retention_cohorts,
    retention_rates,
)
from funnel_rocket_spark.streaming.report_stream import _publish
from funnel_rocket_spark.streaming.sequence_aggs import (
    ROWS,
    compact_latest,
    read_latest,
    upsert_latest,
)

COHORTS = "retention_cohorts"
RATES = "retention_rates"
ACTIVITY = "activity_rollup"


def activity_partials(events: DataFrame, group_col: str,
                      ts_col: str, period: int = NANOS_WEEK) -> DataFrame:
    """Cumulative per-(group, period) row counts as an update-mode
    streaming aggregation over a NUMERIC (epoch-nanos) event-time
    column — the same floor-bucketing as the batch activity frame
    (``behavior._group_partitioned_activity``: pmod, so pre-epoch
    timestamps bucket correctly). State: one JVM row per live
    (group, period)."""
    bucket = (F.col(ts_col)
              - F.pmod(F.col(ts_col), F.lit(int(period)))).alias("period")
    return (events
            .groupBy(F.col(group_col).alias("group_id"), bucket)
            .agg(F.count(F.lit(1)).alias(ROWS)))


def _activity_frame(spark: SparkSession, path: str) -> DataFrame:
    """The store resolved to the batch operators' input shape: one row
    per (group, period), with the period start replayed as the row's
    timestamp — ``__ts`` is a period multiple, so the batch operators'
    own bucketing maps it back to exactly this period."""
    act = read_latest(spark, path, ["group_id", "period"])
    return act.select("group_id", F.col("period").alias("__ts"),
                      F.col(ROWS).alias("__rows"))


def retention_cohorts_report(spark: SparkSession, path: str,
                             period: int = NANOS_WEEK) -> DataFrame:
    """(cohort, period_index, n_active) — the batch
    :func:`retention_cohorts` evaluated on the live activity store."""
    return retention_cohorts(_activity_frame(spark, path),
                             "group_id", "__ts", period)


def retention_rates_report(spark: SparkSession, path: str,
                           period: int = NANOS_WEEK,
                           horizons: list[int] = (1, 7)) -> DataFrame:
    """(cohort, n_groups, rate_p{N}...) — the batch
    :func:`retention_rates` evaluated on the live activity store."""
    return retention_rates(_activity_frame(spark, path),
                           "group_id", "__ts", period=period,
                           horizons=horizons)


def activity_rollup_report(spark: SparkSession, path: str) -> DataFrame:
    """(period, n_active, n_rows) per period — the DAU/WAU-style rollup
    the activity store carries for free (store keys are already
    distinct, so n_active needs no countDistinct)."""
    return (_activity_frame(spark, path)
            .groupBy(F.col("__ts").alias("period"))
            .agg(F.count(F.lit(1)).alias("n_active"),
                 F.sum("__rows").alias("n_rows"))
            .orderBy("period"))


@dataclass
class BehaviorReportStream:
    """Handle over the running activity query + report directory."""

    workdir: str
    period: int
    horizons: tuple
    queries: list = field(default_factory=list)

    @property
    def activity_path(self) -> str:
        return os.path.join(self.workdir, "activity")

    def report_path(self, which: str) -> str:
        return os.path.join(self.workdir, "reports", which)

    def retention_cohorts(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.report_path(COHORTS))

    def retention_rates(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.report_path(RATES))

    def activity_rollup(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.report_path(ACTIVITY))

    def await_termination(self, timeout: Optional[int] = None) -> None:
        for q in self.queries:
            q.awaitTermination(timeout)

    def stop(self) -> None:
        for q in self.queries:
            q.stop()


def start_behavior_report_stream(
    events: DataFrame,
    group_col: str,
    ts_col: str,
    workdir: str,
    period: int = NANOS_WEEK,
    horizons: tuple = (1, 7),
    compact_every: int = 64,
    available_now: bool = False,
) -> BehaviorReportStream:
    """Start the always-on retention pipeline over a streaming
    ``events`` DataFrame (numeric epoch-nanos ``ts_col``): one
    update-mode activity query upserting its store under ``workdir``,
    whose sink republishes ``workdir/reports/{retention_cohorts,
    retention_rates,activity_rollup}`` after every micro-batch and
    compacts the store every ``compact_every`` batches.

    ``available_now=True`` runs one finite replay of whatever the
    source currently holds and stops — no heartbeats needed (nothing is
    watermark-buffered; the reports are exact the moment the source
    drains). Restarts with the same ``workdir`` resume from the
    checkpoint exactly: a replayed micro-batch re-appends the same
    (key, batch_id) rows, which ``read_latest``'s max_by collapses.
    """
    spark = events.sparkSession
    h = BehaviorReportStream(workdir=workdir, period=period,
                             horizons=tuple(horizons))
    upsert = upsert_latest(h.activity_path)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        upsert(batch_df, batch_id)
        if compact_every and batch_id and batch_id % compact_every == 0:
            compact_latest(spark, h.activity_path, ["group_id", "period"])
        _publish(retention_cohorts_report(spark, h.activity_path, period),
                 h.report_path(COHORTS))
        _publish(retention_rates_report(spark, h.activity_path, period,
                                        list(h.horizons)),
                 h.report_path(RATES))
        _publish(activity_rollup_report(spark, h.activity_path),
                 h.report_path(ACTIVITY))

    w = (activity_partials(events, group_col, ts_col, period)
         .writeStream.foreachBatch(sink)
         .outputMode("update")
         .option("checkpointLocation", os.path.join(workdir, "ckpt")))
    if available_now:
        w = w.trigger(availableNow=True)
    h.queries = [w.start()]
    return h
