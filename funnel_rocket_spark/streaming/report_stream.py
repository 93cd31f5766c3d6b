"""Always-on sequence funnel reports (r12).

:mod:`~funnel_rocket_spark.streaming.sequence_aggs` (earlier this round)
ships the two streaming inputs — the watermarked match stream and the
JVM-side per-``(group, value)`` partials stream — plus on-demand READERS
over their upsert stores. This module is the ALWAYS-ON orchestration the
roadmap asked for: one call wires both queries over a streaming source
and keeps the batch engine's funnel report (step counts + per-value
step aggregations) continuously materialized as parquet, refreshed from
inside the partials query's ``foreachBatch`` sink.

Design points:

* **Two queries, one source.** Spark allows several streaming queries
  over one streaming DataFrame lineage — each keeps independent offsets
  in its own checkpoint, so the match query (Python stateful fold) and
  the partials query (pure Tungsten aggregation) progress at their own
  pace. No cross-query coordination is needed: the report is a
  read-time join of the two stores, and each store is prefix-closed
  under its own watermark, so any interleaving yields the exact report
  over "events both queries have folded so far" — converging to the
  batch answer once the source drains (the same update-mode contract as
  the stores themselves, ``sequence_aggs`` module docstring).
* **Reports refresh inside foreachBatch.** The partials sink first
  upserts its micro-batch, then rewrites the two report directories via
  temp-write → atomic rename — a reader never observes a half-written
  report, only the previous complete one. Refreshing from ONE sink (not
  both) avoids two queries racing on the same rename target.
* **Stores stay bounded.** Every ``compact_every`` micro-batches the
  sink compacts both upsert stores (latest batch id wins —
  ``compact_latest`` is a no-op on the answer, property-tested), so
  read cost tracks the live key count, not stream lifetime.
* **Finite replays** (backfill tails, tests) run with
  ``trigger(availableNow=True)`` + the heartbeat pattern documented on
  :func:`~funnel_rocket_spark.streaming.sequence_stream.
  watermarked_sequence_match`; always-on deployments just omit the
  trigger. Either way the checkpoints make restarts resume-exact.

Scale: state is one JVM row per live (group, value) plus one scalar row
per group; the report rewrite is two tiny aggregates over the stores
(bounded by live keys, never by events); nothing here scans history.
The batch engine remains the bulk-backfill path (docs/operators.md).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from funnel_rocket_spark.streaming.sequence_aggs import (
    compact_latest,
    group_value_partials,
    sequence_step_counts,
    sequence_step_value_aggs,
    upsert_latest,
)
from funnel_rocket_spark.streaming.sequence_stream import (
    watermarked_sequence_match,
)

STEP_COUNTS = "step_counts"
VALUE_AGGS = "value_aggs"


def _publish(df: DataFrame, target: str) -> None:
    """Temp-write → swap → delete, the same crash-safe ordering as
    ``compact_band_index``: a crash leaves either the old complete
    report or the new one, never a partial directory."""
    tmp, old = target + ".tmp", target + ".old"
    for stale in (tmp, old):  # debris from a crash mid-publish
        if os.path.exists(stale):
            shutil.rmtree(stale)
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(target):
        os.rename(target, old)
    os.rename(tmp, target)
    if os.path.exists(old):
        shutil.rmtree(old)


@dataclass
class SequenceReportStream:
    """Handle over the two running queries + the report directory."""

    workdir: str
    n_steps: int
    queries: list = field(default_factory=list)

    @property
    def matches_path(self) -> str:
        return os.path.join(self.workdir, "matches")

    @property
    def partials_path(self) -> str:
        return os.path.join(self.workdir, "partials")

    def report_path(self, which: str) -> str:
        return os.path.join(self.workdir, "reports", which)

    def step_counts(self, spark: SparkSession) -> DataFrame:
        """The continuously-maintained step-counts report (parquet)."""
        return spark.read.parquet(self.report_path(STEP_COUNTS))

    def value_aggs(self, spark: SparkSession) -> DataFrame:
        """The continuously-maintained per-value report (parquet)."""
        return spark.read.parquet(self.report_path(VALUE_AGGS))

    def await_termination(self, timeout: Optional[int] = None) -> None:
        for q in self.queries:
            q.awaitTermination(timeout)

    def stop(self) -> None:
        for q in self.queries:
            q.stop()


def start_sequence_report_stream(
    events: DataFrame,
    sequence: list[dict],
    group_col: str,
    ts_col: str,
    value_col: str,
    workdir: str,
    metric_col: Optional[str] = None,
    watermark: str = "10 minutes",
    max_duration: Optional[float] = None,
    compact_every: int = 64,
    available_now: bool = False,
) -> SequenceReportStream:
    """Start the always-on funnel-report pipeline over a streaming
    ``events`` DataFrame: the watermarked match query and the
    per-(group, value) partials query, each upserting its store under
    ``workdir``, with the partials sink republishing
    ``workdir/reports/{step_counts,value_aggs}`` after every
    micro-batch and compacting both stores every ``compact_every``
    batches. Returns a handle exposing the queries, the store paths and
    report readers.

    ``available_now=True`` runs one finite replay of whatever the
    source currently holds and stops (follow the data with the two
    heartbeat batches to drain buffered groups — see
    ``watermarked_sequence_match``); the default is an always-on
    continuous trigger. Restarts with the same ``workdir`` resume from
    the checkpoints exactly.
    """
    spark = events.sparkSession
    n_steps = len(sequence)
    h = SequenceReportStream(workdir=workdir, n_steps=n_steps)
    ckpt = os.path.join(workdir, "ckpt")

    matches = watermarked_sequence_match(
        events, sequence, group_col, ts_col,
        watermark=watermark, max_duration=max_duration)
    w1 = (matches.writeStream
          .foreachBatch(upsert_latest(h.matches_path))
          .outputMode("update")
          .option("checkpointLocation", os.path.join(ckpt, "matches")))

    upsert_partials = upsert_latest(h.partials_path)

    def partials_sink(batch_df: DataFrame, batch_id: int) -> None:
        upsert_partials(batch_df, batch_id)
        if compact_every and batch_id and batch_id % compact_every == 0:
            compact_latest(spark, h.partials_path, ["group_id", "value"])
            if os.path.exists(h.matches_path):
                compact_latest(spark, h.matches_path, ["group_id"])
        # the matches store may not exist yet (independent query pace);
        # publish once both inputs of the read-time join are on disk
        if not os.path.exists(h.matches_path):
            return
        _publish(sequence_step_counts(
            spark, h.matches_path, h.partials_path, n_steps),
            h.report_path(STEP_COUNTS))
        _publish(sequence_step_value_aggs(
            spark, h.matches_path, h.partials_path, n_steps),
            h.report_path(VALUE_AGGS))

    partials = group_value_partials(events, group_col, value_col,
                                    metric_col=metric_col)
    w2 = (partials.writeStream.foreachBatch(partials_sink)
          .outputMode("update")
          .option("checkpointLocation", os.path.join(ckpt, "partials")))
    if available_now:
        w1, w2 = w1.trigger(availableNow=True), w2.trigger(availableNow=True)

    # start the MATCH query first and, on finite replays, run it to
    # completion before the partials query starts publishing — an
    # always-on deployment doesn't care (reports converge), but a
    # drained replay should leave the final report on disk
    q1 = w1.start()
    if available_now:
        q1.awaitTermination()
    q2 = w2.start()
    h.queries = [q1, q2]
    return h
