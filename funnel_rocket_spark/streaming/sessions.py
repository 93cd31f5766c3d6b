"""Streaming sessionization: watermark + ``session_window`` aggregation.

EXTENSION beyond the reference (funnel-rocket is strictly batch). The
continuous twin of ``operators.temporal.sessionize``/``session_stats``:
gap-based sessions maintained incrementally by Structured Streaming's
native session window — adjacent events of a group merge while they arrive
within ``gap``; a session is finalized (emitted once, append mode) when the
watermark passes its close.

Scale notes: state is keyed by (group, open session) and merged by the
session-window state store — memory is bounded by the number of OPEN
sessions, not total events seen. The shuffle is the same single exchange on
the group key as the batch window; late events inside the watermark delay
re-open/merge their session correctly, later ones are dropped at the source.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def streaming_session_stats(events: DataFrame, group_col: str, ts_col: str,
                            gap: str, watermark: str = "10 minutes",
                            aggs: Optional[list[Column]] = None) -> DataFrame:
    """Streaming DF → one row per finalized session:
    (group, session_start, session_end, n_events | *aggs).

    ``ts_col`` must be TimestampType; ``gap`` / ``watermark`` are interval
    strings ("30 minutes"). ``session_end`` is last_event + gap (Spark's
    session-window close), so duration = session_end - session_start - gap.
    """
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    out = (events.withWatermark(ts_col, watermark)
           .groupBy(F.session_window(F.col(ts_col), gap).alias("__s"),
                    F.col(group_col))
           .agg(*aggs))
    return out.select(
        F.col(group_col),
        F.col("__s.start").alias("session_start"),
        F.col("__s.end").alias("session_end"),
        *[c for c in out.columns if c not in ("__s", group_col)])
