from funnel_rocket_spark.streaming.counts import streaming_value_counts
from funnel_rocket_spark.streaming.dedup_stream import (
    content_digest,
    streaming_exact_dedup,
)
from funnel_rocket_spark.streaming.funnel_stream import incremental_funnel
from funnel_rocket_spark.streaming.incremental_dedup import (
    compact_band_index,
    streaming_incremental_dedup,
)
from funnel_rocket_spark.streaming.rollup import (
    nanos_to_timestamp,
    streaming_time_rollup,
)
from funnel_rocket_spark.streaming.sequence_aggs import (
    compact_latest,
    group_value_partials,
    read_latest,
    sequence_step_counts,
    sequence_step_value_aggs,
    upsert_latest,
)
from funnel_rocket_spark.streaming.behavior_stream import (
    BehaviorReportStream,
    activity_partials,
    activity_rollup_report,
    retention_cohorts_report,
    retention_rates_report,
    start_behavior_report_stream,
)
from funnel_rocket_spark.streaming.report_stream import (
    SequenceReportStream,
    start_sequence_report_stream,
)
from funnel_rocket_spark.streaming.sequence_stream import (
    watermarked_sequence_match,
)
from funnel_rocket_spark.streaming.sessions import streaming_session_stats

__all__ = [
    "activity_partials",
    "activity_rollup_report",
    "BehaviorReportStream",
    "compact_band_index",
    "compact_latest",
    "content_digest",
    "group_value_partials",
    "incremental_funnel",
    "nanos_to_timestamp",
    "read_latest",
    "retention_cohorts_report",
    "retention_rates_report",
    "SequenceReportStream",
    "sequence_step_counts",
    "sequence_step_value_aggs",
    "start_behavior_report_stream",
    "start_sequence_report_stream",
    "streaming_exact_dedup",
    "streaming_incremental_dedup",
    "streaming_session_stats",
    "streaming_time_rollup",
    "streaming_value_counts",
    "upsert_latest",
    "watermarked_sequence_match",
]
