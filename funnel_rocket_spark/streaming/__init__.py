from funnel_rocket_spark.streaming.funnel_stream import incremental_funnel
from funnel_rocket_spark.streaming.rollup import (
    nanos_to_timestamp,
    streaming_time_rollup,
)

__all__ = ["incremental_funnel", "nanos_to_timestamp", "streaming_time_rollup"]
