from funnel_rocket_spark.streaming.funnel_stream import incremental_funnel

__all__ = ["incremental_funnel"]
