from funnel_rocket_spark.engine.engine import QueryEngine

__all__ = ["QueryEngine"]
