from funnel_rocket_spark.planner.compiler import QueryPlan, filter_to_column

__all__ = ["QueryPlan", "filter_to_column"]
