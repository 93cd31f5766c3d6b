from funnel_rocket_spark.plans.inspect import (
    count_exchanges,
    count_sorts,
    formatted_plan,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schema_columns",
    "count_exchanges",
    "count_sorts",
]
