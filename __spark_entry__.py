"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship funnel query on sf0.001; ``queries`` /
``oracle_sql`` expose every implemented operator (see SURVEY.md §2 and the
training-data pipeline extensions) with DuckDB-checkable oracles. All
implementations live in the ``funnel_rocket_spark`` package.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from funnel_rocket_spark import benchqueries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: signup→click→purchase funnel per-step counts on sf0.001."""
    return benchqueries.QUERIES["fr_funnel_steps"][0](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return benchqueries.queries()


def oracle_sql() -> dict[str, str]:
    return benchqueries.oracle_sql()
