"""funnel_rocket_spark — a PySpark-native funnel / behavioral-cohort analytics engine.

A from-scratch rebuild of the query semantics of DynamicYieldProjects/funnel-rocket
(reference at /root/reference) on Apache Spark DataFrames. Where the reference fans
out Pandas-per-Parquet-file work over AWS Lambda workers and reduces results on an
invoker, this engine compiles the same query JSON into a single lazy DataFrame
program and lets Catalyst/Tungsten plan, optimize, and execute it — on one machine
or a thousand executors.

Semantics parity targets are cited throughout as ``reference file:line``.
"""

from funnel_rocket_spark.engine.engine import QueryEngine
from funnel_rocket_spark.catalog import Dataset, register_dataset

__version__ = "0.10.0"  # keep in lockstep with pyproject.toml

__all__ = ["QueryEngine", "Dataset", "register_dataset", "__version__"]
