from funnel_rocket_spark.sources.ingest import (
    ingest_csv_denormalized,
    repartition_by_group,
)

__all__ = ["ingest_csv_denormalized", "repartition_by_group"]
