from data_pipeline_with_spark_spark.plans.registry import (
    QuerySpec,
    all_queries,
    headline_queries,
)

__all__ = ["QuerySpec", "all_queries", "headline_queries"]
