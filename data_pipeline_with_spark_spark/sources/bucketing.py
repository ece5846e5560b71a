"""Bucketed tables: pre-shuffled storage for co-located joins.

The 100 TB pattern the reference never needed but a fact-to-fact
pipeline does: write both join sides bucketed (and sorted) on the join
key with the same bucket count → Spark's scan reports the hash
partitioning → the sort-merge join needs NO Exchange on either side.
For a daily lineitem⋈orders-scale join this removes the two largest
shuffles in the pipeline; tests/test_scale_patterns.py asserts the
Exchange-free plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """saveAsTable with hash bucketing (+ optional in-bucket sort).
    Bucket count is a layout contract: both sides of a co-located join
    must use the same ``num_buckets``."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the
    planner elides both shuffle Exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on=list(on), how=how)
