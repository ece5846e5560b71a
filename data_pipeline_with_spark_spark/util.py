"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition up to ``target`` (default: cluster parallelism) ONLY
    if the input has fewer partitions.

    The scale pattern behind it: CPU-bound per-row stages (hashing,
    shingling, vector math) parallelize by partition count, and a small
    dimension-sized input often arrives as one file → one partition →
    one core. The guard keeps this a no-op on big inputs where the scan
    already yields ≥ cores partitions — no gratuitous shuffle at 100 TB.
    """
    spark = df.sparkSession
    target = target or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
