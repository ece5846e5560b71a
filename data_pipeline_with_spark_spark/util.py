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


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's own size estimate for the frame's optimized plan —
    the same statistic the planner uses to pick broadcast joins."""
    return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))


def too_big_to_broadcast(df: DataFrame) -> bool:
    """True when Catalyst would NOT broadcast this frame (its size
    estimate exceeds ``spark.sql.autoBroadcastJoinThreshold``, or
    broadcasting is disabled with -1).

    Used by self-join operators to pick their physical shape the way
    Catalyst picks join strategies: below the threshold, letting AQE
    broadcast one aliased side costs one extra scan of a small input
    and ZERO shuffles — cheaper than forcing a shuffle. Above it, a
    broadcast is impossible anyway, and pre-repartitioning on the join
    keys BEFORE aliasing the sides makes both join inputs share one
    Exchange (ReusedExchange), so the expensive subtree computes once
    and only one shuffle moves the data instead of two."""
    spark = df.sparkSession
    raw = str(spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760"))
    try:
        thr = int(raw)
    except ValueError:
        thr = int(
            spark._jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
        )
    if thr < 0:
        return True
    return plan_size_bytes(df) > thr
