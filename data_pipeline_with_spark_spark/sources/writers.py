"""Sinks + physical layout (SURVEY §2.1 S5–S7, §2.12 X1–X2).

Reference parity:
- S5 partitioned parquet sink with external path + saveAsTable
  (``data_ingestion_and_cleaning/curate_data.py:121-147``,
  ``data_manipulation/serving_layer.py:275-282``).
- S7 noop sink for benchmarking (``data_manipulation/udf_complex_logic.py:64-68``).
- X1 ``coalesce(1)`` single-file curated writes (``curate_data.py:119-128``).
- X2 ``repartition(partition_cols)`` one-file-per-partition-value
  (``curate_data.py:220-221``, ``serving_layer.py:269-270``).

Scale notes: at 100 TB never ``coalesce(1)`` — ``target_files`` exists
for small curated dims only. ``repartition_by_partition_cols`` before a
``partitionBy`` write is the key trick that survives scale: it turns an
N-tasks × M-partitions small-file explosion into one file per partition
value, and at cluster scale you add a salt bucket (``extra_buckets``) so
a single huge partition value still parallelizes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_parquet_table(
    df: DataFrame,
    path: str,
    table: str | None = None,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    target_files: int | None = None,
    repartition_by_partition_cols: bool = True,
    extra_buckets: int = 1,
) -> None:
    """Parquet sink (S5) with the reference's file-count controls.

    - ``target_files`` → ``coalesce(n)`` (X1), for small dimension tables.
    - ``repartition_by_partition_cols`` → ``repartition(partition_by)``
      (X2) so each hive partition directory gets one file; with
      ``extra_buckets > 1`` a salt column spreads a skewed partition
      value over that many files/tasks.
    """
    out = df
    if partition_by and repartition_by_partition_cols:
        if extra_buckets > 1:
            out = out.withColumn(
                "__bucket", (F.rand(seed=42) * extra_buckets).cast("int")
            )
            out = out.repartition(*(list(partition_by) + ["__bucket"])).drop("__bucket")
        else:
            out = out.repartition(*partition_by)
    elif target_files is not None:
        out = out.coalesce(target_files)
    writer = out.write.mode(mode).format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if table is not None:
        writer.option("path", path).saveAsTable(table)
    else:
        writer.save(path)


def write_files(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    target_files: int | None = None,
    **options: str,
) -> None:
    """Format-generic file sink: parquet/orc/csv/json (the formats a
    vanilla Spark distribution writes without extra packages).

    CSV defaults to ``header=true`` + ``escape='"'`` so a write/read
    round trip through :func:`readers.read_csv` is lossless for quoted
    fields — the reference's CSV dialect (curate_data.py:39,49).
    Columnar formats (parquet/orc) are the scale path; csv/json exist
    for interchange and small serving extracts only.
    """
    out = df.coalesce(target_files) if target_files is not None else df
    writer = out.write.mode(mode).format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true").option("escape", '"')
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_noop(df: DataFrame) -> None:
    """noop sink (S7): materializes the full plan without writing bytes —
    the benchmark action used by the reference's UDF timing harness."""
    df.write.format("noop").mode("overwrite").save()


def ensure_database(spark: SparkSession, name: str, location: str | None = None) -> None:
    """``CREATE DATABASE IF NOT EXISTS`` (reference
    ``curate_data.py:110-111``, ``serving_layer.py:17-22``)."""
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}{loc}")
