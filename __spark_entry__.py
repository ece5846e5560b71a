"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``data_pipeline_with_spark_spark``; this module
only adapts the engine's query registry to the driver's interface.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from data_pipeline_with_spark_spark.plans import all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "w1_topk_per_group"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_queries()[FLAGSHIP].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    ``rotate=True``: this is the driver-gate entry point, so dict order
    uses the least-recently-sampled rotation (red-in-last-sample first,
    then never-sampled, then stalest greens) — the driver samples a
    prefix window, and rotation walks that window across the whole
    catalog over rounds.
    """
    return {name: spec.build for name, spec in all_queries(rotate=True).items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in all_queries(rotate=True).items()
        if spec.oracle is not None
    }
