"""U3 timing harness (SURVEY §2.10): wall-clock comparison of the three
decade implementations — native Catalyst expression, row-pickled Python
UDF, Arrow pandas UDF — materialized through the noop sink, exactly the
reference's methodology (``udf_complex_logic.py:61-71,98-108``).

Expected ordering (and the doctrine the numbers teach): native < pandas
UDF << Python UDF. Native stays inside whole-stage codegen; the pandas
UDF pays one Arrow hop per batch; the Python UDF pays pickling per row.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_spark.functions.udfs import (
    decade_native,
    decade_pandas_udf,
    decade_python_udf,
)
from data_pipeline_with_spark_spark.sources.readers import read_testdata
from data_pipeline_with_spark_spark.sources.writers import write_noop
from data_pipeline_with_spark_spark.util import ensure_min_partitions


def _time_noop(df: DataFrame) -> float:
    t0 = time.perf_counter()
    write_noop(df)
    return round(time.perf_counter() - t0, 4)


def compare_udf_variants(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """Seconds per variant over orders(order_year); smaller is better."""
    base = ensure_min_partitions(
        read_testdata(spark, sf_dir, "orders").withColumn(
            "order_year", F.year("o_orderdate")
        )
    )
    write_noop(base)  # warm scan
    return {
        "native_expr": _time_noop(base.withColumn("decade", decade_native("order_year"))),
        "pandas_udf": _time_noop(base.withColumn("decade", decade_pandas_udf("order_year"))),
        "python_udf": _time_noop(base.withColumn("decade", decade_python_udf("order_year"))),
    }
