from data_pipeline_with_spark_spark.sources.readers import (
    read_csv,
    read_json,
    read_parquet,
    read_table,
    read_testdata,
)
from data_pipeline_with_spark_spark.sources.writers import (
    write_noop,
    write_parquet_table,
)

__all__ = [
    "read_csv",
    "read_json",
    "read_parquet",
    "read_table",
    "read_testdata",
    "write_noop",
    "write_parquet_table",
]
