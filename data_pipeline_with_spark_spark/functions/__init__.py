from data_pipeline_with_spark_spark.functions.udfs import (
    decade_native,
    decade_pandas_udf,
    decade_python_udf,
)

__all__ = ["decade_native", "decade_pandas_udf", "decade_python_udf"]
