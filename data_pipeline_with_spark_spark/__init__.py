"""data_pipeline_with_spark_spark — a PySpark-native analytics engine.

A clean-room, Spark-first reimplementation of the capabilities of the
reference pipeline ``elliemci/data-pipeline-with-spark`` (a Databricks
data-lake → lakehouse ETL): layered lake zones, cleaning battery,
denormalizing joins, unpivot/serving aggregations, window top-k, UDF
surface, versioned (Delta-style) tables — plus LLM-data-pipeline
extensions (dedup, similarity search, multimodal columns, text
analysis) designed to scale to a multi-executor cluster.

Everything is expressed through the public PySpark DataFrame/SQL API so
Catalyst/Tungsten/AQE do the physical planning. No RDD-level compute.
"""

from data_pipeline_with_spark_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]

__version__ = "0.1.0"
