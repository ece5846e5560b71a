from data_pipeline_with_spark_spark.lake.sql_router import LakehouseSQL
from data_pipeline_with_spark_spark.lake.versioned import VersionedTable
from data_pipeline_with_spark_spark.lake.zones import LakeLayout

__all__ = ["VersionedTable", "LakeLayout", "LakehouseSQL"]
