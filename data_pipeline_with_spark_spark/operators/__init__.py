from data_pipeline_with_spark_spark.operators.projection import (
    add_column,
    cast_columns,
    normalize_column_names,
    rename_columns,
    select_columns,
)
from data_pipeline_with_spark_spark.operators.filters import (
    distinct_rows,
    drop_all_null_rows,
    filter_expr,
    filter_in,
    filter_not_contains,
    filter_not_null,
    filter_rlike,
)
from data_pipeline_with_spark_spark.operators.joins import equi_join, expr_join
from data_pipeline_with_spark_spark.operators.asof import asof_join, range_join
from data_pipeline_with_spark_spark.operators.aggregates import group_agg, table_stats
from data_pipeline_with_spark_spark.operators.windows import lag_diff, top_k_per_group
from data_pipeline_with_spark_spark.operators.setops import union_by_name
from data_pipeline_with_spark_spark.operators.reshape import melt, pivot_wide

__all__ = [
    "add_column",
    "cast_columns",
    "normalize_column_names",
    "rename_columns",
    "select_columns",
    "distinct_rows",
    "drop_all_null_rows",
    "filter_expr",
    "filter_in",
    "filter_not_contains",
    "filter_not_null",
    "filter_rlike",
    "equi_join",
    "expr_join",
    "asof_join",
    "range_join",
    "group_agg",
    "table_stats",
    "lag_diff",
    "top_k_per_group",
    "union_by_name",
    "melt",
    "pivot_wide",
]
