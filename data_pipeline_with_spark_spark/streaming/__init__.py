from data_pipeline_with_spark_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = ["session_window_agg", "sliding_window_agg", "tumbling_window_agg"]
