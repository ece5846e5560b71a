"""Streaming-window query catalog (SURVEY §2.13): the batch-checkable
faces of the streaming operators. The identical window expressions run
under readStream in streaming/demo.py (pytest asserts equivalence).

Oracle notes: Spark tumbling/sliding windows align to the unix epoch →
DuckDB floor(epoch/w)*w arithmetic; session windows are half-open
(new session at exactly prev + gap → ``>=`` in the gaps-and-islands
formulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_with_spark_spark.plans.registry import QuerySpec, register
from data_pipeline_with_spark_spark.sources.readers import read_testdata
from data_pipeline_with_spark_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)


def _tumbling(spark: SparkSession, sf: str) -> DataFrame:
    return tumbling_window_agg(read_testdata(spark, sf, "events"))


register(
    QuerySpec(
        name="stream_tumbling_window",
        build=_tumbling,
        headline=True,
        doc="10-minute tumbling event-time windows (batch face)",
        oracle="""
        SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS win_start,
               count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1
        """,
    )
)


def _sliding(spark: SparkSession, sf: str) -> DataFrame:
    return sliding_window_agg(read_testdata(spark, sf, "events"))


register(
    QuerySpec(
        name="stream_sliding_window",
        build=_sliding,
        doc="10-minute windows sliding every 5 (each event in 2 windows)",
        oracle="""
        WITH expanded AS (
          SELECT e.*, CAST(floor(epoch(ts) / 300) * 300 - off AS BIGINT) AS win_start
          FROM events e, (SELECT unnest([0, 300]) AS off)
          WHERE epoch(ts) >= floor(epoch(ts) / 300) * 300 - off
            AND epoch(ts) < floor(epoch(ts) / 300) * 300 - off + 600
        )
        SELECT win_start, count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM expanded GROUP BY 1
        """,
    )
)


def _session(spark: SparkSession, sf: str) -> DataFrame:
    return session_window_agg(read_testdata(spark, sf, "events"))


register(
    QuerySpec(
        name="stream_session_window",
        build=_session,
        doc="per-user session windows, 5-minute inactivity gap",
        oracle="""
        WITH e AS (SELECT user_id, value, epoch(ts) AS t FROM events),
        l AS (SELECT *, lag(t) OVER (PARTITION BY user_id ORDER BY t) AS pt FROM e),
        g AS (SELECT *, sum(CASE WHEN pt IS NULL OR t - pt >= 300 THEN 1 ELSE 0 END)
                          OVER (PARTITION BY user_id ORDER BY t
                                ROWS UNBOUNDED PRECEDING) AS sid
              FROM l)
        SELECT user_id,
               CAST(floor(min(t)) AS BIGINT) AS sess_start,
               CAST(floor(max(t) + 300) AS BIGINT) AS sess_end,
               count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM g GROUP BY user_id, sid
        """,
    )
)


def _stream_matview(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING-executed incremental matview (readStream -> foreachBatch
    -> idempotent append + CDF refresh, 4 real micro-batches) whose
    final state must equal the plain batch aggregate — so the whole
    exactly-once composition is DuckDB-hash-checkable."""
    import tempfile

    from data_pipeline_with_spark_spark.streaming.demo import run_stream_matview

    _, view = run_stream_matview(spark, sf, tempfile.mkdtemp(prefix="stream_mv_"))
    return view.read().select("user_id", "sum_value_cents", "n_rows")


register(
    QuerySpec(
        name="stream_incremental_matview",
        build=_stream_matview,
        doc="continuously-maintained materialized view: 4 micro-batches of "
        "transactional append + CDF fold; oracle is the batch aggregate the "
        "stream must converge to",
        oracle="""
        SELECT user_id,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS sum_value_cents,
               count(*) AS n_rows
        FROM events
        GROUP BY user_id
        """,
    )
)
