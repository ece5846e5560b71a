"""Event-analytics queries over the events fixture: conversion funnel
and cohort retention — the batch analytics a pipeline runs next to the
streaming faces in `streaming/windows.py`.

Dialect note: Spark spells epoch extraction ``unix_timestamp`` where
DuckDB spells it ``epoch``, so unlike catalog_tpch these register
*separate* Spark and oracle SQL texts with identical output columns.
Both truncate weeks with ``date_trunc('week', ts)`` (Monday-start in
both engines) and do all offset arithmetic on integer epoch seconds —
portable and timezone-free (sessions pin UTC).

Scale: both queries aggregate to per-user rows first (one shuffle on
user_id), then run cheap second-stage aggregations on the much smaller
intermediate — the classic two-stage funnel shape that survives 100 TB
of raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_with_spark_spark.plans.registry import QuerySpec, register
from data_pipeline_with_spark_spark.sources.readers import register_testdata_views

_FUNNEL_SPARK = """
WITH clicks AS (
  SELECT user_id, min(ts) AS first_click
  FROM events WHERE event_type = 'click' GROUP BY user_id
), conv AS (
  SELECT DISTINCT c.user_id
  FROM clicks c JOIN events e
    ON e.user_id = c.user_id
   AND e.event_type = 'purchase'
   AND e.ts > c.first_click
   AND e.ts <= c.first_click + INTERVAL 1 HOUR
)
SELECT (SELECT count(*) FROM clicks) AS n_clickers,
       (SELECT count(*) FROM conv) AS n_converted,
       round(CAST((SELECT count(*) FROM conv) AS DOUBLE)
             / CAST((SELECT count(*) FROM clicks) AS DOUBLE), 4) AS conv_rate
"""

# DuckDB: identical text works (INTERVAL 1 HOUR parses in both).
_FUNNEL_ORACLE = _FUNNEL_SPARK


def _funnel(spark: SparkSession, sf: str) -> DataFrame:
    register_testdata_views(spark, sf)
    return spark.sql(_FUNNEL_SPARK)


register(
    QuerySpec(
        name="events_conversion_funnel",
        build=_funnel,
        doc="click→purchase-within-1h funnel: per-user min + ranged semi join",
        oracle=_FUNNEL_ORACLE,
    )
)


def _retention_sql(epoch_fn: str) -> str:
    return f"""
    WITH firsts AS (
      SELECT user_id,
             CAST({epoch_fn}(date_trunc('week', min(ts))) AS BIGINT) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id,
             CAST({epoch_fn}(date_trunc('week', ts)) AS BIGINT) AS act_week
      FROM events
    )
    SELECT f.cohort_week,
           CAST((a.act_week - f.cohort_week) / 604800 AS INT) AS week_offset,
           count(DISTINCT a.user_id) AS active_users
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY f.cohort_week, CAST((a.act_week - f.cohort_week) / 604800 AS INT)
    """


def _retention(spark: SparkSession, sf: str) -> DataFrame:
    register_testdata_views(spark, sf)
    return spark.sql(_retention_sql("unix_timestamp"))


register(
    QuerySpec(
        name="events_cohort_retention",
        build=_retention,
        doc="weekly cohort retention matrix (first-week cohort × week offset)",
        oracle=_retention_sql("epoch"),
    )
)


def _sessionize_sql(es_expr: str) -> str:
    # Inactivity-gap sessionization (4 h), the lag+cumsum idiom — the
    # batch complement of streaming session_window. All three windows
    # share one (user_id, es, event_id) ordering, so the physical plan
    # is one shuffle + one sort; the per-session rollup reuses the same
    # user_id partitioning. Integer epoch arithmetic end-to-end; the
    # epoch extraction must TRUNCATE sub-second parts in both dialects
    # (Spark unix_timestamp floors; a bare DuckDB BIGINT cast rounds).
    return f"""
    WITH ordered AS (
      SELECT user_id, event_id, {es_expr} AS es, value
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, es, value,
             CASE WHEN lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id) IS NULL
                    OR es - lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id) > 14400
                  THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ), sess AS (
      SELECT user_id, es, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY es, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_idx
      FROM flagged
    )
    SELECT user_id, CAST(sess_idx AS INT) AS sess_idx,
           count(*) AS n_events,
           min(es) AS sess_start, max(es) AS sess_end,
           CAST(max(es) - min(es) AS BIGINT) AS duration_s,
           round(sum(value), 2) AS total_value
    FROM sess GROUP BY user_id, sess_idx
    """


def _sessionize(spark: SparkSession, sf: str) -> DataFrame:
    register_testdata_views(spark, sf)
    return spark.sql(_sessionize_sql("CAST(unix_timestamp(ts) AS BIGINT)"))


register(
    QuerySpec(
        name="events_sessionize",
        build=_sessionize,
        doc="inactivity-gap sessionization (lag + cumsum, one window sort) + per-session rollup",
        oracle=_sessionize_sql("CAST(floor(epoch(ts)) AS BIGINT)"),
    )
)


def _anomaly_sql(epoch_fn: str) -> str:
    # Per-user z-score outliers: two-pass shape expressed as one query —
    # per-user moments (one shuffle on user_id), broadcast back, flag
    # |z| > 2.5. Sample stddev in both engines; users with <5 events or
    # zero variance are excluded (z undefined).
    return f"""
    WITH stats AS (
      SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sigma,
             count(*) AS n
      FROM events GROUP BY user_id
    )
    SELECT e.user_id, e.event_id,
           CAST({epoch_fn} AS BIGINT) AS es,
           round(e.value, 2) AS value,
           round((e.value - s.mu) / s.sigma, 3) AS z
    FROM events e JOIN stats s ON e.user_id = s.user_id
    WHERE s.n >= 5 AND s.sigma > 0
      AND abs((e.value - s.mu) / s.sigma) > 2.5
    """


def _anomaly(spark: SparkSession, sf: str) -> DataFrame:
    register_testdata_views(spark, sf)
    return spark.sql(_anomaly_sql("unix_timestamp(e.ts)"))


register(
    QuerySpec(
        name="events_value_anomalies",
        build=_anomaly,
        doc="per-user z-score outliers (|z| > 2.5): per-key moments + broadcast-back flagging",
        oracle=_anomaly_sql("floor(epoch(e.ts))"),
    )
)


def _transitions_sql() -> str:
    # User-journey mining: first-order Markov transition counts between
    # consecutive event types per user. One lag window (single shuffle
    # on user_id) + one count aggregation over (from, to) pairs — the
    # shuffle carries type pairs, never event payloads. Identical text
    # runs in both engines (no epoch extraction needed: ordering only).
    return """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """


def _transitions(spark: SparkSession, sf: str) -> DataFrame:
    register_testdata_views(spark, sf)
    return spark.sql(_transitions_sql())


register(
    QuerySpec(
        name="events_type_transitions",
        build=_transitions,
        doc="first-order event-type transition counts per user (journey mining)",
        oracle=_transitions_sql(),
    )
)


def _psi_drift_sql(epoch_fn: str) -> str:
    # Population Stability Index between the first and second half of
    # the event stream, per event type: the standard production
    # drift-detection number (PSI < 0.1 stable, > 0.25 shifted). The
    # value domain buckets into 10 fixed-width bins; a zero-filled
    # (type x half x bin) grid + Laplace smoothing (+0.5 per bin) keeps
    # ln() finite exactly the way production PSI implementations do.
    # Scale shape: two grouped counts over one scan + a grid join of
    # O(types x 20) rows — the stream itself never shuffles more than
    # (type, half, bin) partials. Identical text runs in both engines;
    # the epoch extraction is the only dialect difference.
    #
    # Parity (two r12 fixes, found by the full sf0.001 oracle sweep):
    # (1) Spark parses bare fractional literals as DECIMAL, so
    # `(n + 0.5) / (t + 5.0)` ran the whole probability pipeline in
    # DECIMAL quantized at 1e-16 while DuckDB used doubles — a
    # systematic ~1e-8 per-term shift that pushed sf0.001 'click' over
    # the .5e-6 round boundary (0.122289 vs 0.122288). Shared-text SQL
    # must CAST fractional literals to DOUBLE explicitly. (2) The PSI
    # itself is now integer-folded: each non-negative bin term
    # quantizes to BIGINT nanos, the ten nanos SUM exactly in any
    # order, and the 6-decimal half-up round happens in integers
    # (floor((nanos + 500) / 1000.0) — the quotient is never within an
    # ulp of an integer unless exact), so no float round() remains and
    # a libm ln() ulp can only matter if a term lands within an ulp of
    # .5 nano (measure-zero), instead of ~1/500 per row for a float
    # sum of grid values hitting the .5e-6 round boundary.
    return f"""
    WITH e AS (SELECT event_type, {epoch_fn} AS es, value FROM events),
    mid AS (SELECT (min(es) + max(es)) / 2 AS m FROM e),
    b AS (SELECT event_type,
                 CASE WHEN es <= m THEN 0 ELSE 1 END AS half,
                 CAST(least(floor(value / 50), 9) AS INT) AS bin
          FROM e CROSS JOIN mid),
    c AS (SELECT event_type, half, bin, count(*) AS n
          FROM b GROUP BY event_type, half, bin),
    tot AS (SELECT event_type, half, sum(n) AS t
            FROM c GROUP BY event_type, half),
    grid AS (SELECT DISTINCT b.event_type, h.half, v.bin
             FROM b
             CROSS JOIN (SELECT 0 AS half UNION ALL SELECT 1) h
             CROSS JOIN (SELECT 0 AS bin UNION ALL SELECT 1 UNION ALL
                         SELECT 2 UNION ALL SELECT 3 UNION ALL
                         SELECT 4 UNION ALL SELECT 5 UNION ALL
                         SELECT 6 UNION ALL SELECT 7 UNION ALL
                         SELECT 8 UNION ALL SELECT 9) v),
    p AS (SELECT g.event_type, g.half, g.bin,
                 (coalesce(c.n, 0) + CAST(0.5 AS DOUBLE))
                   / (tot.t + CAST(5 AS DOUBLE)) AS p
          FROM grid g
          LEFT JOIN c ON g.event_type = c.event_type
                     AND g.half = c.half AND g.bin = c.bin
          JOIN tot ON g.event_type = tot.event_type AND g.half = tot.half),
    pair AS (SELECT a.event_type, a.bin, a.p AS pa, z.p AS pb
             FROM p a JOIN p z ON a.event_type = z.event_type
                              AND a.bin = z.bin
             WHERE a.half = 0 AND z.half = 1)
    SELECT pair.event_type,
           CAST(t0.t AS BIGINT) AS n_first_half,
           CAST(t1.t AS BIGINT) AS n_second_half,
           CAST(floor((sum(CAST(round((pb - pa) * ln(pb / pa)
                                       * CAST(1000000000 AS DOUBLE))
                               AS BIGINT)) + 500)
                      / CAST(1000 AS DOUBLE)) AS BIGINT)
             / CAST(1000000 AS DOUBLE) AS psi
    FROM pair
    JOIN tot t0 ON pair.event_type = t0.event_type AND t0.half = 0
    JOIN tot t1 ON pair.event_type = t1.event_type AND t1.half = 1
    GROUP BY pair.event_type, t0.t, t1.t
    """


def _psi_drift(spark: SparkSession, sf: str) -> DataFrame:
    register_testdata_views(spark, sf)
    return spark.sql(_psi_drift_sql("unix_timestamp(ts)"))


register(
    QuerySpec(
        name="events_psi_drift",
        build=_psi_drift,
        doc="per-type PSI drift between stream halves (10-bin value histogram, Laplace-smoothed)",
        oracle=_psi_drift_sql("CAST(floor(epoch(ts)) AS BIGINT)"),
    )
)


def _ks_drift_sql(epoch_fn: str) -> str:
    # Two-sample Kolmogorov-Smirnov D per event type between stream
    # halves: max |ECDF_1(x) - ECDF_2(x)| over the merged support —
    # PSI's binning-free companion (PSI sees magnitude of shift per
    # bucket, KS the worst single point of distributional divergence).
    # Exact, not binned: per-value counts cumulate through one window
    # per type ordered by value. Scale note: the window partition holds
    # a type's DISTINCT values; at 100 TB one quantizes values first
    # (binned KS) to bound it — the fixture's ~5k/type is fine exact.
    return f"""
    WITH e AS (SELECT event_type, {epoch_fn} AS es, value FROM events),
    mid AS (SELECT (min(es) + max(es)) / 2 AS m FROM e),
    b AS (SELECT event_type,
                 CASE WHEN es <= m THEN 0 ELSE 1 END AS half, value
          FROM e CROSS JOIN mid),
    tot AS (SELECT event_type,
                   sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n0,
                   sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n1
            FROM b GROUP BY event_type),
    r AS (SELECT event_type, value,
                 sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS c0,
                 sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c1
          FROM b GROUP BY event_type, value),
    c AS (SELECT event_type, value,
                 sum(c0) OVER (PARTITION BY event_type ORDER BY value) AS cum0,
                 sum(c1) OVER (PARTITION BY event_type ORDER BY value) AS cum1
          FROM r)
    SELECT c.event_type,
           CAST(tot.n0 AS BIGINT) AS n_first_half,
           CAST(tot.n1 AS BIGINT) AS n_second_half,
           round(max(abs(CAST(cum0 AS DOUBLE) / tot.n0
                         - CAST(cum1 AS DOUBLE) / tot.n1)), 6) AS ks_d
    FROM c JOIN tot ON c.event_type = tot.event_type
    GROUP BY c.event_type, tot.n0, tot.n1
    """


def _ks_drift(spark: SparkSession, sf: str) -> DataFrame:
    register_testdata_views(spark, sf)
    return spark.sql(_ks_drift_sql("unix_timestamp(ts)"))


register(
    QuerySpec(
        name="events_ks_drift",
        build=_ks_drift,
        doc="per-type two-sample KS statistic between stream halves (exact ECDF max gap)",
        oracle=_ks_drift_sql("CAST(floor(epoch(ts)) AS BIGINT)"),
    )
)


# --------------------------------------------------------------------------
# Weighted directed PageRank over the event-type transition graph — the
# Markov-steady-state companion of events_type_transitions (which counts
# the edges this query propagates over). Integer fixed-point doctrine from
# operators/graph.py: the oracle replays all 5 rounds bit-exactly,
# including the per-round dangling-mass redistribution CTE.
def _pagerank_event_flow(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    from data_pipeline_with_spark_spark.operators import graph

    register_testdata_views(spark, sf)
    edges = spark.sql("""
        WITH seq AS (
          SELECT user_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
          FROM events
        )
        SELECT prev_type AS src, event_type AS dst, count(*) AS w
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    """)
    pr = graph.pagerank_weighted(edges, rounds=5)
    outw = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    return (
        pr.join(outw, pr["node"] == outw["src"], "left")
        .select(
            pr["node"].alias("event_type"),
            F.coalesce(F.col("outw"), F.lit(0)).cast("bigint").alias("out_weight"),
            "rank",
        )
    )


def _pagerank_flow_oracle() -> str:
    from data_pipeline_with_spark_spark.operators.graph import (
        PR_BASE_NUM,
        PR_DAMP_NUM,
        PR_SCALE,
    )

    rounds = []
    for k in range(1, 6):
        prev = f"r{k - 1}"
        rounds.append(f"""
        d{k} AS MATERIALIZED (
          SELECT coalesce(sum(r.rank), 0) AS dm
          FROM {prev} r LEFT JOIN outw o ON o.src = r.node
          WHERE o.src IS NULL
        ),
        i{k} AS MATERIALIZED (
          SELECT e.dst AS node, sum((r.rank * e.w) // o.outw) AS insum
          FROM {prev} r JOIN outw o ON o.src = r.node JOIN e ON e.src = r.node
          GROUP BY e.dst
        ),
        r{k} AS MATERIALIZED (
          SELECT nodes.node,
                 CAST({PR_BASE_NUM} // nn.n
                      + ({PR_DAMP_NUM} * (coalesce(i.insum, 0) + d{k}.dm // nn.n)) // 100
                   AS BIGINT) AS rank
          FROM nodes CROSS JOIN nn CROSS JOIN d{k}
          LEFT JOIN i{k} i ON i.node = nodes.node
        )""")
    return f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    e AS MATERIALIZED (
      SELECT prev_type AS src, event_type AS dst, count(*) AS w
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    nodes AS MATERIALIZED (
      SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION SELECT dst FROM e)
    ),
    outw AS MATERIALIZED (SELECT src, sum(w) AS outw FROM e GROUP BY src),
    nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
    r0 AS MATERIALIZED (
      SELECT node, CAST({PR_SCALE} // nn.n AS BIGINT) AS rank
      FROM nodes CROSS JOIN nn
    ),{",".join(rounds)}
    SELECT r.node AS event_type,
           CAST(coalesce(o.outw, 0) AS BIGINT) AS out_weight,
           r.rank
    FROM r5 r LEFT JOIN outw o ON o.src = r.node
    """


register(
    QuerySpec(
        name="graph_pagerank_event_flow",
        build=_pagerank_event_flow,
        doc="weighted directed PageRank over event-type transitions "
        "(integer fixed-point, per-round dangling-mass redistribution; "
        "oracle replays all 5 rounds bit-exactly)",
        oracle=_pagerank_flow_oracle(),
    )
)


# --------------------------------------------------------------------------
# Time-series gap-fill + LOCF: the resample shape every monitoring /
# feature pipeline needs — a dense per-(event_type, hour) spine built
# with sequence()/generate_series over the global hour bounds, actual
# hourly aggregates left-joined on, missing hours zero-filled for counts
# and last-observation-carried-forward for the value column. All-BIGINT
# (epoch-second hours, value cents), so LOCF replays bit-exactly.
#
# Scale shape: the raw-events aggregate is one map-side-combinable
# groupBy to O(types × hours) rows; the spine cross join and the LOCF
# window both run on that tiny aggregate (never on raw events), so the
# query's shuffle volume is bounded by the series length regardless of
# event volume. Fixture honesty: sf0.01 has ~170 true gap-hours (~5 %),
# sf0.001 ~2.7k (sparse series), so both the zero-fill and the
# carried-value paths genuinely fire at every SF.
_GAPFILL_SPARK = """
WITH hourly AS (
  SELECT event_type,
         CAST(unix_timestamp(date_trunc('hour', ts)) AS BIGINT) AS hr,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT CAST(unix_timestamp(date_trunc('hour', min(ts))) AS BIGINT) AS lo,
         CAST(unix_timestamp(date_trunc('hour', max(ts))) AS BIGINT) AS hi
  FROM events
),
spine AS (
  SELECT t.event_type, s.hr
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT explode(sequence(lo, hi, 3600)) AS hr FROM bounds) s
)
SELECT sp.event_type, sp.hr,
       coalesce(h.n_events, 0L) AS n_events,
       CAST(CASE WHEN h.hr IS NULL THEN 1 ELSE 0 END AS INT) AS was_gap,
       coalesce(last_value(h.value_cents, true) OVER (
         PARTITION BY sp.event_type ORDER BY sp.hr
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0L)
         AS locf_value_cents
FROM spine sp
LEFT JOIN hourly h ON h.event_type = sp.event_type AND h.hr = sp.hr
"""

_GAPFILL_ORACLE = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hr,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT CAST(floor(epoch(date_trunc('hour', min(ts)))) AS BIGINT) AS lo,
         CAST(floor(epoch(date_trunc('hour', max(ts)))) AS BIGINT) AS hi
  FROM events
),
spine AS (
  SELECT t.event_type, s.hr
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series(lo, hi, 3600)) AS hr FROM bounds) s
)
SELECT sp.event_type, sp.hr,
       coalesce(h.n_events, 0) AS n_events,
       CAST(CASE WHEN h.hr IS NULL THEN 1 ELSE 0 END AS INT) AS was_gap,
       coalesce(last_value(h.value_cents IGNORE NULLS) OVER (
         PARTITION BY sp.event_type ORDER BY sp.hr
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
         AS locf_value_cents
FROM spine sp
LEFT JOIN hourly h ON h.event_type = sp.event_type AND h.hr = sp.hr
"""


def _gapfill_locf(spark: SparkSession, sf: str) -> DataFrame:
    register_testdata_views(spark, sf)
    return spark.sql(_GAPFILL_SPARK)


register(
    QuerySpec(
        name="events_gapfill_locf",
        build=_gapfill_locf,
        doc="dense hourly spine per event type (sequence + cross join) with "
        "zero-filled counts and LOCF-carried value cents — the resample/"
        "gap-fill shape, windowed over the O(types × hours) aggregate only",
        oracle=_GAPFILL_ORACLE,
    )
)


# --------------------------------------------------------------------------
# MAD robust outliers — the median-based sibling of events_value_outliers
# (z-score): |x − median| > 3·MAD flags the tail without the tail first
# inflating the scale estimate (this fixture's value distribution is
# heavy-tailed: median 35 vs mean 50, so MAD flags ~11 % where z-score
# flags far less). Determinism: values become BIGINT cents; the exact
# interpolating percentile of integers lands on the .5 grid and the
# second-pass MAD on the .25 grid — all exactly representable doubles,
# and 3·MAD stays exact, so the comparison is bit-identical cross-engine
# (Spark percentile ≡ DuckDB quantile_cont at p=0.5). Scale shape: both
# percentile passes are count-map aggregates over the bounded-cardinality
# cents domain grouped by 5 types; the flagging join broadcasts the
# O(types) med/mad frames. At 100 TB swap the exact percentile for the
# mergeable HdrHistogram face (sketch_quantile_by_type) — same pipeline,
# sketch-merge instead of count-map.
_MAD_BODY = """
WITH v AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS value_cents
  FROM events
),
med AS (
  SELECT event_type, {pct}(value_cents, 0.5) AS med
  FROM v GROUP BY event_type
),
dev AS (
  SELECT v.event_id, v.event_type, v.value_cents, m.med,
         abs(v.value_cents - m.med) AS ad
  FROM v JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, {pct}(ad, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_id, d.event_type, d.value_cents, d.med, m.mad
FROM dev d JOIN mad m USING (event_type)
WHERE d.ad > 3 * m.mad
"""


def _mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    register_testdata_views(spark, sf)
    return spark.sql(_MAD_BODY.format(pct="percentile"))


register(
    QuerySpec(
        name="events_mad_outliers",
        build=_mad_outliers,
        doc="per-type MAD robust outliers (|x − median| > 3·MAD on BIGINT "
        "cents; exact-half percentile grid, bit-identical cross-engine)",
        oracle=_MAD_BODY.format(pct="quantile_cont"),
    )
)
