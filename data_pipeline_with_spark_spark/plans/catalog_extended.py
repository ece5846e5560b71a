"""Extended operator coverage — the Spark surface SURVEY §2 marks as
"free" beyond the reference (§2.4 join-type passthrough, §2.5 distinct/
grouping-set aggregates, §2.7 intersect/except, §2.9 scalar library),
plus more TPC-H-shaped pipelines that stress scan pushdown and
multi-join planning at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_with_spark_spark.operators import equi_join
from data_pipeline_with_spark_spark.plans.registry import QuerySpec, register
from data_pipeline_with_spark_spark.util import exploded
from data_pipeline_with_spark_spark.sources.readers import (
    read_testdata,
    register_testdata_views,
)


# --------------------------------------------------------------------------
# Join-type passthrough (J1 wrapper's free surface)
def _semi(spark: SparkSession, sf: str) -> DataFrame:
    cust = read_testdata(spark, sf, "customer")
    orders = read_testdata(spark, sf, "orders").withColumnRenamed("o_custkey", "c_custkey")
    return equi_join(cust, orders, on=["c_custkey"], how="left_semi").select(
        "c_custkey", "c_mktsegment"
    )


register(
    QuerySpec(
        name="j3_semi_join",
        build=_semi,
        doc="left-semi join: customers with at least one order (EXISTS)",
        oracle="""
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
    )
)


def _anti(spark: SparkSession, sf: str) -> DataFrame:
    # Anti-join against URGENT orders: every fixture customer has ≥1
    # order, so the unfiltered variant would be vacuously empty and the
    # oracle comparison would prove nothing.
    cust = read_testdata(spark, sf, "customer")
    urgent = (
        read_testdata(spark, sf, "orders")
        .where("o_orderpriority = '1-URGENT'")
        .withColumnRenamed("o_custkey", "c_custkey")
    )
    return equi_join(cust, urgent, on=["c_custkey"], how="left_anti").select(
        "c_custkey", "c_mktsegment"
    )


register(
    QuerySpec(
        name="j4_anti_join",
        build=_anti,
        doc="left-anti join: customers with no URGENT orders (NOT EXISTS)",
        oracle="""
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        """,
    )
)


def _left_outer(spark: SparkSession, sf: str) -> DataFrame:
    nat = read_testdata(spark, sf, "nation").withColumnRenamed("n_nationkey", "s_nationkey")
    sup = read_testdata(spark, sf, "supplier")
    joined = equi_join(nat, sup, on=["s_nationkey"], how="left")
    return joined.groupBy("n_name").agg(F.count("s_suppkey").alias("n_suppliers"))


register(
    QuerySpec(
        name="j5_left_outer_join",
        build=_left_outer,
        doc="left-outer join preserving unmatched dim rows (zero-supplier nations)",
        oracle="""
        SELECT n_name, count(s_suppkey) AS n_suppliers
        FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
        GROUP BY n_name
        """,
    )
)


# --------------------------------------------------------------------------
# Aggregate surface
register(
    QuerySpec(
        name="a6_distinct_agg",
        build=lambda spark, sf: read_testdata(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        ),
        doc="distinct-count aggregate (expand + two-phase under the hood)",
        oracle="""
        SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderpriority
        """,
    )
)

# The raw HLL estimate can't hash-match across engines (sketch constants
# differ), so the query exports what IS checkable: the exact count plus
# a within-error-bound flag. approx_count_distinct's default rsd is
# 0.05; a 3-sigma 0.15 bound makes the flag deterministic-in-practice,
# turning the approx aggregate from "runs" into "checked".
register(
    QuerySpec(
        name="a7_approx_count_distinct",
        build=lambda spark, sf: read_testdata(spark, sf, "lineitem")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "exact_parts",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                / F.col("exact_parts")
                <= 0.15
            ).alias("within_bound"),
        ),
        doc="HLL approx distinct, verified against the exact count via an error-bound flag",
        oracle="""
        SELECT count(DISTINCT l_partkey) AS exact_parts, TRUE AS within_bound
        FROM lineitem
        """,
    )
)


def _rollup(spark: SparkSession, sf: str) -> DataFrame:
    return (
        read_testdata(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


register(
    QuerySpec(
        name="a8_rollup",
        build=_rollup,
        doc="ROLLUP grouping sets (subtotals + grand total)",
        oracle="""
        SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
    )
)


def _cube(spark: SparkSession, sf: str) -> DataFrame:
    return (
        read_testdata(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )


register(
    QuerySpec(
        name="a9_cube",
        build=_cube,
        doc="CUBE grouping sets (all key combinations)",
        oracle="""
        SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        """,
    )
)

register(
    QuerySpec(
        name="a10_percentiles",
        build=lambda spark, sf: read_testdata(spark, sf, "orders").agg(
            F.round(F.percentile("o_totalprice", 0.5), 2).alias("p50"),
            F.round(F.percentile("o_totalprice", 0.9), 2).alias("p90"),
            F.round(F.min("o_totalprice"), 2).alias("p0"),
            F.round(F.max("o_totalprice"), 2).alias("p100"),
        ),
        doc="exact continuous percentiles",
        oracle="""
        SELECT round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
               round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
               round(min(o_totalprice), 2) AS p0,
               round(max(o_totalprice), 2) AS p100
        FROM orders
        """,
    )
)


# --------------------------------------------------------------------------
# Set operators
def _intersect(spark: SparkSession, sf: str) -> DataFrame:
    orders = read_testdata(spark, sf, "orders").withColumn("y", F.year("o_orderdate"))
    a = orders.where("y = 1995").select("o_custkey")
    b = orders.where("y = 1996").select("o_custkey")
    return a.intersect(b)


register(
    QuerySpec(
        name="o4_intersect",
        build=_intersect,
        doc="INTERSECT: customers ordering in both 1995 and 1996",
        oracle="""
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        """,
    )
)


def _except(spark: SparkSession, sf: str) -> DataFrame:
    orders = read_testdata(spark, sf, "orders").withColumn("y", F.year("o_orderdate"))
    a = orders.where("y = 1995").select("o_custkey")
    b = orders.where("y = 1996").select("o_custkey")
    # subtract == SQL EXCEPT (set semantics); exceptAll would keep rows
    # whose multiplicity merely differs between the two sides.
    return a.subtract(b)


register(
    QuerySpec(
        name="o5_except",
        build=_except,
        doc="EXCEPT: 1995 customers who vanished in 1996",
        oracle="""
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        """,
    )
)


# --------------------------------------------------------------------------
# Scalar function batteries (§2.9: engine exposes the full F namespace)
register(
    QuerySpec(
        name="scalar_string_battery",
        build=lambda spark, sf: read_testdata(spark, sf, "part").select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.substring("p_type", 1, 8).alias("type_prefix"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
            F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
            F.element_at(F.split("p_type", " "), -1).alias("type_last_word"),
            F.length("p_name").alias("name_len"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        ),
        doc="string function battery (upper/substr/replace/lpad/split/length/concat_ws)",
        oracle="""
        SELECT p_partkey,
               upper(p_brand) AS brand_upper,
               substring(p_type, 1, 8) AS type_prefix,
               replace(p_name, ' ', '_') AS name_snake,
               lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
               split_part(p_type, ' ', len(string_split(p_type, ' '))) AS type_last_word,
               length(p_name) AS name_len,
               p_brand || '|' || p_type AS brand_type
        FROM part
        """,
    )
)

register(
    QuerySpec(
        name="scalar_date_battery",
        build=lambda spark, sf: read_testdata(spark, sf, "orders").select(
            "o_orderkey",
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.dayofmonth("o_orderdate").alias("d"),
            F.quarter("o_orderdate").alias("q"),
            F.unix_timestamp(F.date_trunc("month", "o_orderdate")).alias("month_start_epoch"),
            F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
                "days_since_1995"
            ),
        ),
        doc="date/time function battery (year/month/day/quarter/trunc/datediff)",
        oracle="""
        SELECT o_orderkey,
               year(o_orderdate) AS y, month(o_orderdate) AS m,
               day(o_orderdate) AS d, quarter(o_orderdate) AS q,
               CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_start_epoch,
               date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_1995
        FROM orders
        """,
    )
)

register(
    QuerySpec(
        name="scalar_conditional_battery",
        build=lambda spark, sf: read_testdata(spark, sf, "orders")
        .select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 300000, "high")
            .when(F.col("o_totalprice") > 150000, "mid")
            .otherwise("low")
            .alias("price_band"),
            F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
                "status_label"
            ),
        )
        .groupBy("price_band", "status_label")
        .agg(F.count(F.lit(1)).alias("n")),
        doc="CASE WHEN banding + coalesce/nullif null handling",
        oracle="""
        SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
                    WHEN o_totalprice > 150000 THEN 'mid'
                    ELSE 'low' END AS price_band,
               coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
               count(*) AS n
        FROM orders GROUP BY 1, 2
        """,
    )
)


def _nested(spark: SparkSession, sf: str) -> DataFrame:
    p = read_testdata(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.struct(F.col("p_brand").alias("brand"), F.col("p_size").alias("size")).alias("info"),
        F.array(F.col("p_size"), F.col("p_size") * 2).alias("sizes"),
    ).select(
        "p_partkey",
        F.col("info.brand").alias("brand"),
        F.element_at("sizes", 2).alias("double_size"),
    )


register(
    QuerySpec(
        name="scalar_nested_types",
        build=_nested,
        doc="struct build/field-access + array build/index (nested type surface)",
        oracle="""
        SELECT p_partkey,
               struct_pack(brand := p_brand, size := p_size).brand AS brand,
               ([p_size, p_size * 2])[2] AS double_size
        FROM part
        """,
    )
)


# --------------------------------------------------------------------------
# Analytic windows beyond W1
def _running(spark: SparkSession, sf: str) -> DataFrame:
    li = read_testdata(spark, sf, "lineitem").withColumn(
        "month_start", F.unix_timestamp(F.date_trunc("month", "l_shipdate"))
    )
    monthly = li.groupBy("l_returnflag", "month_start").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev")
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("month_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return monthly.withColumn("cum_rev", F.round(F.sum("rev").over(w), 2))


register(
    QuerySpec(
        name="w3_running_sum",
        build=_running,
        doc="cumulative windowed sum over pre-aggregated (deterministic-order) monthlies",
        oracle="""
        WITH monthly AS (
          SELECT l_returnflag,
                 CAST(epoch(date_trunc('month', l_shipdate)) AS BIGINT) AS month_start,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
          FROM lineitem GROUP BY 1, 2
        )
        SELECT l_returnflag, month_start, rev,
               round(sum(rev) OVER (PARTITION BY l_returnflag ORDER BY month_start
                                    ROWS UNBOUNDED PRECEDING), 2) AS cum_rev
        FROM monthly
        """,
    )
)


def _rank_battery(spark: SparkSession, sf: str) -> DataFrame:
    sup = read_testdata(spark, sf, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return sup.select(
        "s_suppkey",
        "s_nationkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.lead("s_acctbal").over(w), 2).alias("next_bal"),
    )


register(
    QuerySpec(
        name="w4_rank_battery",
        build=_rank_battery,
        doc="rank/dense_rank/ntile/lead analytic battery",
        oracle="""
        SELECT s_suppkey, s_nationkey,
               CAST(rank() OVER w AS INT) AS rnk,
               CAST(dense_rank() OVER w AS INT) AS drnk,
               CAST(ntile(4) OVER w AS INT) AS quartile,
               round(lead(s_acctbal) OVER w, 2) AS next_bal
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
        """,
    )
)


# --------------------------------------------------------------------------
# More TPC-H-shaped pipelines
_Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def _q5(spark: SparkSession, sf: str) -> DataFrame:
    register_testdata_views(spark, sf)
    return spark.sql(_Q5_SQL)


register(
    QuerySpec(
        name="tpch_q5_local_supplier_volume",
        build=_q5,
        headline=True,
        doc="Q5-shaped six-table join; dims broadcast, facts co-shuffled once",
        oracle=_Q5_SQL,
    )
)

_Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def _q6(spark: SparkSession, sf: str) -> DataFrame:
    register_testdata_views(spark, sf)
    return spark.sql(_Q6_SQL)


register(
    QuerySpec(
        name="tpch_q6_forecast_revenue",
        build=_q6,
        doc="Q6-shaped scan-heavy filter; every predicate must reach PushedFilters",
        oracle=_Q6_SQL,
    )
)


# --------------------------------------------------------------------------
# Custom joins Spark lacks natively (operators/asof.py)
def _asof(spark: SparkSession, sf: str) -> DataFrame:
    from data_pipeline_with_spark_spark.operators import asof_join

    ev = read_testdata(spark, sf, "events")
    clicks = ev.where("event_type = 'click'").select("event_id", "user_id", "ts")
    # dedupe right per (key, ts) so the as-of match is well-defined
    purchases = (
        ev.where("event_type = 'purchase'")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    joined = asof_join(clicks, purchases, key="user_id")
    return joined.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("click_epoch"),
        "purchase_value",
    )


register(
    QuerySpec(
        name="j6_asof_join",
        build=_asof,
        headline=True,
        doc="backward as-of join via union + last-non-null window (one shuffle); oracle = DuckDB native ASOF JOIN",
        oracle="""
        WITH clicks AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ), purchases AS (
          SELECT user_id, ts, max(value) AS purchase_value
          FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        )
        SELECT c.event_id, c.user_id,
               CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch,
               p.purchase_value
        FROM clicks c
        ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
    )
)


def _range_join(spark: SparkSession, sf: str) -> DataFrame:
    from data_pipeline_with_spark_spark.operators import range_join

    orders = read_testdata(spark, sf, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 100000.0), ("mid", 100000.0, 300000.0), ("high", 300000.0, 1e9)],
        ["band", "lo", "hi"],
    )
    joined = range_join(orders, bands, point="o_totalprice", lower="lo", upper="hi")
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


register(
    QuerySpec(
        name="j7_range_join",
        build=_range_join,
        doc="point-in-interval range join, interval side broadcast (fact side never shuffles)",
        oracle="""
        SELECT band, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        FROM orders
        JOIN (VALUES ('low', 0.0, 100000.0),
                     ('mid', 100000.0, 300000.0),
                     ('high', 300000.0, 1000000000.0)) AS bands(band, lo, hi)
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band
        """,
    )
)


# --------------------------------------------------------------------------
# Semi-structured: typed from_json and explode/unnest
def _from_json(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import types as T

    ev = read_testdata(spark, sf, "events")
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    return ev.select(
        "event_id", F.from_json("props", schema).alias("p")
    ).select("event_id", F.col("p.k").alias("k"))


register(
    QuerySpec(
        name="json_from_json_typed",
        build=_from_json,
        doc="schema-typed from_json -> struct field access (vs stringly get_json_object)",
        oracle="""
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events
        """,
    )
)


def _explode_tokens(spark: SparkSession, sf: str) -> DataFrame:
    from data_pipeline_with_spark_spark.llm.text import tokens

    docs = read_testdata(spark, sf, "documents")
    return (
        exploded(docs, [], tokens("text"), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 100)
    )


register(
    QuerySpec(
        name="explode_token_frequencies",
        build=_explode_tokens,
        doc="explode/unnest + frequency aggregation (word-count shape)",
        oracle="""
        SELECT token, count(*) AS n FROM (
          SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                    x -> x <> '')) AS token
          FROM documents
        ) GROUP BY token HAVING count(*) >= 100
        """,
    )
)


# String-typed numerics: the reference's implicit-coercion hazard
# (serving_layer.py:193 relies on avg over string columns; SURVEY §7
# mandates explicit casts). Here the numeric arrives as a JSON string
# and is cast explicitly before aggregating.
register(
    QuerySpec(
        name="a11_string_numeric_cast_avg",
        build=lambda spark, sf: read_testdata(spark, sf, "events")
        .select(
            "event_type",
            F.get_json_object("props", "$.k").cast("double").alias("k_num"),
        )
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k_num"), 4).alias("avg_k"),
            F.count(F.lit(1)).alias("n"),
        ),
        doc="explicit string->double cast before avg (implicit-coercion hazard, serving_layer.py:193)",
        oracle="""
        SELECT event_type,
               round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k,
               count(*) AS n
        FROM events GROUP BY event_type
        """,
    )
)


# --------------------------------------------------------------------------
# Analytic-window breadth (beyond the reference's single ranking window,
# SURVEY §2.6): lag/lead offsets, explicit ROWS frames (running total,
# moving average), and distribution functions (ntile/percent_rank/
# cume_dist). All share ONE window ordering, so the physical plan is a
# single hash-partition shuffle on o_custkey + one sort — adding the
# seven outputs costs nothing extra at 100 TB; that's the point of
# consolidating analytic specs.
def _analytic_windows(spark: SparkSession, sf: str) -> DataFrame:
    orders = read_testdata(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.round(F.sum("o_totalprice").over(run), 2).alias("running_spend"),
        # moving average over integer cents: engines disagree in the last
        # ulp of a sliding double avg (accumulation order) AND in round()
        # half-boundary behavior, so do exact-integer sums and half-up
        # via floor(x + 0.5) — deterministic on identical doubles.
        (
            F.floor(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).over(mov)
                / F.count(F.lit(1)).over(mov)
                + 0.5
            )
            / 100.0
        ).alias("moving_avg3"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


register(
    QuerySpec(
        name="w2_analytic_windows",
        build=_analytic_windows,
        doc="lag/lead, ROWS frames (running sum, moving avg), ntile/percent_rank/cume_dist in one window sort",
        oracle="""
        SELECT o_custkey, o_orderkey,
               lag(o_totalprice) OVER w AS prev_price,
               lead(o_totalprice) OVER w AS next_price,
               round(sum(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
               floor(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                 * 1.0 / count(*) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                 + 0.5) / 100.0 AS moving_avg3,
               CAST(ntile(4) OVER w AS INT) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
    )
)


# --------------------------------------------------------------------------
# Time-based RANGE frame: the one frame type w2/w3 don't cover. The
# frame bound is a VALUE offset on the ordering key (7 days of epoch
# seconds), not a row count — Spark evaluates it with the same single
# partition shuffle + sort as any other window; only the frame pointer
# logic differs, so cost is unchanged at scale.
def _time_range_rolling(spark: SparkSession, sf: str) -> DataFrame:
    from data_pipeline_with_spark_spark.sources.readers import read_testdata as _rt

    ev = _rt(spark, sf, "events")
    es = F.unix_timestamp("ts").cast("bigint")
    base = ev.select("user_id", "event_id", es.alias("es"), "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("es")
        .rangeBetween(-7 * 86400, Window.currentRow)
    )
    return base.select(
        "user_id",
        "event_id",
        "es",
        F.count(F.lit(1)).over(w).alias("n_7d"),
        F.round(F.sum("value").over(w), 2).alias("sum_value_7d"),
    )


register(
    QuerySpec(
        name="w5_time_range_rolling",
        build=_time_range_rolling,
        doc="7-day rolling count/sum per user via RANGE frame on epoch seconds",
        oracle="""
        WITH base AS (
          SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, value
          FROM events
        )
        SELECT user_id, event_id, es,
               count(*) OVER w AS n_7d,
               round(sum(value) OVER w, 2) AS sum_value_7d
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY es
                     RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
        """,
    )
)
