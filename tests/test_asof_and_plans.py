"""As-of/range join semantics on hand-built frames, the salted
aggregate equivalence, and plan-quality regression guards (pushdown /
broadcast / partial top-k must stay in the physical plan)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from data_pipeline_with_spark_spark.operators import asof_join, range_join
from data_pipeline_with_spark_spark.operators.aggregates import (
    group_agg,
    salted_group_agg,
)
from data_pipeline_with_spark_spark.plans import all_queries


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    clicks = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00")),  # after first purchase
            (2, 10, _ts("2024-01-01T12:00:00")),  # after second purchase
            (3, 10, _ts("2024-01-01T09:00:00")),  # before any purchase
            (4, 20, _ts("2024-01-01T11:00:00")),  # equal-ts purchase counts
        ],
        ["event_id", "user_id", "ts"],
    )
    purchases = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T09:30:00"), 100.0),
            (10, _ts("2024-01-01T11:00:00"), 200.0),
            (20, _ts("2024-01-01T11:00:00"), 300.0),
        ],
        ["user_id", "ts", "purchase_value"],
    )
    out = {r.event_id: r.purchase_value for r in asof_join(clicks, purchases, key="user_id").collect()}
    assert out == {1: 100.0, 2: 200.0, 3: None, 4: 300.0}
    # left columns preserved
    cols = asof_join(clicks, purchases, key="user_id").columns
    assert set(cols) == {"event_id", "user_id", "ts", "purchase_value"}


def test_range_join_boundaries(spark):
    facts = spark.createDataFrame([(1, 0.0), (2, 99.9), (3, 100.0)], ["id", "v"])
    ranges = spark.createDataFrame([("a", 0.0, 100.0), ("b", 100.0, 200.0)], ["band", "lo", "hi"])
    out = {r.id: r.band for r in range_join(facts, ranges, "v", "lo", "hi").collect()}
    assert out == {1: "a", 2: "a", 3: "b"}  # half-open [lo, hi)


def test_salted_group_agg_matches_plain(spark, sf_dir):
    from data_pipeline_with_spark_spark.sources.readers import read_testdata

    li = read_testdata(spark, sf_dir, "lineitem")
    aggs = {
        "sum_qty": ("sum", "l_quantity"),
        "n": ("count", "l_orderkey"),
        "avg_price": ("avg", "l_extendedprice"),
        "max_price": ("max", "l_extendedprice"),
    }
    plain = {
        r.l_returnflag: (r.sum_qty, r.n, round(r.avg_price, 6), r.max_price)
        for r in group_agg(li, ["l_returnflag"], aggs).collect()
    }
    salted = {
        r.l_returnflag: (r.sum_qty, r.n, round(r.avg_price, 6), r.max_price)
        for r in salted_group_agg(li, ["l_returnflag"], aggs).collect()
    }
    assert plain == salted


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_pushed_to_scan(spark):
    df = all_queries()["tpch_q6_forecast_revenue"].build(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan
    # every selective predicate reaches the parquet reader
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert any(frag in line and "PushedFilters" in line for line in plan.splitlines()), frag


def test_j1_uses_broadcast_joins(spark):
    df = all_queries()["j1_denormalize_star"].build(spark, "/root/testdata/sf0.001")
    assert _physical_plan(df).count("BroadcastHashJoin") == 2


def test_w1_uses_partial_topk(spark):
    # WindowGroupLimit = map-side top-k before the shuffle; losing it
    # means shuffling the full fact table at scale.
    df = all_queries()["w1_topk_per_group"].build(spark, "/root/testdata/sf0.001")
    assert "WindowGroupLimit" in _physical_plan(df)


def test_tpch_q9_broadcasts_all_dims(spark):
    # part/supplier/orders/nation are all dims relative to lineitem at
    # TPC-H proportions; the fact side must never shuffle for the joins.
    df = all_queries()["tpch_q9_product_profit"].build(spark, "/root/testdata/sf0.001")
    plan = _physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_tpch_q4_exists_is_semi_join(spark):
    df = all_queries()["tpch_q4_order_priority"].build(spark, "/root/testdata/sf0.001")
    plan = _physical_plan(df)
    assert "LeftSemi" in plan


def test_tpch_q19_pushes_or_predicates(spark):
    # the OR-of-conjunctions must still push brand/size down to the part
    # scan (Catalyst extracts the per-table disjunction).
    df = all_queries()["tpch_q19_discounted_revenue"].build(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert any(
        "PushedFilters" in line and "p_brand" in line for line in plan.splitlines()
    )
