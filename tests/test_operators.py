"""Unit tests for the operator library on tiny in-memory frames —
reference-shaped edge cases (hazard column names, all-null rows, union
alignment, unpivot round-trip, top-k ties)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_with_spark_spark.operators import (
    distinct_rows,
    drop_all_null_rows,
    equi_join,
    lag_diff,
    melt,
    normalize_column_names,
    pivot_wide,
    top_k_per_group,
    union_by_name,
)
from data_pipeline_with_spark_spark.operators.projection import normalize_name


def test_normalize_name_hazards():
    # Reference hazard names (SURVEY §1): spaces → underscores, parens
    # stripped, '/' and digit-leading survive.
    assert normalize_name("Country Name") == "Country_Name"
    assert normalize_name("Enedc (g/km)") == "Enedc_g/km"
    assert normalize_name("2-alpha_code") == "2-alpha_code"


def test_normalize_column_names(spark):
    df = spark.createDataFrame([(1, "x")], ["a col (raw)", "2-weird/name"])
    out = normalize_column_names(df)
    assert out.columns == ["a_col_raw", "2-weird/name"]
    assert out.collect()[0][0] == 1


def test_drop_all_null_rows(spark):
    df = spark.createDataFrame(
        [(1, None, None), (2, "a", None), (3, None, 1.0)],
        ["id", "s", "v"],
    )
    kept = drop_all_null_rows(df, subset=["s", "v"]).collect()
    assert [r.id for r in kept] == [2, 3]


def test_distinct_subset_and_full(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (1, "b")], ["k", "v"])
    assert distinct_rows(df).count() == 2
    assert distinct_rows(df, subset=["k"]).count() == 1


def test_union_by_name_alignment(spark):
    a = spark.createDataFrame([(1, "x")], ["id", "v"])
    b = spark.createDataFrame([("y", 2)], ["v", "id"])
    rows = union_by_name([a, b]).collect()
    assert [(r.id, r.v) for r in rows] == [(1, "x"), (2, "y")]


def test_union_by_name_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], ["id", "v"])
    b = spark.createDataFrame([(2,)], ["id"])
    rows = union_by_name([a, b], allow_missing=True).orderBy("id").collect()
    assert rows[1].v is None


def test_top_k_ties_deterministic(spark):
    df = spark.createDataFrame(
        [("g", 10.0, 1), ("g", 10.0, 2), ("g", 5.0, 3)], ["grp", "val", "id"]
    )
    out = top_k_per_group(
        df, ["grp"], [F.desc("val"), F.asc("id")], k=2
    ).orderBy("id")
    assert [r.id for r in out.collect()] == [1, 2]


def test_melt_pivot_round_trip(spark):
    wide = spark.createDataFrame([("A", 1.0, 2.0), ("B", 3.0, None)], ["k", "1995", "1996"])
    long = melt(wide, ["k"], ["1995", "1996"], "year", "v", var_cast="int")
    assert long.count() == 4
    back = pivot_wide(long, ["k"], "year", "v", agg="sum", pivot_values=[1995, 1996])
    assert sorted(back.columns) == ["1995", "1996", "k"]
    row = {r.k: r for r in back.collect()}
    assert row["A"]["1995"] == 1.0 and row["B"]["1996"] is None


def test_equi_join_how_passthrough(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "l"])
    right = spark.createDataFrame([(1, "x")], ["k", "r"])
    assert equi_join(left, right, ["k"], how="left_anti").collect()[0].k == 2
    assert equi_join(left, right, ["k"], how="left_semi").collect()[0].k == 1


def test_lag_diff(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 15.0), ("b", 1, 1.0)], ["g", "t", "v"]
    )
    out = lag_diff(df, ["g"], "t", "v", diff_col="d").orderBy("g", "t").collect()
    assert out[0].d is None and out[1].d == 5.0 and out[2].d is None


def test_salted_skew_join_matches_plain(spark):
    from data_pipeline_with_spark_spark.operators.joins import salted_skew_join

    # one hot key (90% of rows) + a long tail
    left = spark.createDataFrame(
        [(0 if i % 10 else i % 7, i) for i in range(1000)], ["k", "lv"]
    )
    right = spark.createDataFrame([(i, f"r{i}") for i in range(7)], ["k", "rv"])
    plain = left.join(right, on="k").orderBy("lv").collect()
    salted = salted_skew_join(left, right, key="k").orderBy("lv").collect()
    assert [(r.k, r.lv, r.rv) for r in plain] == [(r.k, r.lv, r.rv) for r in salted]


def test_conf_summary(spark):
    from data_pipeline_with_spark_spark.session import conf_summary

    conf = conf_summary(spark)
    assert conf["spark.sql.adaptive.enabled"] == "true"
    assert conf["spark.sql.session.timeZone"] == "UTC"


def test_gapfill_locf_planted_series(spark):
    """Planted hourly series with a hole: the spine densifies the gap
    hour, zero-fills its count, and LOCF carries the previous hour's
    value cents; a type absent at the spine start stays 0 until its
    first observation (leading-gap coalesce)."""
    import datetime as dt

    from data_pipeline_with_spark_spark.plans.catalog_events import (
        _GAPFILL_SPARK,
    )

    base = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        # type 'a': hours 0, 1, 3 present — hour 2 is a true gap
        (1, base, 101, "a", 2.0, "{}"),
        (2, base + dt.timedelta(hours=1), 102, "a", 3.0, "{}"),
        (3, base + dt.timedelta(hours=3), 103, "a", 5.0, "{}"),
        # type 'b': first appears at hour 3 — hours 0-2 leading gaps
        (4, base + dt.timedelta(hours=3), 104, "b", 7.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.createOrReplaceTempView("events")
    try:
        out = {
            (r.event_type, r.hr): r for r in spark.sql(_GAPFILL_SPARK).collect()
        }
    finally:
        spark.catalog.dropTempView("events")
    hrs = sorted({h for (_, h) in out})
    assert len(hrs) == 4 and hrs[1] - hrs[0] == 3600  # dense 4-hour spine
    a = [out[("a", h)] for h in hrs]
    assert [r.n_events for r in a] == [1, 1, 0, 1]
    assert [r.was_gap for r in a] == [0, 0, 1, 0]
    assert [r.locf_value_cents for r in a] == [200, 300, 300, 500]  # carried
    b = [out[("b", h)] for h in hrs]
    assert [r.n_events for r in b] == [0, 0, 0, 1]
    assert [r.locf_value_cents for r in b] == [0, 0, 0, 700]  # leading gaps 0


def test_u4_grouped_agg_udf_equals_native(spark):
    """The GROUPED_AGG pandas UDF pair (integer sum + count over the
    Arrow path) must be bit-identical to the native aggregates — the
    order-free-integer contract that makes the UDF oracle-checkable."""
    from data_pipeline_with_spark_spark.functions.udfs import (
        count_grouped_agg,
        sum_cents_grouped_agg,
    )

    df = spark.createDataFrame(
        [("a", 101), ("a", 202), ("b", 5), ("a", 303)], ["k", "c"]
    )
    got = {
        (r.k, r.s, r.n)
        for r in df.groupBy("k")
        .agg(
            sum_cents_grouped_agg(F.col("c")).alias("s"),
            count_grouped_agg(F.col("c")).alias("n"),
        )
        .collect()
    }
    assert got == {("a", 606, 3), ("b", 5, 1)}


def test_breakpoint_ntile_matches_ntile_on_distinct_values(spark):
    # The documented 10^8-customer scale swap for the RFM windows
    # (orders_rfm_segments): percentile breakpoints + broadcast range
    # assignment must reproduce un-partitioned ntile(5) EXACTLY on
    # boundary-distinct values while the sketch stores the sample
    # exactly (N <= accuracy). Both orders, non-divisible N (remainder
    # rows in leading buckets), and the all-in-one-bucket n=1 edge.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_pipeline_with_spark_spark.operators.aggregates import (
        breakpoint_ntile,
    )

    # 1003 distinct pseudo-random BIGINTs within the double-exact
    # range (the function's magnitude contract): pmod folds the hash to
    # < 2^40; distinctness is asserted, order scrambled vs the id
    df = spark.range(1003).select(
        F.col("id"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(2**40)).alias("v"),
    )
    assert df.select("v").distinct().count() == 1003
    for ascending in (True, False):
        w = Window.orderBy(F.col("v").asc() if ascending else F.col("v").desc())
        got = {
            r["id"]: r["b"]
            for r in breakpoint_ntile(
                df, "v", n=5, ascending=ascending, bucket_col="b"
            ).collect()
        }
        want = {
            r["id"]: r["b"]
            for r in df.withColumn("b", F.ntile(5).over(w)).collect()
        }
        assert got == want

    # n=1: everything in bucket 1, no breakpoint query at all
    assert {
        r["b"]
        for r in breakpoint_ntile(df, "v", n=1, bucket_col="b").collect()
    } == {1}

    # boundary TIES land in the LOWER bucket (value-deterministic),
    # documented divergence from ntile's sort-order tie split
    tied = spark.createDataFrame([(i, 1) for i in range(4)], "id INT, v INT")
    assert {
        r["b"]
        for r in breakpoint_ntile(tied, "v", n=2, bucket_col="b").collect()
    } == {1}


def test_breakpoint_ntile_null_handling(spark):
    # Boundaries are computed over NON-NULL rows only (the sketch
    # ignores NULLs, so the count must too), NULL rows land at ntile's
    # null end (bucket 1 asc / n desc), and the all-NULL frame doesn't
    # crash on a NULL breakpoint array.
    from pyspark.sql import functions as F

    from data_pipeline_with_spark_spark.operators.aggregates import (
        breakpoint_ntile,
    )

    mixed = spark.createDataFrame(
        [(i, None if i < 5 else i * 10) for i in range(10)],
        "id INT, v INT",
    )
    asc = {r["id"]: r["b"] for r in breakpoint_ntile(mixed, "v", n=5, bucket_col="b").collect()}
    # 5 non-null values split one per bucket; NULLs all bucket 1
    assert [asc[i] for i in range(5)] == [1] * 5
    assert [asc[i] for i in range(5, 10)] == [1, 2, 3, 4, 5]
    desc = {r["id"]: r["b"] for r in breakpoint_ntile(
        mixed, "v", n=5, ascending=False, bucket_col="b"
    ).collect()}
    assert [desc[i] for i in range(5)] == [5] * 5
    assert [desc[i] for i in range(5, 10)] == [5, 4, 3, 2, 1]

    all_null = spark.createDataFrame([(i, None) for i in range(4)], "id INT, v INT")
    assert {
        r["b"] for r in breakpoint_ntile(all_null, "v", n=3, bucket_col="b").collect()
    } == {1}
