"""Source/sink round-trips (SURVEY §2.1): CSV with quote-escape and
all-string schema, multiline JSON, partitioned parquet with file-count
control, noop sink, database creation."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F

from data_pipeline_with_spark_spark.bench_util import compare_udf_variants
from data_pipeline_with_spark_spark.sources.readers import read_csv, read_json
from data_pipeline_with_spark_spark.sources.writers import (
    ensure_database,
    write_noop,
    write_parquet_table,
)


def test_csv_scan_reference_defaults(spark, tmp_path):
    # header + escape='"' + all-string schema (curate_data.py:47-58)
    p = tmp_path / "in.csv"
    p.write_text('Country Code,Indicator Value\nUSA,"say ""hi"""\nFRA,2.5\n')
    df = read_csv(spark, str(p))
    assert df.columns == ["Country Code", "Indicator Value"]
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "string"]
    rows = {r["Country Code"]: r["Indicator Value"] for r in df.collect()}
    assert rows["USA"] == 'say "hi"' and rows["FRA"] == "2.5"


def test_csv_infer_schema_optin(spark, tmp_path):
    p = tmp_path / "n.csv"
    p.write_text("a,b\n1,2.5\n")
    df = read_csv(spark, str(p), infer_schema=True)
    assert dict(df.dtypes) == {"a": "int", "b": "double"}


def test_json_multiline_scan(spark, tmp_path):
    # multiline JSON array file (data_import.ipynb.py:122-125)
    p = tmp_path / "in.json"
    p.write_text(json.dumps([{"MS": "DE", "v": 1}, {"MS": "FR", "v": 2}], indent=2))
    df = read_json(spark, str(p))
    assert df.count() == 2 and set(df.columns) == {"MS", "v"}


def test_partitioned_parquet_one_file_per_partition(spark, tmp_path):
    df = spark.createDataFrame(
        [(y, i, float(i)) for y in (2018, 2019) for i in range(50)],
        ["year", "id", "v"],
    )
    out = str(tmp_path / "t")
    write_parquet_table(df, out, partition_by=["year"])
    for y in (2018, 2019):
        files = list(Path(out, f"year={y}").glob("*.parquet"))
        assert len(files) == 1  # X2: repartition(partition_cols) → 1 file each
    back = spark.read.parquet(out)
    assert back.count() == 100


def test_single_file_coalesce(spark, tmp_path):
    df = spark.createDataFrame([(i,) for i in range(100)], ["id"]).repartition(8)
    out = str(tmp_path / "c")
    write_parquet_table(df, out, target_files=1)
    assert len(list(Path(out).glob("*.parquet"))) == 1  # X1


def test_save_as_table_and_database(spark, tmp_path):
    ensure_database(spark, "curated_test")
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    write_parquet_table(df, str(tmp_path / "tbl"), table="curated_test.t1")
    assert spark.sql("SELECT count(*) AS n FROM curated_test.t1").collect()[0].n == 1
    assert "t1" in [t.name for t in spark.catalog.listTables("curated_test")]


def test_noop_sink_materializes(spark):
    write_noop(spark.range(10).withColumn("x", F.col("id") * 2))  # no error == pass


def test_udf_timing_harness(spark, sf_dir):
    timings = compare_udf_variants(spark, sf_dir)
    assert set(timings) == {"native_expr", "pandas_udf", "python_udf"}
    assert all(v > 0 for v in timings.values())


def test_format_round_trips(spark, sf_dir, tmp_path):
    from data_pipeline_with_spark_spark.sources.readers import (
        read_csv,
        read_json,
        read_orc,
        read_testdata,
    )
    from data_pipeline_with_spark_spark.sources.writers import write_files

    src = read_testdata(spark, sf_dir, "nation")
    expected = {tuple(r) for r in src.collect()}

    orc_path = str(tmp_path / "nation_orc")
    write_files(src, orc_path, fmt="orc")
    assert {tuple(r) for r in read_orc(spark, orc_path).collect()} == expected

    json_path = str(tmp_path / "nation_json")
    write_files(src, json_path, fmt="json")
    got_json = read_json(spark, json_path, multiline=False).select(*src.columns)
    assert {tuple(r) for r in got_json.collect()} == expected

    # CSV lands all-string (reference dialect); compare after cast-back.
    csv_path = str(tmp_path / "nation_csv")
    write_files(src, csv_path, fmt="csv")
    got_csv = read_csv(spark, csv_path).selectExpr(
        "CAST(n_nationkey AS INT) n_nationkey",
        "n_name",
        "CAST(n_regionkey AS INT) n_regionkey",
    )
    assert {tuple(r) for r in got_csv.collect()} == expected


def test_orc_filter_pushdown(spark, sf_dir, tmp_path):
    from data_pipeline_with_spark_spark.sources.readers import read_orc, read_testdata
    from data_pipeline_with_spark_spark.sources.writers import write_files

    path = str(tmp_path / "orders_orc")
    write_files(read_testdata(spark, sf_dir, "orders"), path, fmt="orc")
    df = read_orc(spark, path).where("o_orderstatus = 'F'").select("o_orderkey")
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "o_orderstatus" in plan
