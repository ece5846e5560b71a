"""Three-zone lake layout + the reference's end-to-end pipeline.

Reference parity: ``setup.py:42-47`` creates ``/datalake/{raw,curated,
serving}`` on DBFS; ``curate_data.py``/``serving_layer.py`` write
curated/serving tables into them. Here paths are injected (no dbfs:,
no dbutils — S8 maps to pathlib/shutil per SURVEY §2.1).

``run_reference_pipeline`` reproduces the reference's full flow on
fixture data — raw ingest → curated cleaning battery → denormalized +
serving layers — exercising the operator library end-to-end the way the
notebooks compose it (FIXTURES.md group B shapes are synthesized from
the TPC-H fixtures since the driver only materializes group A).
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_spark.operators import (
    distinct_rows,
    drop_all_null_rows,
    filter_expr,
    melt,
    normalize_column_names,
    top_k_per_group,
)
from data_pipeline_with_spark_spark.sources.readers import read_testdata
from data_pipeline_with_spark_spark.sources.writers import write_parquet_table


@dataclass
class LakeLayout:
    root: str

    @property
    def raw(self) -> str:
        return str(Path(self.root) / "raw")

    @property
    def curated(self) -> str:
        return str(Path(self.root) / "curated")

    @property
    def serving(self) -> str:
        return str(Path(self.root) / "serving")

    def ensure(self) -> "LakeLayout":
        for z in (self.raw, self.curated, self.serving):
            Path(z).mkdir(parents=True, exist_ok=True)
        return self

    def drop(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)

    def land(self, src: str, name: str) -> str:
        """S8 landing-zone move: copy an external file into raw/."""
        dest = Path(self.raw) / name
        dest.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(src, dest)
        return str(dest)


def _reference_shaped_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A WDI-shaped wide frame (one column per year, hazard names kept)
    derived from lineitem — exercises the reference's signature melt."""
    li = read_testdata(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    wide = (
        li.groupBy(F.col("l_returnflag").alias("Country Code"))
        .pivot("ship_year", list(range(1995, 2002)))
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return wide.withColumn("Indicator Name (derived)", F.lit("qty"))


def run_reference_pipeline(spark: SparkSession, sf_dir: str, lake_root: str) -> dict:
    """raw → curated → serving, reference-style, returning zone row
    counts for assertions. Mirrors curate_data.py + serving_layer.py
    composition: normalize names → drop all-null → distinct → filter →
    melt → window top-k → partitioned serving write."""
    lake = LakeLayout(lake_root).ensure()

    # RAW: ingest the wide fixture as-is (hazard column names intact).
    wide = _reference_shaped_wide(spark, sf_dir)
    raw_path = f"{lake.raw}/wdi_wide"
    wide.write.mode("overwrite").parquet(raw_path)

    # CURATED: the cleaning battery (P1, F7, F8, F1-style filter).
    curated = normalize_column_names(spark.read.parquet(raw_path))
    curated = drop_all_null_rows(curated, subset=[str(y) for y in range(1995, 2002)])
    curated = distinct_rows(curated)
    curated = filter_expr(curated, "length(Country_Code) = 1")
    write_parquet_table(curated, f"{lake.curated}/wdi_clean", target_files=1)

    # SERVING: melt to long + top-k per group, partitioned by year (X2).
    long = melt(
        spark.read.parquet(f"{lake.curated}/wdi_clean"),
        ids=["Country_Code", "Indicator_Name_derived"],
        value_columns=[str(y) for y in range(1995, 2002)],
        var_name="year",
        value_name="Indicator_Value",
        var_cast="int",
        value_cast="double",
    ).where(F.col("Indicator_Value").isNotNull())
    top = top_k_per_group(
        long,
        partition_by=["year"],
        order_by=[F.desc("Indicator_Value"), F.asc("Country_Code")],
        k=2,
    )
    write_parquet_table(
        top, f"{lake.serving}/top_by_year", partition_by=["year"]
    )

    return {
        "raw": spark.read.parquet(raw_path).count(),
        "curated": spark.read.parquet(f"{lake.curated}/wdi_clean").count(),
        "serving": spark.read.parquet(f"{lake.serving}/top_by_year").count(),
    }
