"""Lakehouse query catalog (SURVEY §2.11): versioned-table DML is not
DuckDB-expressible (stateful, multi-statement), so these run as
rows-only checks — the full assertions live in tests/test_lake.py.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_spark.lake.versioned import VersionedTable
from data_pipeline_with_spark_spark.plans.registry import QuerySpec, register
from data_pipeline_with_spark_spark.sources.readers import read_testdata


def _versioning_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """update_versioning.py:40-79 as one driver-visible query: create a
    versioned table from a supplier sample, UPDATE one group, and return
    per-version acctbal sums for v0 vs v1 plus post-RESTORE — the three
    rows prove update, time travel, and restore each took effect."""
    sup = read_testdata(spark, sf, "supplier")
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_")).create(sup)
    t.update(where="s_nationkey = 0", set_exprs={"s_acctbal": "s_acctbal + 100"})
    v1 = t.read().agg(F.round(F.sum("s_acctbal"), 2).alias("total")).withColumn(
        "snapshot", F.lit("v1_after_update")
    )
    v0 = t.read(version=0).agg(F.round(F.sum("s_acctbal"), 2).alias("total")).withColumn(
        "snapshot", F.lit("v0_time_travel")
    )
    t.restore(0)
    v2 = t.read().agg(F.round(F.sum("s_acctbal"), 2).alias("total")).withColumn(
        "snapshot", F.lit("v2_after_restore")
    )
    return v0.unionByName(v1).unionByName(v2).select("snapshot", "total")


register(
    QuerySpec(
        name="lakehouse_versioning_roundtrip",
        build=_versioning_roundtrip,
        doc="D4 UPDATE → D5 time travel → D6 RESTORE round-trip (rows-only; pytest asserts values)",
        oracle=None,
    )
)


def _schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """D7: enforcement rejects a widened batch, mergeSchema accepts it;
    returns per-column null counts proving old rows are null-filled."""
    nat = read_testdata(spark, sf, "nation")
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_evo_")).create(nat)
    widened = nat.limit(5).withColumn("n_comment_v2", F.lit("new"))
    try:
        t.append(widened)
        rejected = False
    except Exception:
        rejected = True
    t.append(widened, merge_schema=True)
    out = t.read()
    return out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("n_comment_v2").isNull(), 1).otherwise(0)).alias(
            "null_in_old_rows"
        ),
        F.lit(rejected).alias("enforcement_rejected"),
    )


register(
    QuerySpec(
        name="lakehouse_schema_evolution",
        build=_schema_evolution,
        doc="D7 schema enforcement + mergeSchema evolution (rows-only)",
        oracle=None,
    )
)
