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


def _sql_router_e3(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's E3 entry shape verbatim: SQL text routed to the
    lakehouse (delta_lake.py:17-30 CONVERT, update_versioning.py:17-79
    UPDATE → @vN time travel → RESTORE → DESCRIBE HISTORY), driven
    through LakehouseSQL instead of the Python API. The returned frame
    is deterministic from the input table, so — uniquely for a DML
    sequence — it IS oracle-checkable: v0/v2 sums equal the raw table,
    v1 reflects the UPDATE arithmetic, and the history op-list is fixed.
    """
    from data_pipeline_with_spark_spark.lake.sql_router import LakehouseSQL

    lake = LakehouseSQL(spark, tempfile.mkdtemp(prefix="lakesql_"))
    lake.register_parquet("tpch.supplier", f"{sf}/supplier.parquet")
    lake.sql("CONVERT TO DELTA tpch.supplier")
    lake.sql(
        "UPDATE tpch.supplier SET s_acctbal = s_acctbal + 100 "
        "WHERE s_nationkey = 0;"
    )
    v1 = lake.sql(
        "SELECT 'v1_after_update' AS snapshot, "
        "round(sum(s_acctbal), 2) AS total FROM tpch.supplier"
    )
    v0 = lake.sql(
        "SELECT 'v0_time_travel' AS snapshot, "
        "round(sum(s_acctbal), 2) AS total FROM tpch.supplier@v0"
    )
    lake.sql("RESTORE TABLE tpch.supplier TO VERSION AS OF 0")
    v2 = lake.sql(
        "SELECT 'v2_after_restore' AS snapshot, "
        "round(sum(s_acctbal), 2) AS total FROM tpch.supplier"
    )
    # version-ordered op list (collect_list alone has no order guarantee)
    ops = lake.sql("DESCRIBE HISTORY tpch.supplier").select(
        F.concat(
            F.lit("history:"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("version", "operation"))),
                    lambda s: s.operation,
                ),
                ",",
            ),
        ).alias("snapshot"),
        F.lit(0.0).alias("total"),
    )
    return v0.unionByName(v1).unionByName(v2).unionByName(ops)


register(
    QuerySpec(
        name="lakehouse_sql_dml_router",
        build=_sql_router_e3,
        doc="E3 SQL statements (CONVERT/UPDATE/@vN/RESTORE/DESCRIBE HISTORY) routed to the lakehouse",
        oracle="""
        SELECT 'v0_time_travel' AS snapshot, round(sum(s_acctbal), 2) AS total
        FROM supplier
        UNION ALL
        SELECT 'v1_after_update',
               round(sum(s_acctbal + CASE WHEN s_nationkey = 0 THEN 100 ELSE 0 END), 2)
        FROM supplier
        UNION ALL
        SELECT 'v2_after_restore', round(sum(s_acctbal), 2) FROM supplier
        UNION ALL
        SELECT 'history:CONVERT,UPDATE,RESTORE', 0.0
        """,
    )
)


def _column_mapping(spark: SparkSession, sf: str) -> DataFrame:
    """Delta column mapping end-to-end: RENAME COLUMN is metadata-only
    (zero files rewritten — asserted via the history row), appends and
    file-granular UPDATE work through the new logical name, and time
    travel to v0 still reads the old name. Deterministic from the
    static nation table, so the whole sequence is oracle-checkable."""
    nat = read_testdata(spark, sf, "nation")
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_cm_")).create(nat)
    t.rename_column("n_regionkey", "region_id")
    t.update(where="n_nationkey < 5", set_exprs={"region_id": "region_id + 10"})
    renamed_meta_only = int(
        next(h for h in t.history() if h["operation"] == "RENAME COLUMN")["params"]
        .get("physical")
        == "n_regionkey"
    )
    cur = t.read().agg(
        F.sum("region_id").cast("long").alias("total"),
    ).select(
        F.lit("v_current_new_name").alias("snapshot"),
        "total",
    )
    v0 = t.read(version=0).agg(
        F.sum("n_regionkey").cast("long").alias("total")
    ).select(F.lit("v0_old_name").alias("snapshot"), "total")
    meta = spark.createDataFrame(
        [("rename_was_metadata_only", renamed_meta_only)], "snapshot string, total long"
    )
    return v0.unionByName(cur).unionByName(meta)


register(
    QuerySpec(
        name="lakehouse_column_mapping",
        build=_column_mapping,
        doc="Delta column mapping: metadata-only RENAME COLUMN + DML/time-travel through the mapping",
        oracle="""
        SELECT 'v0_old_name' AS snapshot, CAST(sum(n_regionkey) AS BIGINT) AS total
        FROM nation
        UNION ALL
        SELECT 'v_current_new_name',
               CAST(sum(n_regionkey + CASE WHEN n_nationkey < 5 THEN 10 ELSE 0 END) AS BIGINT)
        FROM nation
        UNION ALL
        SELECT 'rename_was_metadata_only', 1
        """,
    )
)


def _deletion_vectors(spark: SparkSession, sf: str) -> DataFrame:
    """Deletion vectors end-to-end: a DV DELETE writes O(matched rows)
    of (file_path, row_index) tombstones — zero data files rewritten
    (asserted from the commit params) — reads anti-join them away, and
    REORG … APPLY (PURGE) folds them into a rewrite of only the
    affected files. Deterministic from the static supplier table."""
    sup = read_testdata(spark, sf, "supplier")
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_dv_")).create(
        sup.repartitionByRange(4, "s_suppkey").sortWithinPartitions("s_suppkey")
    )
    t.delete("s_nationkey = 0", use_dv=True)
    dv_commit = t.history()[0]["params"]
    after = t.read().count()
    t.purge_deletion_vectors()
    rows = [
        ("v0_rows", t.read(version=0).count()),
        ("after_dv_delete_rows", after),
        ("dv_files_rewritten", dv_commit["rewritten_files"]),
        ("after_purge_rows", t.read().count()),
    ]
    return spark.createDataFrame(rows, "metric string, value long")


register(
    QuerySpec(
        name="lakehouse_deletion_vectors",
        build=_deletion_vectors,
        doc="Deletion vectors: O(matched) DELETE tombstones + REORG APPLY (PURGE)",
        oracle="""
        SELECT 'v0_rows' AS metric, CAST(count(*) AS BIGINT) AS value FROM supplier
        UNION ALL
        SELECT 'after_dv_delete_rows', CAST(count(*) AS BIGINT)
        FROM supplier WHERE s_nationkey <> 0
        UNION ALL
        SELECT 'dv_files_rewritten', 0
        UNION ALL
        SELECT 'after_purge_rows', CAST(count(*) AS BIGINT)
        FROM supplier WHERE s_nationkey <> 0
        """,
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


def _liquid_clustering(spark: SparkSession, sf: str) -> DataFrame:
    """Liquid-clustering lifecycle as one driver-visible query: create
    an orders-sample table, declare CLUSTER BY, run the incremental
    optimize (full first pass), append a fresh overlapping batch, run
    it again (must rewrite only the new data), and return per-pass
    rewrite/carry counts plus a data-skipping probe. Deterministic from
    the fixture; the convergence/carry assertions live in
    tests/test_lake.py."""
    orders = read_testdata(spark, sf, "orders").where("o_orderkey < 2000")
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="liquid_")).create(
        orders.repartition(4)
    )
    t.cluster_by(["o_orderkey"])
    t.optimize_incremental()
    p1 = t._latest().params
    # the appended batch re-covers [0, 500) so its key range genuinely
    # overlaps the settled file and the incremental pass must fire
    t.append(
        read_testdata(spark, sf, "orders").where("o_orderkey < 500").coalesce(1)
    )
    t.optimize_incremental()
    p2 = t._latest().params
    kept, total = t.plan_files(("o_orderkey", "<", 100))
    rows = [
        ("initial_cluster", int(p1.get("rewritten_files", 0)), int(p1.get("carried_files", 0))),
        ("incremental", int(p2.get("rewritten_files", 0)), int(p2.get("carried_files", 0))),
        ("skip_probe", len(kept), total),
    ]
    return spark.createDataFrame(rows, "phase string, a bigint, b bigint")


register(
    QuerySpec(
        name="lakehouse_liquid_clustering",
        build=_liquid_clustering,
        doc="CLUSTER BY + incremental optimize lifecycle: full pass, append, new-data-only recluster, skip probe",
        oracle=None,
    )
)


def _row_tracking(spark: SparkSession, sf: str) -> DataFrame:
    """Row-tracking lifecycle as one driver-visible query: enable on a
    supplier sample (backfill), UPDATE one nation's rows, OPTIMIZE, and
    return per-phase proof that identity survived: row counts, distinct
    _row_id counts, and the id-checksum of the updated rows before vs
    after the rewrites (equal iff ids are stable)."""
    sup = read_testdata(spark, sf, "supplier")
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rowtrack_")).create(sup)
    t.enable_row_tracking()
    # s_suppkey is dense from 0 at every sf, so the predicate is never
    # empty and the pre/post id checksums are always meaningful
    pre = t.read().where("s_suppkey < 5")
    pre_n, pre_sum = pre.count(), pre.agg(F.sum("_row_id")).collect()[0][0]
    t.update(where="s_suppkey < 5", set_exprs={"s_acctbal": "s_acctbal + 1"})
    t.optimize()
    post = t.read().where("s_suppkey < 5")
    post_n, post_sum = post.count(), post.agg(F.sum("_row_id")).collect()[0][0]
    n_rows = t.read().count()
    n_ids = t.read().select("_row_id").distinct().count()
    rows = [
        ("updated_rows_pre", pre_n, int(pre_sum)),
        ("updated_rows_post_rewrites", post_n, int(post_sum)),
        ("table", n_rows, n_ids),
    ]
    return spark.createDataFrame(rows, "phase string, n bigint, id_stat bigint")


register(
    QuerySpec(
        name="lakehouse_row_tracking",
        build=_row_tracking,
        doc="row-tracking lifecycle: backfill, UPDATE + OPTIMIZE rewrites, id-stability checksum",
        oracle=None,
    )
)


def _incremental_matview(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental aggregate-view maintenance as one driver-visible
    query: build a per-nation (count, sum(acctbal-cents)) view over a
    supplier table, run UPDATE / DELETE / append against the base, CDF-
    refresh after each, and return the view rows tagged with a proof
    column: 1 iff the incrementally-maintained row equals the full
    recompute. Refresh shuffles/merges only O(changed rows); the scan
    cost of finding them is the snapshot-diff CDF (see
    lake/matview.py's module docstring for the honest accounting)."""
    from data_pipeline_with_spark_spark.lake.matview import IncrementalAggView

    sup = read_testdata(spark, sf, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        # integer cents: exact under signed add/subtract folding;
        # floor(x+0.5) is the cross-engine half-up shared with the oracle
        F.floor(F.col("s_acctbal") * 100 + F.lit(0.5)).cast("long").alias("bal_cents"),
    )
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="matview_base_")).create(sup)
    view = IncrementalAggView(
        spark,
        t,
        tempfile.mkdtemp(prefix="matview_view_") + "/v",
        keys=["s_nationkey"],
        sum_cols=["bal_cents"],
    )
    view.build()
    t.update(where="s_suppkey % 3 = 0", set_exprs={"bal_cents": "bal_cents + 100"})
    view.refresh()
    t.delete(where="s_suppkey % 7 = 1")
    view.refresh()
    t.append(
        t.read()
        .where("s_suppkey < 5")
        .withColumn("s_suppkey", F.col("s_suppkey") + 100000)
    )
    view.refresh()
    full = t.read().groupBy("s_nationkey").agg(
        F.coalesce(F.sum(F.coalesce("bal_cents", F.lit(0))), F.lit(0)).alias("f_sum"),
        F.count(F.lit(1)).alias("f_n"),
    )
    return (
        view.read()
        .join(full, "s_nationkey")
        .select(
            "s_nationkey",
            "sum_bal_cents",
            "n_rows",
            (
                (F.col("sum_bal_cents") == F.col("f_sum"))
                & (F.col("n_rows") == F.col("f_n"))
            ).cast("int").alias("matches_recompute"),
        )
    )


def _matview_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """COUNT(DISTINCT) incremental maintenance through the exact
    support relation, driven by deterministic DML and replayed by the
    oracle as CTE logic — the same graduation pattern as
    lakehouse_incremental_matview."""
    from data_pipeline_with_spark_spark.lake.matview import IncrementalAggView

    sup = read_testdata(spark, sf, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        F.floor(F.col("s_acctbal") * 100 + F.lit(0.5)).cast("long").alias("bal_cents"),
        (F.col("s_suppkey") % 10).alias("bucket"),
    )
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="matview_cd_base_")).create(sup)
    view = IncrementalAggView(
        spark,
        t,
        tempfile.mkdtemp(prefix="matview_cd_view_") + "/v",
        keys=["s_nationkey"],
        sum_cols=["bal_cents"],
        distinct_cols=["bucket"],
    )
    view.build()
    t.update(where="s_suppkey % 4 = 0", set_exprs={"bucket": "bucket + 1"})
    view.refresh()
    t.delete(where="s_suppkey % 5 = 2")
    view.refresh()
    return view.read().select(
        "s_nationkey", "sum_bal_cents", "n_rows", "n_distinct_bucket"
    )


register(
    QuerySpec(
        name="lakehouse_matview_count_distinct",
        build=_matview_count_distinct,
        doc="COUNT(DISTINCT) matview via exact support relation (multiplicity "
        "per (group, value), self-maintainable under deletes); oracle replays "
        "the deterministic UPDATE/DELETE as CTEs",
        oracle="""
        WITH base AS (
          SELECT s_suppkey, s_nationkey,
                 CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
                 s_suppkey % 10 AS bucket
          FROM supplier
        ), updated AS (
          SELECT s_suppkey, s_nationkey, bal_cents,
                 CASE WHEN s_suppkey % 4 = 0 THEN bucket + 1 ELSE bucket END AS bucket
          FROM base
        ), final AS (
          SELECT * FROM updated WHERE NOT (s_suppkey % 5 = 2)
        )
        SELECT s_nationkey,
               CAST(sum(bal_cents) AS BIGINT) AS sum_bal_cents,
               count(*) AS n_rows,
               CAST(count(DISTINCT bucket) AS BIGINT) AS n_distinct_bucket
        FROM final
        GROUP BY s_nationkey
        """,
    )
)


register(
    QuerySpec(
        name="lakehouse_incremental_matview",
        build=_incremental_matview,
        doc="CDF-driven incremental aggregate view: UPDATE/DELETE/append refreshes "
        "vs full recompute proof; oracle replays the deterministic DML sequence "
        "as CTE logic over the base parquet (graduated from rows-only in r6)",
        # The fixture DML is deterministic, so the view's final content
        # equals a plain aggregate over the base table's final logical
        # state — expressed here as update -> delete -> append CTEs. The
        # proof column hashes as literal 1: if the incremental fold ever
        # diverged from the recompute, Spark would emit 0 and mismatch.
        oracle="""
        WITH base AS (
          SELECT s_suppkey, s_nationkey,
                 CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
          FROM supplier
        ), updated AS (
          SELECT s_suppkey, s_nationkey,
                 CASE WHEN s_suppkey % 3 = 0 THEN bal_cents + 100
                      ELSE bal_cents END AS bal_cents
          FROM base
        ), deleted AS (
          SELECT * FROM updated WHERE NOT (s_suppkey % 7 = 1)
        ), final AS (
          SELECT * FROM deleted
          UNION ALL
          SELECT s_suppkey + 100000 AS s_suppkey, s_nationkey, bal_cents
          FROM deleted WHERE s_suppkey < 5
        )
        SELECT s_nationkey,
               CAST(sum(bal_cents) AS BIGINT) AS sum_bal_cents,
               count(*) AS n_rows,
               CAST(1 AS INT) AS matches_recompute
        FROM final
        GROUP BY s_nationkey
        """,
    )
)


def _type_widening(spark: SparkSession, sf: str) -> DataFrame:
    """Type widening end-to-end through the driver gate: a table
    created (int key, float32 balance) receives a (bigint, double)
    batch under merge_schema — the table schema widens, the narrow v0
    files upcast at read, and the returned aggregate + schema string
    hash-match a plain-SQL recompute (the float32 round-trip is
    replicated in the oracle with CAST AS REAL; per-row round-2 before
    the sum keeps cross-engine addition order irrelevant)."""
    import tempfile

    sup = read_testdata(spark, sf, "supplier")
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="vtw_")).create(
        sup.where("s_suppkey % 2 = 0").select(
            F.col("s_suppkey").cast("int").alias("k"),
            F.col("s_acctbal").cast("float").alias("bal"),
        )
    )
    t.append(
        sup.where("s_suppkey % 2 = 1").select(
            F.col("s_suppkey").cast("bigint").alias("k"),
            F.col("s_acctbal").cast("double").alias("bal"),
        ),
        merge_schema=True,
    )
    df = t.read()
    schema_str = ",".join(
        f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("k").cast("bigint").alias("key_sum"),
        F.round(F.sum(F.round(F.col("bal"), 2)), 2).alias("bal_sum"),
        F.lit(schema_str).alias("widened_schema"),
    )


register(
    QuerySpec(
        name="lakehouse_type_widening",
        build=_type_widening,
        doc="D7 type widening: (int,float) table + (bigint,double) batch -> "
        "widened schema, narrow files upcast at read; aggregate hash-matched",
        oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(s_suppkey) AS BIGINT) AS key_sum,
               round(sum(round(
                 CASE WHEN s_suppkey % 2 = 0
                      THEN CAST(CAST(s_acctbal AS REAL) AS DOUBLE)
                      ELSE s_acctbal END, 2)), 2) AS bal_sum,
               'k:bigint,bal:double' AS widened_schema
        FROM supplier
        """,
    )
)
