"""LakehouseSQL router: the reference's E3 notebooks speak SQL
(update_versioning.py:17-79, delta_lake.py:17-67); these tests run the
same statement shapes verbatim and assert parity with the Python-API
path."""

from __future__ import annotations

import pytest

from data_pipeline_with_spark_spark.lake.sql_router import LakehouseSQL
from data_pipeline_with_spark_spark.lake.versioned import VersionedTable


@pytest.fixture()
def lake(spark, tmp_path):
    lk = LakehouseSQL(spark, str(tmp_path / "ws"))
    cars = spark.createDataFrame(
        [
            ("IT", "FERRARI", 4000.0, 2018),
            ("DE", "BMW", 2000.0, 2018),
            ("FR", "RENAULT", 1200.0, 2019),
        ],
        ["MS", "Mh", "ec_cm3", "year"],
    )
    cars.write.parquet(str(tmp_path / "raw_cars"))
    lk.register_parquet("eea_curated.co2_emissions", str(tmp_path / "raw_cars"))
    return lk


def test_reference_e3_sequence(lake):
    # delta_lake.py:17-30 — CONVERT registers v0 without copying data.
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    # update_versioning.py:17-19
    hist = lake.sql("DESCRIBE HISTORY eea_curated.co2_emissions").collect()
    assert [r.operation for r in hist] == ["CONVERT"]

    # update_versioning.py:40-44 — UPDATE … SET … WHERE, trailing ';'.
    res = lake.sql(
        """
        UPDATE eea_curated.co2_emissions
        SET ec_cm3 = ec_cm3 + 10
        WHERE Mh = 'FERRARI';
        """
    ).collect()[0]
    assert (res.operation, res.num_affected_rows, res.new_version) == ("UPDATE", 1, 1)
    after = {
        r.Mh: r.ec_cm3
        for r in lake.sql("SELECT * FROM eea_curated.co2_emissions").collect()
    }
    assert after["FERRARI"] == 4010.0 and after["BMW"] == 2000.0

    # update_versioning.py:58-67 — time travel via the @vN suffix.
    rows = lake.sql(
        """
        SELECT *
        FROM eea_curated.co2_emissions@v0
        WHERE Mh = 'FERRARI'
        LIMIT 10
        """
    ).collect()
    assert rows[0].ec_cm3 == 4000.0

    # update_versioning.py:76-79 — RESTORE.
    lake.sql("RESTORE TABLE eea_curated.co2_emissions TO VERSION AS OF 0")
    restored = {
        r.Mh: r.ec_cm3
        for r in lake.sql("SELECT * FROM eea_curated.co2_emissions").collect()
    }
    assert restored["FERRARI"] == 4000.0
    ops = [
        r.operation
        for r in lake.sql("DESCRIBE HISTORY eea_curated.co2_emissions").collect()
    ]
    assert ops == ["RESTORE", "UPDATE", "CONVERT"]


def test_sql_matches_python_api(lake, spark, tmp_path):
    # The same UPDATE through both surfaces must produce identical data.
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    lake.sql(
        "UPDATE eea_curated.co2_emissions SET ec_cm3 = ec_cm3 * 2 WHERE year = 2018"
    )
    api = VersionedTable(spark, str(tmp_path / "api"))
    api.create(lake.table("eea_curated.co2_emissions").read(version=0))
    api.update(where="year = 2018", set_exprs={"ec_cm3": "ec_cm3 * 2"})
    got = {(r.Mh, r.ec_cm3) for r in lake.table("eea_curated.co2_emissions").read().collect()}
    want = {(r.Mh, r.ec_cm3) for r in api.read().collect()}
    assert got == want


def test_delete_and_vacuum(lake):
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    res = lake.sql(
        "DELETE FROM eea_curated.co2_emissions WHERE MS = 'FR'"
    ).collect()[0]
    assert res.num_affected_rows == 1
    left = lake.sql(
        "SELECT count(*) AS n FROM eea_curated.co2_emissions"
    ).collect()[0].n
    assert left == 2
    lake.sql("VACUUM eea_curated.co2_emissions RETAIN 1 VERSIONS")
    # table still reads after vacuum (CONVERT's source dir is external,
    # the delete rewrite is the only live managed dir)
    assert lake.table("eea_curated.co2_emissions").read().count() == 2


def test_optimize_zorder_by(lake):
    # delta_lake.py:54-67 — OPTIMIZE t ZORDER BY (col);
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    res = lake.sql(
        "OPTIMIZE eea_curated.co2_emissions ZORDER BY (MS)"
    ).collect()[0]
    assert res.new_version == 1
    hist = lake.sql("DESCRIBE HISTORY eea_curated.co2_emissions").collect()
    assert hist[0].operation == "OPTIMIZE"
    assert lake.table("eea_curated.co2_emissions").read().count() == 3


def test_merge_sql(lake, spark):
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    spark.createDataFrame(
        [("IT", "FERRARI", 4100.0, 2018), ("SE", "VOLVO", 1900.0, 2021)],
        ["MS", "Mh", "ec_cm3", "year"],
    ).createOrReplaceTempView("updates")
    lake.sql(
        """
        MERGE INTO eea_curated.co2_emissions AS t
        USING updates AS s
        ON t.Mh = s.Mh
        WHEN MATCHED THEN UPDATE SET ec_cm3 = s.ec_cm3
        WHEN NOT MATCHED THEN INSERT *
        """
    )
    rows = {r.Mh: r.ec_cm3 for r in lake.table("eea_curated.co2_emissions").read().collect()}
    assert rows == {"FERRARI": 4100.0, "BMW": 2000.0, "RENAULT": 1200.0, "VOLVO": 1900.0}


def test_describe_and_detail(lake):
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    cols = {r.col_name: r.data_type for r in lake.sql(
        "DESCRIBE TABLE eea_curated.co2_emissions"
    ).collect()}
    assert cols["ec_cm3"] == "double" and cols["year"] in ("int", "bigint")
    det = lake.sql("DESCRIBE DETAIL eea_curated.co2_emissions").collect()[0]
    assert det.version == 0 and det.num_files >= 1


def test_errors_are_loud(lake):
    with pytest.raises(KeyError, match="no versioned table"):
        lake.sql("DESCRIBE HISTORY nosuch.table")
    with pytest.raises(KeyError, match="register_parquet"):
        lake.sql("CONVERT TO DELTA not.registered")
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    with pytest.raises(ValueError, match="cannot parse SET"):
        lake.sql("UPDATE eea_curated.co2_emissions SET nonsense")


def test_alter_table_rename_column_sql(lake):
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    res = lake.sql(
        "ALTER TABLE eea_curated.co2_emissions RENAME COLUMN ec_cm3 TO engine_cc"
    ).collect()[0]
    assert (res.old_name, res.new_name, res.new_version) == ("ec_cm3", "engine_cc", 1)
    rows = lake.sql(
        "SELECT Mh, engine_cc FROM eea_curated.co2_emissions WHERE engine_cc > 3000"
    ).collect()
    assert [(r.Mh, r.engine_cc) for r in rows] == [("FERRARI", 4000.0)]
    # time travel pre-rename sees the old name
    old = lake.sql(
        "SELECT ec_cm3 FROM eea_curated.co2_emissions@v0 WHERE Mh = 'BMW'"
    ).collect()
    assert old[0].ec_cm3 == 2000.0
    # DESCRIBE reflects the logical schema
    cols = {r.col_name for r in lake.sql("DESCRIBE eea_curated.co2_emissions").collect()}
    assert "engine_cc" in cols and "ec_cm3" not in cols
    # DML through the new name routes the same file-granular path
    lake.sql(
        "UPDATE eea_curated.co2_emissions SET engine_cc = engine_cc + 1 "
        "WHERE Mh = 'RENAULT'"
    )
    vals = {
        r.Mh: r.engine_cc
        for r in lake.sql("SELECT * FROM eea_curated.co2_emissions").collect()
    }
    assert vals["RENAULT"] == 1201.0


def test_alter_table_constraints_sql(lake):
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    lake.sql(
        "ALTER TABLE eea_curated.co2_emissions ADD CONSTRAINT cc_pos CHECK (ec_cm3 > 0)"
    )
    vt = lake.table("eea_curated.co2_emissions")
    assert vt.constraints() == {"cc_pos": "ec_cm3 > 0"}
    from data_pipeline_with_spark_spark.lake.versioned import ConstraintViolationError

    with pytest.raises(ConstraintViolationError):
        vt.append(
            vt.spark.createDataFrame(
                [("XX", "BAD", -1.0, 2021)], ["MS", "Mh", "ec_cm3", "year"]
            )
        )
    lake.sql("ALTER TABLE eea_curated.co2_emissions DROP CONSTRAINT cc_pos")
    assert vt.constraints() == {}


def test_reorg_purge_sql(lake):
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    vt = lake.table("eea_curated.co2_emissions")
    vt.delete("Mh = 'BMW'", use_dv=True)
    assert vt.read().count() == 2 and vt._latest().dv_paths
    res = lake.sql("REORG TABLE eea_curated.co2_emissions APPLY (PURGE)").collect()[0]
    assert res.rewritten_files >= 1
    assert vt._latest().dv_paths is None
    assert {r.Mh for r in lake.sql("SELECT * FROM eea_curated.co2_emissions").collect()} == {
        "FERRARI",
        "RENAULT",
    }


def test_tblproperties_enable_deletion_vectors(lake):
    # The Delta opt-in shape: SET TBLPROPERTIES flips DELETE to
    # tombstone mode with no API change.
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    lake.sql(
        "ALTER TABLE eea_curated.co2_emissions "
        "SET TBLPROPERTIES ('delta.enableDeletionVectors' = 'true')"
    )
    vt = lake.table("eea_curated.co2_emissions")
    assert vt.table_properties() == {"delta.enableDeletionVectors": "true"}
    res = lake.sql(
        "DELETE FROM eea_curated.co2_emissions WHERE Mh = 'BMW'"
    ).collect()[0]
    assert res.num_affected_rows == 1
    h = vt.history()[0]
    assert h["operation"] == "DELETE" and h["params"]["rewritten_files"] == 0
    assert h["params"]["dv_rows"] == 1 and vt._latest().dv_paths
    assert vt.read().count() == 2
    assert vt.detail()["properties"]["delta.enableDeletionVectors"] == "true"


def test_merge_swapped_aliases_do_not_cross(lake, spark):
    # MERGE INTO tgt AS s USING src AS t: a sequential talias→t then
    # salias→s substitution would fold `s.ec_cm3 + t.ec_cm3` into
    # `s.ec_cm3 + s.ec_cm3`; the single-pass rescope must keep both
    # sides distinct.
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    spark.createDataFrame(
        [("IT", "FERRARI", 100.0, 2018)], ["MS", "Mh", "ec_cm3", "year"]
    ).createOrReplaceTempView("updates_swapped")
    lake.sql(
        """
        MERGE INTO eea_curated.co2_emissions AS s
        USING updates_swapped AS t
        ON s.Mh = t.Mh
        WHEN MATCHED THEN UPDATE SET ec_cm3 = s.ec_cm3 + t.ec_cm3
        """
    )
    rows = {
        r.Mh: r.ec_cm3
        for r in lake.table("eea_curated.co2_emissions").read().collect()
    }
    # target 4000 + source 100, not 100 + 100 or 4000 + 4000
    assert rows["FERRARI"] == 4100.0 and rows["BMW"] == 2000.0


def test_merge_same_alias_rejected(lake):
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    with pytest.raises(ValueError, match="share the alias"):
        lake.sql(
            """
            MERGE INTO eea_curated.co2_emissions AS x
            USING updates AS x
            ON x.Mh = x.Mh
            WHEN MATCHED THEN DELETE
            """
        )


def test_passthrough_keeps_table_name_in_literals(lake):
    # A registered (dotted) table name inside a string literal must not
    # be rewritten to the temp-view name.
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    row = lake.sql(
        "SELECT 'eea_curated.co2_emissions' AS src_name, count(*) AS n "
        "FROM eea_curated.co2_emissions"
    ).collect()[0]
    assert row.src_name == "eea_curated.co2_emissions"
    assert row.n == 3


def test_dml_metrics_observed_not_rescanned(lake, spark):
    # num_affected_rows comes from the DML commit itself (observed
    # during the write pass) for UPDATE, DELETE and MERGE.
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    res = lake.sql(
        "UPDATE eea_curated.co2_emissions SET ec_cm3 = ec_cm3 + 1 WHERE year = 2018"
    ).collect()[0]
    assert res.num_affected_rows == 2
    vt = lake.table("eea_curated.co2_emissions")
    assert vt._latest().params["num_affected_rows"] == 2

    spark.createDataFrame(
        [("IT", "FERRARI", 1.0, 2018), ("SE", "VOLVO", 2.0, 2021)],
        ["MS", "Mh", "ec_cm3", "year"],
    ).createOrReplaceTempView("metrics_src")
    res = lake.sql(
        """
        MERGE INTO eea_curated.co2_emissions AS t
        USING metrics_src AS s
        ON t.Mh = s.Mh
        WHEN MATCHED THEN UPDATE SET ec_cm3 = s.ec_cm3
        WHEN NOT MATCHED THEN INSERT *
        """
    ).collect()[0]
    # 1 matched update (FERRARI) + 1 insert (VOLVO); never negative.
    assert res.num_affected_rows == 2
    p = vt._latest().params
    assert (p["num_updated_rows"], p["num_deleted_rows"], p["num_inserted_rows"]) == (
        1,
        0,
        1,
    )

    res = lake.sql(
        "DELETE FROM eea_curated.co2_emissions WHERE Mh = 'VOLVO'"
    ).collect()[0]
    assert res.num_affected_rows == 1


def test_cluster_by_sql_routes_incremental_optimize(lake):
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    res = lake.sql(
        "ALTER TABLE eea_curated.co2_emissions CLUSTER BY (ec_cm3)"
    ).collect()[0]
    assert res.cluster_by == "ec_cm3"
    vt = lake.table("eea_curated.co2_emissions")
    assert vt.clustering_columns() == ["ec_cm3"]
    # plain OPTIMIZE on a clustered table takes the incremental path
    lake.sql("OPTIMIZE eea_curated.co2_emissions")
    hist = vt.history()
    assert hist[0]["operation"] in ("CLUSTER", "SET TBLPROPERTIES")
    assert vt.read().count() == 3
    # explicit ZORDER still runs the classic full optimize
    lake.sql("OPTIMIZE eea_curated.co2_emissions ZORDER BY (MS)")
    assert vt.history()[0]["operation"] == "OPTIMIZE"


def test_passthrough_resolves_backticked_table_names(lake):
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    row = lake.sql(
        "SELECT count(*) AS n FROM `eea_curated.co2_emissions`"
    ).collect()[0]
    assert row.n == 3
    # a backticked name inside a string literal still survives
    row = lake.sql(
        "SELECT '`eea_curated.co2_emissions`' AS s, count(*) AS n "
        "FROM `eea_curated.co2_emissions`"
    ).collect()[0]
    assert row.s == "`eea_curated.co2_emissions`" and row.n == 3


def test_add_and_drop_column_metadata_only(lake):
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    vt = lake.table("eea_curated.co2_emissions")
    files_before = set(vt._snapshot_files()[0])

    res = lake.sql(
        "ALTER TABLE eea_curated.co2_emissions ADD COLUMN fuel string"
    ).collect()[0]
    assert res.new_version == 1
    rows = lake.sql("SELECT Mh, fuel FROM eea_curated.co2_emissions").collect()
    assert len(rows) == 3 and all(r.fuel is None for r in rows)  # null-filled
    assert set(vt._snapshot_files()[0]) == files_before  # zero files touched

    # appends can now fill the evolved column
    vt.append(
        vt.spark.createDataFrame(
            [("SE", "VOLVO", 1900.0, 2021, "petrol")],
            ["MS", "Mh", "ec_cm3", "year", "fuel"],
        )
    )
    got = {r.Mh: r.fuel for r in vt.read().collect()}
    assert got["VOLVO"] == "petrol" and got["BMW"] is None

    lake.sql("ALTER TABLE eea_curated.co2_emissions DROP COLUMN fuel")
    assert "fuel" not in vt.read().columns
    # time travel still sees the column pre-drop
    assert "fuel" in vt.read(version=2).columns

    # re-adding the same name must NOT resurrect the stored values
    lake.sql("ALTER TABLE eea_curated.co2_emissions ADD COLUMN fuel string")
    vals = {r.Mh: r.fuel for r in vt.read().collect()}
    assert all(v is None for v in vals.values())

    with pytest.raises(ValueError, match="already exists"):
        vt.add_column("fuel", "string")
    with pytest.raises(ValueError, match="not in table schema"):
        vt.drop_column("nope")


def test_add_column_parenthesized_types_and_lists(lake):
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    lake.sql("ALTER TABLE eea_curated.co2_emissions ADD COLUMN price decimal(10,2)")
    vt = lake.table("eea_curated.co2_emissions")
    assert dict(vt.describe())["price"] == "decimal(10,2)"
    rows = lake.sql(
        "ALTER TABLE eea_curated.co2_emissions ADD COLUMNS (axles int, notes string)"
    ).collect()
    assert [(r.column, r.type) for r in rows] == [("axles", "int"), ("notes", "string")]
    cols = dict(vt.describe())
    assert cols["axles"] == "int" and cols["notes"] == "string"


def test_vacuum_dry_run_removes_nothing(lake):
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    vt = lake.table("eea_curated.co2_emissions")
    vt.optimize()  # prior CONVERT source dir becomes unreferenced
    would = [
        r.removed_path
        for r in lake.sql(
            "VACUUM eea_curated.co2_emissions RETAIN 1 VERSIONS DRY RUN"
        ).collect()
    ]
    # dry run reports but removes nothing — table fully readable
    assert vt.read().count() == 3
    removed = [
        r.removed_path
        for r in lake.sql(
            "VACUUM eea_curated.co2_emissions RETAIN 1 VERSIONS"
        ).collect()
    ]
    assert sorted(removed) == sorted(would)
    assert vt.read().count() == 3
    det = vt.detail()
    assert det["clustering_columns"] == [] and det["identity_columns"] == []


def test_merge_alias_rescope_skips_string_literals(lake, spark):
    # r5 ADVICE: with USING src AS u, a literal like 'call u. soon'
    # inside a SET value must not have its "u." rewritten to "s.".
    lake.sql("CONVERT TO DELTA eea_curated.co2_emissions")
    spark.createDataFrame(
        [("DE", "BMW", 2500.0, 2020)], ["MS", "Mh", "ec_cm3", "year"]
    ).createOrReplaceTempView("updates_lit")
    lake.sql(
        """
        MERGE INTO eea_curated.co2_emissions AS g
        USING updates_lit AS u
        ON g.Mh = u.Mh
        WHEN MATCHED THEN UPDATE SET ec_cm3 = u.ec_cm3, MS = 'call u. soon'
        """
    )
    rows = {r.Mh: (r.MS, r.ec_cm3)
            for r in lake.table("eea_curated.co2_emissions").read().collect()}
    assert rows["BMW"] == ("call u. soon", 2500.0)
