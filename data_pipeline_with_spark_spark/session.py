"""SparkSession builder for the engine.

Reference parity: the reference runs on a managed Databricks cluster and
introspects its config (`setup.py:12-28`, `data_import.ipynb.py:16-33`).
We own session construction instead: local[N] for tests/bench, but every
config below is cluster-safe — on a real cluster the master/memory flags
are supplied by the submitter and the SQL configs still apply.

Scale notes (100 TB design intent):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  broadcast-join demotion are essential at 1000-executor scale.
- ``spark.sql.shuffle.partitions`` is a *default*; AQE coalesces down,
  and big shuffles should set it via ``spark.sql.adaptive`` rather than
  hand-tuning per query.
- Arrow on: every pandas-interop path (Pandas UDFs, toPandas) is
  batch-columnar instead of row-pickled.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _default_driver_mem() -> str:
    """Driver-heap default derived from what the host can actually give
    (min of MemAvailable and any cgroup limit), capped at 32g and
    floored at 1g. A flat 32g default OOM-kills the JVM on smaller
    hosts/containers; SPARK_GRAFT_DRIVER_MEM always overrides."""
    limit_bytes = None
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable:"):
                    limit_bytes = int(line.split()[1]) * 1024
                    break
    except OSError:
        pass
    for cg in (
        "/sys/fs/cgroup/memory.max",  # cgroup v2
        "/sys/fs/cgroup/memory/memory.limit_in_bytes",  # cgroup v1
    ):
        try:
            raw = open(cg).read().strip()
            if raw != "max":
                v = int(raw)
                if v < (1 << 50):  # v1 reports ~2^63 for "unlimited"
                    limit_bytes = v if limit_bytes is None else min(limit_bytes, v)
        except (OSError, ValueError):
            continue
    if limit_bytes is None:
        return "4g"  # unknown host: conservative
    # leave ~25% headroom for Python workers / page cache
    gb = max(1, min(32, int(limit_bytes * 0.75 / (1 << 30))))
    return f"{gb}g"


def _builder(
    app_name: str,
    master: str | None,
    shuffle_partitions: int,
    extra_conf: dict[str, str] | None,
) -> SparkSession.Builder:
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf: dict[str, str] = {
        # local[N] runs executors inside the driver JVM, whose 1g
        # default heap starves 32 executor threads long before the
        # host's RAM does. Sized from available RAM (capped 32g) so a
        # smaller host/container isn't OOM-killed. Only honored at JVM
        # launch — on a real cluster the submitter's
        # --driver-memory/--executor-memory win.
        "spark.driver.memory": os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", _default_driver_mem()
        ),
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # autoBroadcastJoinThreshold stays at the 10 MiB DEFAULT — r10
        # measured both sides of this carefully. A mid-round A/B under
        # codegen-cache eviction + host noise suggested raising it to
        # 64 MiB (sf1 q5's ~15 MiB customer dim "9 s as SMJ vs 4 s
        # broadcast"); re-measured clean (codegen cache fixed, quiet
        # box, warm), the comparison INVERTS: SMJ 1.5-2.5 s vs 4.1 s
        # all-broadcast — in single-JVM local mode a 15 MiB broadcast
        # hash relation costs real build/copy time and buys no network
        # saving. On a real cluster the default + AQE's runtime
        # demotion/promotion from observed sizes is the scale-correct
        # policy either way. Lesson recorded in SCALING.md.
        # The generated-class cache defaults to 100 entries; a session
        # serving a whole catalog of queries (bench, the oracle gate, a
        # real multi-tenant driver) evicts constantly and pays a Janino
        # recompile of EVERY whole-stage-codegen subtree on EVERY run —
        # measured r10: minhash signatures at sf1 ran 1.8 s in a fresh
        # session but 5-7 s after one sweep through the 27 headliners;
        # raising to 5000 restored 1.7-1.8 s THEN. r12 re-bisected a
        # residual: a full probe-set sweep (~100 builds incl. streaming
        # entries, whose per-micro-batch plans mint fresh codegen keys)
        # still overflows 5000 — first post-sweep signatures run 31.7 s
        # at cache 5000 vs 6.6 s at 50000 (warm 2.5 s both, quiet box,
        # sf1). 50k holds every unit a full catalog sweep mints; the
        # metaspace bill only materializes for keys actually created
        # (~10k per sweep, tens-of-KB each) — hundreds of MB against a
        # 32 g single-JVM driver, and per-executor JVMs on a real
        # cluster compile far fewer plans each.
        "spark.sql.codegen.cache.maxEntries": "50000",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Files: pack small files, split large ones. 128 MiB default is
        # right for the 100 TB target; local parquet fixtures are tiny
        # so AQE coalescing handles them.
        "spark.sql.files.maxPartitionBytes": "134217728",
        "spark.sql.parquet.compression.codec": "snappy",
        # INT96 (the legacy default) writes NO min/max statistics, which
        # kills timestamp data-skipping; TIMESTAMP_MICROS is the modern
        # type every engine reads and it carries full footer stats.
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        # Keep the UI off for headless runs (bench/pytest).
        "spark.ui.showConsoleProgress": "false",
        "spark.ui.enabled": os.environ.get("SPARK_GRAFT_UI", "false"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder


def get_spark(
    app_name: str = "data_pipeline_with_spark_spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``master=None`` defers to spark-submit / an existing session; tests
    and bench pass ``local[N]`` explicitly.
    """
    if master is None and os.environ.get("SPARK_GRAFT_LOCAL", "1") == "1":
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    spark = _builder(app_name, master, shuffle_partitions, extra_conf).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()


def conf_summary(spark: SparkSession, prefix: str = "spark.sql.") -> dict[str, str]:
    """X5 config introspection (reference: getConf().getAll() /
    SET -v, data_import.ipynb.py:16-33) scoped to a prefix."""
    jconf = spark.sparkContext.getConf().getAll()
    out = {k: v for k, v in jconf if k.startswith(prefix)}
    for k in (
        "spark.sql.shuffle.partitions",
        "spark.sql.adaptive.enabled",
        "spark.sql.session.timeZone",
    ):
        try:
            out[k] = spark.conf.get(k)
        except Exception:
            pass
    return out
