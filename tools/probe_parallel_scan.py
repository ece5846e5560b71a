"""A/B probe: guarded fact-table repartition vs status quo at sf0.1.

Every sf0.1 fixture is ONE parquet file with ONE row group, so every
scan is a single task and all map-side work (broadcast-join probes,
window sorts, tokenize+explode, partial aggregation) runs on 1 of N
cores. This probe measures, per query, the as-is build vs the same
build with the named fact tables hash-repartitioned to
defaultParallelism right after the scan (the ensure_min_partitions
guard pattern — a no-op at scale where scans already have >= cores
partitions).

Usage: python tools/probe_parallel_scan.py [sweeps] [sf_dir]
Prints per-query min/median for each variant, interleaved sweeps.
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from data_pipeline_with_spark_spark.plans import all_queries
from data_pipeline_with_spark_spark.session import get_spark
from data_pipeline_with_spark_spark.sources.readers import (
    read_testdata,
    register_testdata_views,
)
from data_pipeline_with_spark_spark.sources.writers import write_noop

SWEEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

# high-cardinality, never-null spread keys per fact table
KEYS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "customer": "c_custkey",
}


def par_view(spark, table):
    df = read_testdata(spark, SF, table)
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        df = df.repartition(n, F.col(KEYS[table]))
    df.createOrReplaceTempView(table)


CATALOG = all_queries()


def sql_variant(name, tables):
    spec = CATALOG[name]

    def build(spark, sf):
        df = spec.build(spark, sf)  # registers plain views
        for t in tables:
            par_view(spark, t)
        return spark.sql(spec.oracle)

    return build


def df_variant_w1(spark, sf):
    from data_pipeline_with_spark_spark.operators.windows import top_k_per_group

    li = read_testdata(spark, sf, "lineitem")
    n = spark.sparkContext.defaultParallelism
    if li.rdd.getNumPartitions() < n:
        li = li.repartition(n, F.col("l_orderkey"))
    return top_k_per_group(
        li.select(
            "l_returnflag",
            F.year("l_shipdate").alias("ship_year"),
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
        ),
        ["l_returnflag", "ship_year"],
        [F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        k=100,
    )


VARIANTS: dict[str, dict] = {
    "w1_topk_per_group": {"base": CATALOG["w1_topk_per_group"].build, "par": df_variant_w1},
}
for q, tabs in {
    "tpch_q1_pricing_summary": ("lineitem",),
    "tpch_q3_top_revenue_orders": ("lineitem", "orders"),
    "tpch_q5_local_supplier_volume": ("lineitem", "orders"),
    "tpch_q7_volume_shipping": ("lineitem", "orders"),
    "tpch_q9_product_profit": ("lineitem",),
    "tpch_q18_large_volume_customer": ("lineitem", "orders"),
}.items():
    VARIANTS[q] = {"base": CATALOG[q].build, "par": sql_variant(q, tabs)}


def main() -> None:
    spark = get_spark("probe_parallel_scan")
    sweep: dict[tuple, list[float]] = {}
    # warm codegen at sf0.001
    for name, v in VARIANTS.items():
        for kind, build in v.items():
            write_noop(build(spark, "/root/testdata/sf0.001"))
    for s in range(SWEEPS):
        for name, v in VARIANTS.items():
            for kind, build in v.items():
                spark.sparkContext.setJobDescription(f"{name}:{kind}:s{s}")
                t0 = time.perf_counter()
                write_noop(build(spark, SF))
                sweep.setdefault((name, kind), []).append(
                    time.perf_counter() - t0
                )
        spark.sparkContext.setJobDescription(None)
    for name in VARIANTS:
        b = sweep[(name, "base")]
        p = sweep[(name, "par")]
        print(
            f"{name}: base min={min(b):.3f} med={statistics.median(b):.3f}"
            f" | par min={min(p):.3f} med={statistics.median(p):.3f}"
            f" | speedup(min) {min(b) / min(p):.2f}x"
        )


if __name__ == "__main__":
    main()
