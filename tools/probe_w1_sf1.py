"""Interleaved A/B of w1's parallelize guard at sf1.

Arms: off (no repartition), on32 (ensure_min_partitions to default
parallelism — current code), on-if-single (guard fires only when the
scan yields exactly 1 partition, i.e. sf0.1 shape). Throwaway probe.

Usage: python tools/probe_w1_sf1.py [rounds]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from bench import cpu_reference_seconds
from data_pipeline_with_spark_spark.operators.windows import top_k_per_group
from data_pipeline_with_spark_spark.session import get_spark
from data_pipeline_with_spark_spark.sources.readers import read_testdata
from data_pipeline_with_spark_spark.sources.writers import write_noop
from data_pipeline_with_spark_spark.util import ensure_min_partitions

SF1 = str(Path(__file__).resolve().parent.parent / ".scaling" / "sf1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def build(spark, guard: str):
    li = read_testdata(spark, SF1, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    if guard == "on32":
        li = ensure_min_partitions(li, by=("l_orderkey",))
    elif guard == "single":
        if li.rdd.getNumPartitions() == 1:
            li = ensure_min_partitions(li, by=("l_orderkey",))
    return top_k_per_group(
        li.select(
            "l_returnflag", "ship_year", "l_orderkey", "l_linenumber",
            "l_extendedprice",
        ),
        partition_by=["l_returnflag", "ship_year"],
        order_by=[
            F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
        ],
        k=100,
    )


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    li = read_testdata(spark, SF1, "lineitem")
    print("sf1 lineitem scan partitions:", li.rdd.getNumPartitions())
    write_noop(build(spark, "off"))  # warmup
    res: dict[str, list[float]] = {"off": [], "on32": [], "single": []}
    for r in range(ROUNDS):
        print(f"anchor {cpu_reference_seconds():.3f}", flush=True)
        for arm in res:
            t0 = time.perf_counter()
            write_noop(build(spark, arm))
            dt = time.perf_counter() - t0
            res[arm].append(dt)
            print(f"round {r} {arm}: {dt:.3f}", flush=True)
    print(f"anchor {cpu_reference_seconds():.3f}", flush=True)
    for arm, ts in res.items():
        print(f"{arm}: min={min(ts):.3f} all={[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
