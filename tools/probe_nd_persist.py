"""A/B probe: persist the per-batch band triples in fold_near_dup_batch.

Alternating interleaved runs of run_stream_near_dup at sf0.1 with
SPARK_GRAFT_PROBE_PERSIST toggled, min-of-N per arm, with cpu anchors.
Throwaway probe tool (same style as probe_repartition.py).
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import cpu_reference_seconds  # noqa: E402
from data_pipeline_with_spark_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from data_pipeline_with_spark_spark.streaming.demo import run_stream_near_dup

    # warmup (codegen, session)
    os.environ["SPARK_GRAFT_PROBE_PERSIST"] = "0"
    run_stream_near_dup(spark, "/root/testdata/sf0.001", tempfile.mkdtemp())

    results: dict[str, list[float]] = {"off": [], "on": []}
    for r in range(rounds):
        print(f"anchor: {cpu_reference_seconds():.3f}", flush=True)
        for arm, flag in (("off", "0"), ("on", "1")):
            os.environ["SPARK_GRAFT_PROBE_PERSIST"] = flag
            t0 = time.perf_counter()
            run_stream_near_dup(spark, sf, tempfile.mkdtemp(prefix=f"nd_{arm}_"))
            dt = time.perf_counter() - t0
            results[arm].append(dt)
            print(f"round {r} {arm}: {dt:.3f}", flush=True)
    print(f"anchor: {cpu_reference_seconds():.3f}", flush=True)
    for arm, ts in results.items():
        print(f"{arm}: min={min(ts):.3f} all={[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
