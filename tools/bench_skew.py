"""Skewed-key robustness bench (r5 verdict lead #4).

Runs on the derived sf1 fixture's ``events.skew_key`` (zipf s≈1: the
hottest key holds ~10% of 1M rows — regenerate with
``python tools/make_scaled_fixture.py``):

1. group-agg on the hot key: plain groupBy vs ``salted_group_agg``
   (two-phase), result-equivalence asserted;
2. join events × 430-row dim on the hot key with SMJ forced
   (broadcast off): AQE-on plain join — asserting the runtime
   skew-split actually fires (``skew=true`` in the final plan) — vs
   ``salted_skew_join`` with AQE's splitter disabled (the
   environment where explicit salting is the only defense);
3. the same AQE-off plain join as the degraded baseline salting is
   measured against.

Prints one JSON line; the narrative lands in SCALING.md §skew.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from data_pipeline_with_spark_spark.operators.aggregates import salted_group_agg
from data_pipeline_with_spark_spark.operators.joins import salted_skew_join
from data_pipeline_with_spark_spark.session import get_spark

SF1 = Path(__file__).resolve().parent.parent / ".scaling" / "sf1"


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 3)


def main() -> None:
    if not (SF1 / "events.parquet").exists():
        sys.exit("run tools/make_scaled_fixture.py first")
    spark = get_spark("bench_skew")
    events = spark.read.parquet(str(SF1 / "events.parquet"))
    dim = (
        events.select("skew_key").distinct()
        .withColumn("dim_v", F.col("skew_key") * 2)
    )
    dim.write.mode("overwrite").parquet(str(SF1 / "_skew_dim.parquet"))
    dim = spark.read.parquet(str(SF1 / "_skew_dim.parquet"))

    aggs = {"n": ("count", "event_id"), "s": ("sum", "value")}
    results: dict[str, float] = {}

    # -------- 1. aggregation: plain vs salted (both warm once)
    plain_agg = lambda: sorted(
        map(tuple, events.groupBy("skew_key").agg(
            F.count("event_id").alias("n"), F.sum("value").alias("s")
        ).collect())
    )
    salted_agg = lambda: sorted(
        map(tuple, salted_group_agg(events, ["skew_key"], aggs).collect())
    )
    plain_agg(); salted_agg()
    a, results["agg_plain"] = timed(plain_agg)
    b, results["agg_salted"] = timed(salted_agg)
    assert [r[0] for r in a] == [r[0] for r in b] and all(
        x[1] == y[1] and abs(x[2] - y[2]) < 1e-6 for x, y in zip(a, b)
    ), "salted aggregation diverged from plain"

    # -------- 2. join with SMJ forced. The sf1 fixture is ~10 MB of
    # shuffle data, so AQE's default 256 MB skew threshold can never
    # trip locally; scale the thresholds to the data (keeping their
    # ratio) so the split MECHANISM is exercised on the real zipf key —
    # at cluster scale the defaults play the same role.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    def plain_join():
        j = events.join(dim, on="skew_key").select(F.sum(F.col("dim_v")).alias("t"))
        return j.collect()[0].t

    # AQE-on: runtime skew split handles it — verify it actually fires
    probe = events.join(dim, on="skew_key")
    probe.collect()
    final = probe._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    skew_fired = "skew=true" in final

    plain_join()
    _, results["join_plain_aqe_on"] = timed(plain_join)

    # AQE skew-split off: the pathological single-reducer case salting exists for
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    plain_join()
    _, results["join_plain_aqe_off"] = timed(plain_join)

    def salted_join():
        j = salted_skew_join(events, dim, key="skew_key").select(
            F.sum(F.col("dim_v")).alias("t")
        )
        return j.collect()[0].t

    salted_join()
    _, results["join_salted_aqe_off"] = timed(salted_join)
    assert plain_join() == salted_join(), "salted join diverged from plain"

    spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")

    # -------- 3. LSH hot-bucket concentration (r8 verdict item #2):
    # an adversarial boilerplate corpus — 3k docs sharing ONE text, so
    # every band forms a single 3k-doc bucket whose exact all-pairs
    # contract is ~4.5M output rows generated inside ONE task. The
    # scale-safe DEFAULT cap (DEFAULT_MAX_BUCKET=1000) drops the
    # boilerplate bucket whole; max_bucket=None is the documented
    # exact opt-in. The Observation reports the drop for free.
    from pyspark.sql import Observation

    from data_pipeline_with_spark_spark.llm.dedup import (
        DEFAULT_MAX_BUCKET,
        minhash_candidate_pairs,
    )

    n_boiler, n_normal = 3_000, 17_000
    boiler = spark.range(n_boiler).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "all rights reserved this page is copyright protected material"
        ).alias("text"),
    )
    normal = spark.range(n_boiler, n_boiler + n_normal).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("document body"),
            (F.col("id") % 997).cast("string"),
            (F.col("id") % 89).cast("string"),
            (F.col("id") % 13).cast("string"),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    corpus = boiler.unionByName(normal)

    obs = Observation("lsh_hot_bucket")
    capped_df = minhash_candidate_pairs(corpus, bucket_metrics=obs)
    capped_pairs, results["lsh_capped_default"] = timed(capped_df.count)
    metrics = dict(obs.get)
    uncapped_df = minhash_candidate_pairs(corpus, max_bucket=None)
    uncapped_pairs, results["lsh_uncapped_optin"] = timed(uncapped_df.count)
    assert metrics["n_buckets_dropped"] >= 1, "hot bucket was not dropped"
    assert metrics["max_bucket_size"] >= n_boiler
    assert uncapped_pairs >= n_boiler * (n_boiler - 1) // 2
    assert capped_pairs < uncapped_pairs
    print(
        json.dumps(
            {
                "skew_split_fired": skew_fired,
                "lsh_default_max_bucket": DEFAULT_MAX_BUCKET,
                "lsh_capped_pairs": capped_pairs,
                "lsh_uncapped_pairs": uncapped_pairs,
                "lsh_bucket_metrics": {k: int(v) for k, v in metrics.items()},
                "timings_sec": results,
            }
        )
    )


if __name__ == "__main__":
    main()
