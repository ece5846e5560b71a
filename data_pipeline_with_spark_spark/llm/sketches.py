"""Mergeable sketches: HyperLogLog distinct-count registers and a
Count-Min frequency sketch — the bounded-memory summaries a 100 TB
pipeline ships between stages instead of raw keys.

Both are pure Catalyst expressions over the portable md5 primitive (the
same hash doctrine as `llm/dedup.py`), so the sketch CONTENTS — not just
the estimates — are bit-identical on any engine and every entry is
DuckDB-oracle-checkable:

- HyperLogLog (Flajolet et al. '07, the classic 32-bit variant): bucket
  = first 2 md5 hex chars (p=8, m=256), rho = leading-zero count of the
  next 24 bits + 1 (capped at 25). Registers are per-bucket MAX — an
  integer, commutative, idempotent aggregate, so partial registers from
  any partitioning / micro-batch MERGE by max to exactly the registers
  of the union (pinned by `test_hll_registers_merge_by_max`). The
  estimator sums 2^(25-reg) as BIGINT — exact integer arithmetic, no
  float-order sensitivity — and divides once at the end.
- Count-Min (Cormode & Muthukrishnan '05): d=4 rows, w=4096 buckets
  keyed by the 3-hex-char prefix of md5(row || ':' || token). Counters
  are integer sums → mergeable across partitions by +, and map-side
  partial aggregation builds per-partition sub-sketches for free.
  Estimate = min over rows; overestimate-only by construction.
- Quantile histogram (HdrHistogram's log2+linear bucketing, Gray et al.
  / hdrhistogram.org; the mergeable third leg next to HLL and CMS —
  exact percentiles don't merge): bucket id = (bitlen(v)-1)*32 +
  (v - 2^(bitlen-1))*32 div 2^(bitlen-1), pure BIGINT arithmetic
  (`length(bin(v))` is the bit length in both engines, shifts/div are
  integer) so the counter table replays bit-exactly cross-engine.
  Counters merge by +; quantile estimate = cumulative-rank walk + linear
  interpolation inside the hit bucket, every step integer. Relative
  error is bounded by the sub-bucket width: ≤ 1/32 ≈ 3.1 %.
- KMV bottom-k (Bar-Yossef et al. '02): the k smallest md5 hashes of
  distinct keys — a mergeable uniform sample (bottom-k of shard
  bottom-k unions = global bottom-k). Distinct-count estimator
  (k-1)·2^48 div h48 is pure BIGINT; under k distinct keys the sample
  is the domain and the estimate is exact.

Scale shape: the sketch tables are O(m) / O(d·w) rows regardless of
input size — the only full-data pass is one scan + one grouped integer
aggregate; probes broadcast-join against the tiny sketch.

Extension surface beyond the reference (no counterpart in
/root/reference — its notebooks stop at exact aggregates); included as
first-class LLM-pipeline operators per SURVEY §2.14.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# HyperLogLog (p=8, 32-bit hash domain)

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 buckets
HLL_RHO_MAX = 25  # 24 rho bits + 1
_TWO_P25 = 1 << HLL_RHO_MAX  # scale for exact integer 2^(25-reg) sums
# alpha_m * m^2 * 2^25 precomputed once so BOTH engines inline the same
# decimal literal (keeps the estimate a single division at runtime).
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_NUMERATOR = HLL_ALPHA * HLL_M * HLL_M * _TWO_P25


def _rho_expr(rest: str) -> str:
    """SQL text for rho = #leading zero bits of the 24-bit tail + 1.

    `rest` must be a 6-hex-char column expression. Counted nibble-wise:
    whole leading '0' nibbles contribute 4 zeros each, then the first
    non-zero hex digit contributes its within-nibble leading zeros
    (8-f -> 0, 4-7 -> 1, 2-3 -> 2, 1 -> 3; hex chars order correctly
    lexicographically). All-zero tail caps at 25. Identical text runs
    in Spark and DuckDB.
    """
    nz = f"length(regexp_extract({rest}, '^0*', 0))"
    c = f"substring({rest}, {nz} + 1, 1)"
    nlz = (
        f"(CASE WHEN {c} >= '8' THEN 0 WHEN {c} >= '4' THEN 1 "
        f"WHEN {c} >= '2' THEN 2 ELSE 3 END)"
    )
    return (
        f"CAST(CASE WHEN {nz} = 6 THEN {HLL_RHO_MAX} "
        f"ELSE 4 * {nz} + {nlz} + 1 END AS INT)"
    )


def hll_bucket(key: Column) -> Column:
    """Bucket id = first 2 md5 hex chars (256 buckets). Kept as the hex
    STRING: bucket identity is equality-only, so no radix conversion —
    the same trick as the md5-banded LSH join in `dedup.py`."""
    return F.substring(F.md5(key.cast("string")), 1, 2)


def hll_project(df: DataFrame, key_col: str, group_cols: list[str]) -> DataFrame:
    """The pre-aggregation projection: (group..., bucket hex, rho int)
    per input row. Shared verbatim by the batch face (`hll_registers`)
    and the streaming face (`streaming.demo.run_streaming_hll`), so the
    incremental register state is the same expression tree Catalyst
    aggregates in batch."""
    h = F.md5(F.col(key_col).cast("string"))
    return df.select(
        *group_cols,
        F.substring(h, 1, 2).alias("bucket"),
        F.expr(_rho_expr("substring(md5(CAST(%s AS STRING)), 3, 6)" % key_col)).alias(
            "rho"
        ),
    )


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group HLL registers: (group..., bucket hex, reg int).

    One scan + one grouped integer MAX — the register table is at most
    m=256 rows per group whatever the input size, and partial registers
    from disjoint slices merge to the union's registers by max.
    """
    out = hll_project(df, key_col, group_cols)
    return out.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("reg"))


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register tables (e.g. per-source or per-micro-batch partials)
    down to `group_cols`: max per bucket — associative and idempotent."""
    return registers.groupBy(*group_cols, "bucket").agg(F.max("reg").alias("reg"))


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    include_register_count: bool = False,
) -> DataFrame:
    """Cardinality estimate per group from a register table.

    sum(2^(25-reg)) accumulates as BIGINT (every term exact, addition
    order-free); empty buckets contribute 2^25 each. Exactly one double
    division + the standard small-range linear-counting correction.
    ``include_register_count`` adds the populated-bucket count as
    ``n_buckets`` (one aggregate, no self-join on the register table —
    a memory-sink view can't self-join without attribute conflicts).
    """
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.expr(f"CAST(pow(2.0, {HLL_RHO_MAX} - reg) AS BIGINT)")
        ).alias("sum_present"),
    )
    zeros = F.lit(HLL_M) - F.col("n_present")
    sum_total = F.col("sum_present") + zeros * F.lit(_TWO_P25)
    raw = F.lit(HLL_NUMERATOR) / sum_total.cast("double")
    small = (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0)
    linear = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double"))
    extra = (
        [F.col("n_present").alias("n_buckets")] if include_register_count else []
    )
    return agg.select(
        *group_cols,
        *extra,
        F.round(F.when(small, linear).otherwise(raw), 4).alias("hll_est"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (d=4 rows, w=4096 hex-prefix buckets)

CMS_DEPTH = 4
CMS_KEY_HEX = 3  # 3 hex chars -> 4096 buckets per row


def cms_key(row: int, token: Column | str) -> Column:
    """Bucket key for sketch row `row`: 3-hex-char prefix of the salted
    md5 — string-keyed like `hll_bucket` (equality-only identity)."""
    t = F.col(token) if isinstance(token, str) else token
    return F.substring(F.md5(F.concat(F.lit(f"{row}:"), t)), 1, CMS_KEY_HEX)


def cms_sketch(token_counts: DataFrame, token_col: str = "token",
               count_col: str = "cnt") -> DataFrame:
    """Build the (row, key, c) sketch from exact per-token counts.

    Input is the per-token count table (one shuffle upstream); the
    sketch itself is <= d*w rows. posexplode of the d salted keys keeps
    this a single projection + one grouped integer sum, and map-side
    partial aggregation means each partition contributes a sub-sketch
    that merges by + — the mergeability that makes CMS shippable from
    100 TB of shards.
    """
    keys = F.array(*[cms_key(i, token_col) for i in range(CMS_DEPTH)])
    exploded = token_counts.select(
        F.col(count_col).alias("__c"), F.posexplode(keys).alias("row", "key")
    )
    return exploded.groupBy("row", "key").agg(F.sum("__c").alias("c"))


def cms_lookup(sketch: DataFrame, probes: DataFrame,
               token_col: str = "token") -> DataFrame:
    """Point-query the sketch for each probe token: min over the d rows.

    The probe side precomputes its d keys and LEFT-joins the tiny sketch
    on (row, key) — broadcast-able from either side. An empty (row, key)
    bucket counts as a zero counter (coalesce below), so a token never
    inserted answers 0 and a partially-present token still takes min over
    all d rows; estimates only ever overcount (collisions add, never
    subtract) — the contract would break if absent buckets were dropped.
    """
    keys = F.array(*[cms_key(i, token_col) for i in range(CMS_DEPTH)])
    p = probes.withColumn("__keys", keys).select(
        "*", F.posexplode("__keys").alias("row", "key")
    )
    return (
        p.join(F.broadcast(sketch), ["row", "key"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# Quantile histogram (HdrHistogram log2 + linear sub-bucket scheme)

QH_SUB = 32  # linear sub-buckets per power-of-two range


def qh_bucket_sql(v: str, div: str = "div", shift: str = "spark") -> str:
    """SQL text for the histogram bucket id of positive-BIGINT expr `v`.

    bucket = (k-1)*QH_SUB + ((v - 2^(k-1)) * QH_SUB) intdiv 2^(k-1)
    with k = bit length of v (`length(bin(v))` — identical semantics in
    Spark and DuckDB). All-integer, so the counter table is bit-exact
    cross-engine. `div`/`shift` select the engine spelling: Spark uses
    `div` + shiftleft(); DuckDB `//` + `<<`.
    """
    k = f"length(bin({v}))"
    if shift == "spark":
        lo = f"shiftleft(CAST(1 AS BIGINT), CAST({k} AS INT) - 1)"
    else:
        lo = f"(CAST(1 AS BIGINT) << ({k} - 1))"
    return (
        f"(CAST({k} AS BIGINT) - 1) * {QH_SUB}"
        f" + (({v} - {lo}) * {QH_SUB}) {div} {lo}"
    )


def qh_bounds_sql(bucket: str, div: str = "div", shift: str = "spark") -> tuple[str, str]:
    """(lower, upper) bound SQL for a bucket id — inverse of
    `qh_bucket_sql` up to the div-truncated sub-bucket edges (the same
    deterministic edges both engines reconstruct, which is all the
    estimator needs)."""
    k = f"({bucket} {div} {QH_SUB} + 1)"
    sub = f"({bucket} % {QH_SUB})"
    if shift == "spark":
        lo = f"shiftleft(CAST(1 AS BIGINT), CAST({k} AS INT) - 1)"
    else:
        lo = f"(CAST(1 AS BIGINT) << ({k} - 1))"
    lb = f"({lo} + ({sub} * {lo}) {div} {QH_SUB})"
    ub = f"({lo} + (({sub} + 1) * {lo}) {div} {QH_SUB})"
    return lb, ub


def quantile_hist(
    points: DataFrame, value_col: str = "v", group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Build the (group..., bucket, cnt) histogram from positive BIGINT
    values.

    One projection + one grouped count: map-side partial aggregation
    ships per-partition sub-histograms (≤ 64*QH_SUB rows each per group)
    to a sketch-sized shuffle — the same O(sketch) reduction as
    `cms_sketch`, mergeable across shards/micro-batches by plain +.
    Values are clamped to >= 1 (bucket 0) so the bit-length bucketing is
    total. ``group_cols`` gives per-group histograms (the `hll_registers`
    shape): one pass answers any quantile of any group.
    """
    v = f"greatest(CAST({value_col} AS BIGINT), CAST(1 AS BIGINT))"
    return (
        points.select(*group_cols, F.expr(qh_bucket_sql(v)).alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def quantile_estimate(
    hist: DataFrame,
    q_pcts: tuple[int, ...] = (50, 90, 99),
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Estimate the q-th percentiles from the histogram alone:
    (group..., q_pct, n, qh_est) with qh_est a BIGINT.

    Rank target r = (q_pct*(n-1)) div 100 + 1 (1-indexed); the hit
    bucket is the first with cumulative count >= r; the estimate
    linear-interpolates the bucket's [lb, ub) span at the within-bucket
    rank — every step BIGINT, so the estimate replays bit-exactly in the
    oracle. The cumulative window runs per group (un-partitioned when
    no groups), which is correct here: the histogram is O(64*QH_SUB)
    rows per group no matter the input size.

    Overflow bound: (ub-lb)*(r-prev) <= (2^(k-1)/QH_SUB)*n must stay
    under 2^63 — holds for any n up to QH_SUB*2^(63-k_max), e.g. 2^44
    rows of full-range 2^50 values.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    ).orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    if group_cols:
        nn = hist.groupBy(*group_cols).agg(
            F.sum("cnt").cast("bigint").alias("n")
        )
    else:
        nn = hist.agg(F.sum("cnt").cast("bigint").alias("n"))
    qs = hist.sparkSession.createDataFrame(
        [(int(q),) for q in q_pcts], "q_pct BIGINT"
    )
    tgt = nn.crossJoin(F.broadcast(qs)).withColumn(
        "r", F.expr("(q_pct * (n - 1)) div 100 + 1")
    )
    t, c = tgt.alias("t"), cum.alias("c")
    cond = (F.col("c.cum") >= F.col("t.r")) & (
        F.col("c.cum") - F.col("c.cnt") < F.col("t.r")
    )
    for g in group_cols:
        cond = cond & (F.col(f"t.{g}") == F.col(f"c.{g}"))
    hit = t.join(F.broadcast(c), cond)
    lb, ub = qh_bounds_sql("c.bucket")
    return hit.select(
        *[F.col(f"t.{g}") for g in group_cols],
        "t.q_pct",
        "t.n",
        F.expr(
            f"CAST({lb} + (({ub} - {lb}) * (t.r - (c.cum - c.cnt)))"
            f" div c.cnt AS BIGINT)"
        ).alias("qh_est"),
    )


# ---------------------------------------------------------------------------
# KMV bottom-k sketch (k minimum values; Bar-Yossef et al. '02)

KMV_K = 256
_KMV_HEX = 12  # 48-bit estimator prefix: exact in BIGINT on both engines


def kmv_bottomk(df: DataFrame, key_col: str, k: int = KMV_K) -> DataFrame:
    """The k lexicographically-smallest md5 hashes of distinct keys —
    a mergeable uniform SAMPLE of the key domain (hex order == numeric
    order). Mergeable by construction: bottom-k of the union of any
    shards' bottom-k sets equals the global bottom-k, so 100 TB of
    shards each ship k hashes. Spark compiles orderBy+limit to
    TakeOrderedAndProject (per-partition heap + driver merge of k·p
    rows, no global sort shuffle)."""
    hx = F.md5(F.col(key_col).cast("string"))
    return df.select(hx.alias("hx")).distinct().orderBy("hx").limit(k)


def kmv_estimate(bottomk: DataFrame, k: int = KMV_K) -> DataFrame:
    """Distinct-count estimate from the bottom-k sample alone:
    (n_sample, kth_hash, kmv_est). est = (k-1) * 2^48 div h48 where h48
    is the 48-bit prefix of the k-th minimum — pure BIGINT arithmetic
    ((k-1)·2^48 < 2^63 for k ≤ 32767), replayed bit-exactly by the
    oracle. When fewer than k distinct keys exist the sample IS the
    domain and the estimate is the exact sample size."""
    two48 = 1 << (4 * _KMV_HEX)
    agg = bottomk.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sample"),
        F.max("hx").alias("kth_hash"),
    )
    return agg.select(
        "n_sample",
        "kth_hash",
        F.expr(
            f"CASE WHEN n_sample < {k} THEN n_sample"
            f" ELSE CAST({(k - 1) * two48}L div"
            f" CAST(conv(substring(kth_hash, 1, {_KMV_HEX}), 16, 10) AS BIGINT)"
            f" AS BIGINT) END"
        ).cast("bigint").alias("kmv_est"),
    )
