"""Sketch catalog entries: HyperLogLog distinct counts and Count-Min
frequency estimates, both hash-matched — the md5-based sketches in
`llm/sketches.py` are bit-reproducible, so the DuckDB oracle replays the
SKETCH ITSELF (buckets, registers, counters), not just the final number.

Determinism doctrine (registry docstring): all sketch state is integer
(register max, counter sums, BIGINT 2^(25-reg) sums), so no
float-accumulation-order hazard exists anywhere before the single
final division; ln() appears once, on already-deterministic inputs,
and the result rounds to 4 dp on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_spark_spark.llm import sketches, text
from data_pipeline_with_spark_spark.plans.registry import QuerySpec, register
from data_pipeline_with_spark_spark.util import exploded
from data_pipeline_with_spark_spark.sources.readers import read_testdata

_TOKS_SQL = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"


# ---------------------------------------------------------------------------
# HyperLogLog: distinct users per event type, estimate vs exact.

def _hll_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_testdata(spark, sf, "events")
    regs = sketches.hll_registers(ev, "user_id", ["event_type"])
    est = sketches.hll_estimate(regs, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type",
        "n_exact",
        "hll_est",
        F.round(
            F.abs(F.col("hll_est") - F.col("n_exact")) / F.col("n_exact"), 4
        ).alias("rel_err"),
    )


def _hll_oracle() -> str:
    rho = sketches._rho_expr("substring(hx, 3, 6)")
    num = repr(sketches.HLL_NUMERATOR)
    two_p25 = 1 << sketches.HLL_RHO_MAX
    m = sketches.HLL_M
    raw = (
        f"{num} / CAST(sum_present + ({m} - n_present) * {two_p25} AS DOUBLE)"
    )
    return f"""
    WITH h AS (
      SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx FROM events
    ), r AS (
      SELECT event_type, substring(hx, 1, 2) AS bucket, {rho} AS rho FROM h
    ), reg AS (
      SELECT event_type, bucket, max(rho) AS reg
      FROM r GROUP BY event_type, bucket
    ), agg AS (
      SELECT event_type, count(*) AS n_present,
             sum(CAST(pow(2.0, {sketches.HLL_RHO_MAX} - reg) AS BIGINT)) AS sum_present
      FROM reg GROUP BY event_type
    ), ex AS (
      SELECT event_type, count(DISTINCT user_id) AS n_exact
      FROM events GROUP BY event_type
    ), est AS (
      SELECT agg.event_type,
             round(CASE WHEN {raw} <= {2.5 * m} AND {m} - n_present > 0
                        THEN {float(m)} * ln({float(m)} / CAST({m} - n_present AS DOUBLE))
                        ELSE {raw} END, 4) AS hll_est
      FROM agg
    )
    SELECT ex.event_type, CAST(ex.n_exact AS BIGINT) AS n_exact, est.hll_est,
           round(abs(est.hll_est - ex.n_exact) / ex.n_exact, 4) AS rel_err
    FROM ex JOIN est ON ex.event_type = est.event_type
    """


register(
    QuerySpec(
        name="sketch_hll_distinct_users",
        build=_hll_distinct_users,
        doc=(
            "HyperLogLog (p=8) distinct users per event type vs exact — "
            "register table replayed bit-exactly by the oracle"
        ),
        oracle=_hll_oracle(),
        tags=("sketch",),
    )
)


# ---------------------------------------------------------------------------
# Count-Min: frequency estimates for the 20 most common tokens.

def _cms_token_counts(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_testdata(spark, sf, "documents")
    cnt = (
        exploded(docs, [], text.tokens("text"), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    sketch = sketches.cms_sketch(cnt, count_col="exact_cnt")
    probes = cnt.orderBy(F.desc("exact_cnt"), F.asc("token")).limit(20)
    est = sketches.cms_lookup(sketch, probes.select("token"))
    return probes.join(est, "token").select(
        "token",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
    )


_CMS_ORACLE = f"""
WITH tok AS (
  SELECT unnest({_TOKS_SQL}) AS token FROM documents
), cnt AS (
  SELECT token, count(*) AS exact_cnt FROM tok GROUP BY token
), rows_ AS (
  SELECT unnest([0, 1, 2, 3]) AS i
), sk AS (
  SELECT i, substring(md5(CAST(i AS VARCHAR) || ':' || token), 1, 3) AS key,
         sum(exact_cnt) AS c
  FROM cnt CROSS JOIN rows_ GROUP BY i, key
), probe AS (
  SELECT token, exact_cnt FROM cnt ORDER BY exact_cnt DESC, token LIMIT 20
), est AS (
  SELECT p.token, min(sk.c) AS cms_est
  FROM probe p JOIN sk
    ON sk.key = substring(md5(CAST(sk.i AS VARCHAR) || ':' || p.token), 1, 3)
  GROUP BY p.token
)
SELECT p.token, CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
       CAST(e.cms_est AS BIGINT) AS cms_est,
       CAST(e.cms_est - p.exact_cnt AS BIGINT) AS overcount
FROM probe p JOIN est e ON p.token = e.token
"""


register(
    QuerySpec(
        name="sketch_cms_token_counts",
        build=_cms_token_counts,
        doc=(
            "Count-Min (d=4, w=4096) token-frequency estimates for the top-20 "
            "tokens — counters replayed bit-exactly; overcount >= 0 by "
            "construction"
        ),
        oracle=_CMS_ORACLE,
        tags=("sketch",),
    )
)


# ---------------------------------------------------------------------------
# Sketch ALGEBRA faces: the point of mergeable summaries is computing on
# the SKETCHES, never rescanning the data.

def _hll_union_types(spark: SparkSession, sf: str) -> DataFrame:
    """Union via register max: per-type register tables merge to the
    global registers WITHOUT touching the events table again — the
    distributed-set-union idiom (per-shard sketches -> tiny merge). By
    the max-merge identity the result equals a direct global HLL, which
    is exactly what the oracle computes."""
    ev = read_testdata(spark, sf, "events")
    per_type = sketches.hll_registers(ev, "user_id", ["event_type"])
    merged = sketches.hll_merge(
        per_type.withColumn("g", F.lit(1)), ["g"]
    )
    est = sketches.hll_estimate(merged, ["g"])
    exact = ev.agg(
        F.countDistinct("user_id").alias("n_exact_total"), F.lit(1).alias("g")
    )
    return exact.join(est, "g").select(
        "n_exact_total",
        F.col("hll_est").alias("hll_union_est"),
        F.round(
            F.abs(F.col("hll_est") - F.col("n_exact_total"))
            / F.col("n_exact_total"),
            4,
        ).alias("rel_err"),
    )


def _hll_union_oracle() -> str:
    rho = sketches._rho_expr("substring(hx, 3, 6)")
    num = repr(sketches.HLL_NUMERATOR)
    m, two_p25 = sketches.HLL_M, 1 << sketches.HLL_RHO_MAX
    raw = f"{num} / CAST(sum_present + ({m} - n_present) * {two_p25} AS DOUBLE)"
    return f"""
    WITH h AS (SELECT md5(CAST(user_id AS VARCHAR)) AS hx FROM events),
    r AS (SELECT substring(hx, 1, 2) AS bucket, {rho} AS rho FROM h),
    reg AS (SELECT bucket, max(rho) AS reg FROM r GROUP BY bucket),
    agg AS (
      SELECT count(*) AS n_present,
             sum(CAST(pow(2.0, {sketches.HLL_RHO_MAX} - reg) AS BIGINT)) AS sum_present
      FROM reg
    ),
    est AS (
      SELECT round(CASE WHEN {raw} <= {2.5 * m} AND {m} - n_present > 0
                        THEN {float(m)} * ln({float(m)} / CAST({m} - n_present AS DOUBLE))
                        ELSE {raw} END, 4) AS hll_union_est
      FROM agg
    ),
    ex AS (SELECT count(DISTINCT user_id) AS n_exact_total FROM events)
    SELECT CAST(ex.n_exact_total AS BIGINT) AS n_exact_total,
           est.hll_union_est,
           round(abs(est.hll_union_est - ex.n_exact_total) / ex.n_exact_total, 4)
             AS rel_err
    FROM ex CROSS JOIN est
    """


register(
    QuerySpec(
        name="sketch_hll_union_types",
        build=_hll_union_types,
        doc="HLL set-union algebra: per-type registers merged by max == "
        "global registers (no rescan); oracle computes the direct global HLL",
        oracle=_hll_union_oracle(),
        tags=("sketch",),
    )
)


def _cms_join_cardinality(spark: SparkSession, sf: str) -> DataFrame:
    """Join-size estimation from sketches alone (AMS/CMS inner product,
    Cormode & Muthukrishnan '05 §4.2): |A JOIN B on k| = sum_k
    cntA(k)*cntB(k), estimated per CMS row as the bucket-wise product
    sum, taking min over the d rows — overestimate-only. The planner
    use-case at 100 TB: both sketches are O(d*w), so join cardinality
    comes from two tiny tables instead of executing the join."""
    orders = read_testdata(spark, sf, "orders")
    lineitem = read_testdata(spark, sf, "lineitem")
    ca = sketches.cms_sketch(
        orders.groupBy(F.col("o_orderkey").cast("string").alias("token"))
        .agg(F.count(F.lit(1)).alias("cnt")),
    )
    cb = sketches.cms_sketch(
        lineitem.groupBy(F.col("l_orderkey").cast("string").alias("token"))
        .agg(F.count(F.lit(1)).alias("cnt")),
    )
    per_row = (
        ca.alias("a")
        .join(cb.alias("b"), ["row", "key"])
        .groupBy("row")
        .agg(F.sum(F.col("a.c") * F.col("b.c")).alias("est"))
    )
    est = per_row.agg(F.min("est").alias("cms_join_est"))
    exact = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .agg(F.count(F.lit(1)).alias("exact_join_rows"))
    )
    return exact.crossJoin(est).select(
        "exact_join_rows",
        F.col("cms_join_est").cast("bigint").alias("cms_join_est"),
        (F.col("cms_join_est") - F.col("exact_join_rows"))
        .cast("bigint")
        .alias("overcount"),
    )


_CMS_JOIN_ORACLE = """
WITH ca AS (
  SELECT i, substring(md5(CAST(i AS VARCHAR) || ':' || CAST(o_orderkey AS VARCHAR)), 1, 3) AS key,
         count(*) AS c
  FROM orders CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)
  GROUP BY i, key
), cb AS (
  SELECT i, substring(md5(CAST(i AS VARCHAR) || ':' || CAST(l_orderkey AS VARCHAR)), 1, 3) AS key,
         count(*) AS c
  FROM lineitem CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)
  GROUP BY i, key
), per_row AS (
  SELECT ca.i, sum(ca.c * cb.c) AS est
  FROM ca JOIN cb ON ca.i = cb.i AND ca.key = cb.key
  GROUP BY ca.i
), est AS (SELECT min(est) AS cms_join_est FROM per_row),
ex AS (
  SELECT count(*) AS exact_join_rows
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
)
SELECT CAST(ex.exact_join_rows AS BIGINT) AS exact_join_rows,
       CAST(est.cms_join_est AS BIGINT) AS cms_join_est,
       CAST(est.cms_join_est - ex.exact_join_rows AS BIGINT) AS overcount
FROM ex CROSS JOIN est
"""


register(
    QuerySpec(
        name="sketch_cms_join_cardinality",
        build=_cms_join_cardinality,
        doc="join-size estimation from CMS sketches alone (bucket-wise "
        "inner product, min over rows; overcount >= 0) vs the exact join "
        "count — the planner-side use of mergeable counters",
        oracle=_CMS_JOIN_ORACLE,
        tags=("sketch",),
    )
)


def _hll_intersection(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct-count INTERSECTION via inclusion-exclusion over three
    HLL estimates (|A∩B| ≈ est(A) + est(B) - est(A∪B)) — computed from
    registers alone. The classic sketch-algebra answer to "how many
    users did both X and Y" without a distinct-pair scan; error grows
    when the true intersection is small relative to the union (reported
    alongside the exact number so the entry shows the trade honestly).
    All three inputs are the deterministic rounded HLL estimates, so the
    subtraction is bit-exact cross-engine.

    The deterministic pair (two lexicographically-first event types) is
    computed IN the plan — a rank-limited distinct broadcast-joined back
    to the scan — so building this entry stays lazy like every other
    catalog build (no driver-side collect, no eager scan); a degenerate
    fixture with fewer than two event types yields an empty result frame
    rather than an IndexError."""
    from pyspark.sql import Window

    ev = read_testdata(spark, sf, "events")
    tt = (
        ev.select("event_type")
        .distinct()
        .withColumn(
            "rn", F.row_number().over(Window.orderBy("event_type"))
        )
        .where(F.col("rn") <= 2)
    )
    ta_f = tt.where(F.col("rn") == 1).select(F.col("event_type").alias("type_a"))
    tb_f = tt.where(F.col("rn") == 2).select(F.col("event_type").alias("type_b"))
    a = ev.join(F.broadcast(ta_f), ev["event_type"] == ta_f["type_a"])
    b = ev.join(F.broadcast(tb_f), ev["event_type"] == tb_f["type_b"])
    u = ev.join(F.broadcast(tt.select("event_type")), "event_type")

    def est_of(df, gname):
        regs = sketches.hll_registers(df.withColumn("g", F.lit(1)), "user_id", ["g"])
        return sketches.hll_estimate(regs, ["g"]).select(
            F.col("hll_est").alias(gname), F.lit(1).alias("j")
        )

    exact = (
        a.select("user_id").intersect(b.select("user_id"))
        .agg(F.count(F.lit(1)).alias("n_exact_overlap"))
        .withColumn("j", F.lit(1))
    )
    out = (
        est_of(a, "est_a")
        .join(est_of(b, "est_b"), "j")
        .join(est_of(u, "est_union"), "j")
        .join(exact, "j")
        .crossJoin(F.broadcast(ta_f))
        .crossJoin(F.broadcast(tb_f))
    )
    return out.select(
        "type_a",
        "type_b",
        "n_exact_overlap",
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 4).alias(
            "hll_overlap_est"
        ),
    )


def _hll_intersection_oracle() -> str:
    rho = sketches._rho_expr("substring(hx, 3, 6)")
    num = repr(sketches.HLL_NUMERATOR)
    m, two_p25 = sketches.HLL_M, 1 << sketches.HLL_RHO_MAX
    raw = f"{num} / CAST(sum_present + ({m} - n_present) * {two_p25} AS DOUBLE)"

    def est_cte(tag: str, where: str) -> str:
        return f"""
    h_{tag} AS (SELECT md5(CAST(user_id AS VARCHAR)) AS hx FROM events WHERE {where}),
    r_{tag} AS (SELECT substring(hx, 1, 2) AS bucket, {rho} AS rho FROM h_{tag}),
    reg_{tag} AS (SELECT bucket, max(rho) AS reg FROM r_{tag} GROUP BY bucket),
    agg_{tag} AS (
      SELECT count(*) AS n_present,
             sum(CAST(pow(2.0, {sketches.HLL_RHO_MAX} - reg) AS BIGINT)) AS sum_present
      FROM reg_{tag}
    ),
    est_{tag} AS (
      SELECT round(CASE WHEN {raw} <= {2.5 * m} AND {m} - n_present > 0
                        THEN {float(m)} * ln({float(m)} / CAST({m} - n_present AS DOUBLE))
                        ELSE {raw} END, 4) AS e
      FROM agg_{tag}
    )"""

    return f"""
    WITH tt AS MATERIALIZED (
      SELECT event_type, row_number() OVER (ORDER BY event_type) AS rn
      FROM (SELECT DISTINCT event_type FROM events)
      QUALIFY rn <= 2
    ),
    ta AS (SELECT event_type AS t FROM tt WHERE rn = 1),
    tb AS (SELECT event_type AS t FROM tt WHERE rn = 2),
    {est_cte("a", "event_type = (SELECT t FROM ta)")},
    {est_cte("b", "event_type = (SELECT t FROM tb)")},
    {est_cte("u", "event_type IN (SELECT t FROM ta UNION ALL SELECT t FROM tb)")},
    ex AS (
      SELECT count(*) AS n_exact_overlap FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = (SELECT t FROM ta)
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = (SELECT t FROM tb)
      )
    )
    SELECT (SELECT t FROM ta) AS type_a,
           (SELECT t FROM tb) AS type_b,
           CAST(ex.n_exact_overlap AS BIGINT) AS n_exact_overlap,
           round(est_a.e + est_b.e - est_u.e, 4) AS hll_overlap_est
    FROM ex CROSS JOIN est_a CROSS JOIN est_b CROSS JOIN est_u
    """


register(
    QuerySpec(
        name="sketch_hll_intersection",
        build=_hll_intersection,
        doc="distinct-user overlap between two event types via HLL "
        "inclusion-exclusion (est_a + est_b - est_union, registers only) "
        "vs the exact intersect",
        oracle=_hll_intersection_oracle(),
        tags=("sketch",),
    )
)


# ---------------------------------------------------------------------------
# Quantile histogram: percentile estimates from mergeable integer
# counters — the third leg next to HLL (distinct) and CMS (frequency).
# A10's exact percentiles need the values; this histogram ships O(1)
# counters per shard and answers any quantile after the fact.

_QH_CENTS = "greatest(CAST(round(l_extendedprice * 100) AS BIGINT), CAST(1 AS BIGINT))"


def _quantile_prices(spark: SparkSession, sf: str) -> DataFrame:
    """p50/p90/p99 of lineitem extended price (integer cents) from the
    HdrHistogram-style sketch vs the exact rank-selected value. The
    exact face is the comparator only — rank selection sorts globally,
    which is the thing the sketch exists to avoid at 100 TB; the sketch
    path is one scan + an O(64*QH_SUB) counter table."""
    from pyspark.sql import Window

    li = read_testdata(spark, sf, "lineitem")
    pts = li.select(F.expr(_QH_CENTS).alias("v"))
    hist = sketches.quantile_hist(pts)
    ests = sketches.quantile_estimate(hist).withColumn(
        "r", F.expr("(q_pct * (n - 1)) div 100 + 1")
    )
    ranked = pts.withColumn("rn", F.row_number().over(Window.orderBy("v")))
    return (
        ranked.join(F.broadcast(ests), F.col("rn") == F.col("r"))
        .select(
            "q_pct",
            "n",
            "qh_est",
            F.col("v").alias("exact_cents"),
            F.round(
                F.abs(F.col("qh_est").cast("double") - F.col("v")) / F.col("v"), 4
            ).alias("rel_err"),
        )
    )


def _qh_oracle(source_sql: str) -> str:
    """DuckDB replay of the WHOLE quantile-sketch path over `source_sql`
    (a SELECT yielding one BIGINT column v): histogram counters,
    cumulative-rank walk, integer interpolation, and the exact
    rank-select comparator — bit-exact because every sketch step is
    BIGINT arithmetic."""
    bucket = sketches.qh_bucket_sql("v", div="//", shift="duck")
    lb, ub = sketches.qh_bounds_sql("bucket", div="//", shift="duck")
    return f"""
    WITH pts AS MATERIALIZED ({source_sql}),
    hist AS MATERIALIZED (
      SELECT {bucket} AS bucket, count(*) AS cnt FROM pts GROUP BY 1
    ),
    cum AS (
      SELECT bucket, cnt, sum(cnt) OVER (ORDER BY bucket) AS cum FROM hist
    ),
    nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM hist),
    qs AS (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS q_pct),
    tgt AS (
      SELECT q_pct, n, (q_pct * (n - 1)) // 100 + 1 AS r FROM qs CROSS JOIN nn
    ),
    hit AS (
      SELECT t.q_pct, t.n, t.r, c.bucket, c.cnt, c.cum
      FROM tgt t JOIN cum c ON c.cum >= t.r AND c.cum - c.cnt < t.r
    ),
    est AS (
      SELECT q_pct, n, r,
             CAST({lb} + (({ub} - {lb}) * (r - (cum - cnt))) // cnt AS BIGINT)
               AS qh_est
      FROM hit
    ),
    ranked AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM pts)
    SELECT e.q_pct, e.n, e.qh_est,
           CAST(rk.v AS BIGINT) AS exact_cents,
           round(abs(CAST(e.qh_est AS DOUBLE) - rk.v) / rk.v, 4) AS rel_err
    FROM est e JOIN ranked rk ON rk.rn = e.r
    """


register(
    QuerySpec(
        name="sketch_quantile_prices",
        build=_quantile_prices,
        doc="p50/p90/p99 of lineitem price-cents from the mergeable "
        "HdrHistogram-style integer quantile sketch vs exact rank-select "
        "— counters, rank walk, and interpolation all replayed bit-exactly",
        oracle=_qh_oracle(f"SELECT {_QH_CENTS} AS v FROM lineitem"),
        tags=("sketch",),
    )
)


def _quantile_merge_sources(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch ALGEBRA face for the quantile histogram (the union leg
    next to `sketch_hll_union_types`): per-source histograms over the
    documents table merge by plain counter + into the global histogram,
    and the global p50/p90/p99 of document length are answered from the
    MERGED sketch without rescanning any text — the shard-then-merge
    shape a 100 TB corpus actually uses (each shard ships ≤ 64·QH_SUB
    counters). The oracle computes the histogram directly from the
    corpus; equality IS the merge identity."""
    from pyspark.sql import Window

    docs = read_testdata(spark, sf, "documents")
    pts = docs.select(
        "source",
        F.expr(
            "greatest(CAST(length(text) AS BIGINT), CAST(1 AS BIGINT))"
        ).alias("v"),
    )
    # per-source sub-histograms (the "shards")...
    per_source = (
        pts.select("source", F.expr(sketches.qh_bucket_sql("v")).alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # ...merged by + into the global sketch: no rescan of the text.
    merged = per_source.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
    ests = sketches.quantile_estimate(merged).withColumn(
        "r", F.expr("(q_pct * (n - 1)) div 100 + 1")
    )
    ranked = pts.withColumn("rn", F.row_number().over(Window.orderBy("v")))
    return (
        ranked.join(F.broadcast(ests), F.col("rn") == F.col("r"))
        .select(
            "q_pct",
            "n",
            "qh_est",
            F.col("v").alias("exact_len"),
            F.round(
                F.abs(F.col("qh_est").cast("double") - F.col("v")) / F.col("v"), 4
            ).alias("rel_err"),
        )
    )


register(
    QuerySpec(
        name="sketch_quantile_merge_sources",
        build=_quantile_merge_sources,
        doc="global p50/p90/p99 of document length from per-source "
        "histograms merged by counter + (no rescan) — the quantile "
        "union face; oracle computes the histogram directly, equality "
        "IS the merge identity",
        oracle=_qh_oracle(
            "SELECT greatest(CAST(length(text) AS BIGINT),"
            " CAST(1 AS BIGINT)) AS v FROM documents"
        ).replace("AS exact_cents", "AS exact_len"),
        tags=("sketch",),
    )
)


# ---------------------------------------------------------------------------
# KMV bottom-k: distinct-count from a mergeable uniform hash sample.

def _kmv_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    """KMV distinct users via SHARD MERGE: each event type ships its own
    bottom-k sample; the global bottom-k of the union of the shards
    equals the direct global bottom-k (the KMV merge identity), and the
    estimator runs on the merged sample alone. The oracle computes the
    direct global bottom-k — equality IS the merge identity, same
    doctrine as `sketch_hll_union_types`/`sketch_quantile_merge_sources`."""
    from pyspark.sql import Window

    ev = read_testdata(spark, sf, "events")
    hx = F.md5(F.col("user_id").cast("string"))
    per_type = (
        ev.select("event_type", hx.alias("hx"))
        .distinct()
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("hx")
            ),
        )
        .where(F.col("rn") <= sketches.KMV_K)
    )
    merged = (
        per_type.select("hx").distinct().orderBy("hx").limit(sketches.KMV_K)
    )
    est = sketches.kmv_estimate(merged).withColumn("j", F.lit(1))
    exact = ev.agg(
        F.countDistinct("user_id").alias("n_exact"), F.lit(1).alias("j")
    )
    return est.join(exact, "j").select(
        "n_sample",
        "kth_hash",
        "kmv_est",
        "n_exact",
        F.round(
            F.abs(F.col("kmv_est").cast("double") - F.col("n_exact"))
            / F.col("n_exact"),
            4,
        ).alias("rel_err"),
    )


def _kmv_oracle() -> str:
    k, hexn = sketches.KMV_K, sketches._KMV_HEX
    two = 1 << (4 * hexn)
    return f"""
    WITH h AS (SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS hx FROM events),
    bk AS (SELECT hx FROM h ORDER BY hx LIMIT {k}),
    agg AS (SELECT CAST(count(*) AS BIGINT) AS n_sample, max(hx) AS kth_hash FROM bk),
    est AS (
      SELECT n_sample, kth_hash,
             CAST(CASE WHEN n_sample < {k} THEN n_sample
                  ELSE {(k - 1) * two} //
                       CAST(('0x' || substring(kth_hash, 1, {hexn})) AS BIGINT)
                  END AS BIGINT) AS kmv_est
      FROM agg
    ),
    ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact FROM events)
    SELECT e.n_sample, e.kth_hash, e.kmv_est, x.n_exact,
           round(abs(CAST(e.kmv_est AS DOUBLE) - x.n_exact) / x.n_exact, 4)
             AS rel_err
    FROM est e CROSS JOIN ex x
    """


register(
    QuerySpec(
        name="sketch_kmv_distinct_users",
        build=_kmv_distinct_users,
        doc="KMV bottom-k (k=256) distinct-user estimate from per-type "
        "shard samples merged to the global bottom-k (merge identity = "
        "oracle equality); estimator (k-1)*2^48 div h48 is pure BIGINT",
        oracle=_kmv_oracle(),
        tags=("sketch",),
    )
)


def _quantile_by_type(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event-type p50/p90/p99 of `value` cents from ONE grouped
    histogram pass (the `hll_registers` group-cols shape applied to
    quantiles): 5 types × 64·QH_SUB max counters, any per-type quantile
    answerable after the fact; exact per-type rank-select is the
    comparator face."""
    from pyspark.sql import Window

    ev = read_testdata(spark, sf, "events")
    cents = "greatest(CAST(round(value * 100) AS BIGINT), CAST(1 AS BIGINT))"
    pts = ev.select("event_type", F.expr(cents).alias("v"))
    hist = sketches.quantile_hist(pts, group_cols=("event_type",))
    ests = sketches.quantile_estimate(
        hist, group_cols=("event_type",)
    ).withColumn("r", F.expr("(q_pct * (n - 1)) div 100 + 1"))
    ranked = pts.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("event_type").orderBy("v")),
    )
    return (
        ranked.join(
            F.broadcast(ests.withColumnRenamed("event_type", "et")),
            (F.col("event_type") == F.col("et")) & (F.col("rn") == F.col("r")),
        )
        .select(
            "event_type",
            "q_pct",
            "n",
            "qh_est",
            F.col("v").alias("exact_cents"),
            F.round(
                F.abs(F.col("qh_est").cast("double") - F.col("v")) / F.col("v"), 4
            ).alias("rel_err"),
        )
    )


def _qh_grouped_oracle() -> str:
    bucket = sketches.qh_bucket_sql("v", div="//", shift="duck")
    lb, ub = sketches.qh_bounds_sql("bucket", div="//", shift="duck")
    return f"""
    WITH pts AS MATERIALIZED (
      SELECT event_type,
             greatest(CAST(round(value * 100) AS BIGINT), CAST(1 AS BIGINT)) AS v
      FROM events
    ),
    hist AS MATERIALIZED (
      SELECT event_type, {bucket} AS bucket, count(*) AS cnt
      FROM pts GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, bucket, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum
      FROM hist
    ),
    nn AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM hist GROUP BY 1),
    qs AS (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS q_pct),
    tgt AS (
      SELECT event_type, q_pct, n, (q_pct * (n - 1)) // 100 + 1 AS r
      FROM nn CROSS JOIN qs
    ),
    hit AS (
      SELECT t.event_type, t.q_pct, t.n, t.r, c.bucket, c.cnt, c.cum
      FROM tgt t JOIN cum c ON c.event_type = t.event_type
       AND c.cum >= t.r AND c.cum - c.cnt < t.r
    ),
    est AS (
      SELECT event_type, q_pct, n, r,
             CAST({lb} + (({ub} - {lb}) * (r - (cum - cnt))) // cnt AS BIGINT)
               AS qh_est
      FROM hit
    ),
    ranked AS (
      SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn
      FROM pts
    )
    SELECT e.event_type, e.q_pct, e.n, e.qh_est,
           CAST(rk.v AS BIGINT) AS exact_cents,
           round(abs(CAST(e.qh_est AS DOUBLE) - rk.v) / rk.v, 4) AS rel_err
    FROM est e JOIN ranked rk
      ON rk.event_type = e.event_type AND rk.rn = e.r
    """


register(
    QuerySpec(
        name="sketch_quantile_by_type",
        build=_quantile_by_type,
        doc="per-event-type p50/p90/p99 of value cents from one grouped "
        "histogram pass (group-cols quantile sketch) vs exact per-type "
        "rank-select — grouped counters and interpolation replayed "
        "bit-exactly",
        oracle=_qh_grouped_oracle(),
        tags=("sketch",),
    )
)


def _kmv_overlap_types(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct-user OVERLAP between two event types from bottom-k
    samples alone — the theta-sketch intersection idiom (Dasgupta et
    al.): take the global bottom-k of the UNION's hashes, count how
    many of those k sampled users appear in BOTH types, and scale:
    overlap ≈ (count_both / k) · est(|A∪B|). Every step is BIGINT
    (count, max-hash, (k-1)·2^48 div h48, one final multiply-div), so
    unlike the HLL inclusion-exclusion face there is NO float anywhere
    — the whole estimate replays bit-exactly. When the union has fewer
    than k users the sample is exhaustive and the estimate IS the exact
    overlap. Type pair computed in-plan (lazy build), same pattern as
    `sketch_hll_intersection`."""
    from pyspark.sql import Window

    k = sketches.KMV_K
    ev = read_testdata(spark, sf, "events")
    tt = (
        ev.select("event_type")
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("event_type")))
        .where(F.col("rn") <= 2)
    )
    ta_f = tt.where(F.col("rn") == 1).select(F.col("event_type").alias("type_a"))
    tb_f = tt.where(F.col("rn") == 2).select(F.col("event_type").alias("type_b"))
    flags = (
        ev.join(F.broadcast(tt), "event_type")
        .select(
            F.md5(F.col("user_id").cast("string")).alias("hx"),
            F.when(F.col("rn") == 1, 1).otherwise(0).alias("a"),
            F.when(F.col("rn") == 2, 1).otherwise(0).alias("b"),
        )
        .groupBy("hx")
        .agg(F.max("a").alias("in_a"), F.max("b").alias("in_b"))
    )
    bk = flags.orderBy("hx").limit(k)
    two48 = 1 << (4 * sketches._KMV_HEX)
    agg = bk.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sample"),
        F.max("hx").alias("kth_hash"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("count_both"),
    )
    est = agg.select(
        "n_sample",
        "count_both",
        F.expr(
            f"CASE WHEN n_sample < {k} THEN n_sample"
            f" ELSE CAST({(k - 1) * two48}L div"
            f" CAST(conv(substring(kth_hash, 1, {sketches._KMV_HEX}), 16, 10)"
            f" AS BIGINT) AS BIGINT) END"
        ).cast("bigint").alias("est_union"),
    ).withColumn(
        "kmv_overlap_est",
        F.expr("CAST((count_both * est_union) div n_sample AS BIGINT)"),
    ).withColumn("j", F.lit(1))
    a_users = ev.join(F.broadcast(ta_f), ev["event_type"] == ta_f["type_a"])
    b_users = ev.join(F.broadcast(tb_f), ev["event_type"] == tb_f["type_b"])
    exact = (
        a_users.select("user_id").intersect(b_users.select("user_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact_overlap"))
        .withColumn("j", F.lit(1))
    )
    return (
        est.join(exact, "j")
        .crossJoin(F.broadcast(ta_f))
        .crossJoin(F.broadcast(tb_f))
        .select(
            "type_a",
            "type_b",
            "n_sample",
            "count_both",
            "est_union",
            "kmv_overlap_est",
            "n_exact_overlap",
        )
    )


def _kmv_overlap_oracle() -> str:
    k, hexn = sketches.KMV_K, sketches._KMV_HEX
    two = 1 << (4 * hexn)
    return f"""
    WITH tt AS MATERIALIZED (
      SELECT event_type, row_number() OVER (ORDER BY event_type) AS rn
      FROM (SELECT DISTINCT event_type FROM events)
      QUALIFY rn <= 2
    ),
    flags AS (
      SELECT md5(CAST(e.user_id AS VARCHAR)) AS hx,
             max(CASE WHEN t.rn = 1 THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN t.rn = 2 THEN 1 ELSE 0 END) AS in_b
      FROM events e JOIN tt t ON e.event_type = t.event_type
      GROUP BY 1
    ),
    bk AS (SELECT * FROM flags ORDER BY hx LIMIT {k}),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_sample, max(hx) AS kth_hash,
             CAST(sum(in_a * in_b) AS BIGINT) AS count_both
      FROM bk
    ),
    est AS (
      SELECT n_sample, count_both,
             CAST(CASE WHEN n_sample < {k} THEN n_sample
                  ELSE {(k - 1) * two} //
                       CAST(('0x' || substring(kth_hash, 1, {hexn})) AS BIGINT)
                  END AS BIGINT) AS est_union
      FROM agg
    ),
    ex AS (
      SELECT CAST(count(*) AS BIGINT) AS n_exact_overlap FROM (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = (SELECT event_type FROM tt WHERE rn = 1)
        INTERSECT
        SELECT DISTINCT user_id FROM events
        WHERE event_type = (SELECT event_type FROM tt WHERE rn = 2)
      )
    )
    SELECT (SELECT event_type FROM tt WHERE rn = 1) AS type_a,
           (SELECT event_type FROM tt WHERE rn = 2) AS type_b,
           e.n_sample, e.count_both, e.est_union,
           CAST((e.count_both * e.est_union) // e.n_sample AS BIGINT)
             AS kmv_overlap_est,
           x.n_exact_overlap
    FROM est e CROSS JOIN ex x
    """


register(
    QuerySpec(
        name="sketch_kmv_overlap_types",
        build=_kmv_overlap_types,
        doc="distinct-user overlap between two event types from the "
        "union's bottom-k sample (theta-sketch intersection: "
        "count_both/k scaled by the union estimate) — 100% BIGINT, no "
        "float anywhere, exhaustive-sample case exact",
        oracle=_kmv_overlap_oracle(),
        tags=("sketch",),
    )
)


_KMV_YEAR_A, _KMV_YEAR_B = 1995, 1996


def _kmv_churn_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Customer-set DIFFERENCE between two order years from the union's
    bottom-k sample alone — the theta-sketch A-not-B idiom completing
    the KMV algebra (union -> `sketch_kmv_distinct_users`, intersection
    -> `sketch_kmv_overlap_types`): churned = ordered in 1995 but not
    1996, acquired = the reverse, each estimated as count_dir/k scaled
    by the union estimate. Pure BIGINT end to end. Both code paths are
    exercised across the fixture SFs: at sf0.001 the union (~146) is
    under k=256 so the sample is exhaustive and the estimates ARE the
    exact counts; at sf0.01 the union (~1.4k) exceeds k and the true
    estimation path fires (diffs ~260 a side)."""
    ord_ = read_testdata(spark, sf, "orders")
    ya, yb = _KMV_YEAR_A, _KMV_YEAR_B
    k = sketches.KMV_K
    yr = F.year("o_orderdate")
    flags = (
        ord_.where(yr.isin(ya, yb))
        .select(
            F.md5(F.col("o_custkey").cast("string")).alias("hx"),
            F.when(yr == ya, 1).otherwise(0).alias("a"),
            F.when(yr == yb, 1).otherwise(0).alias("b"),
        )
        .groupBy("hx")
        .agg(F.max("a").alias("in_a"), F.max("b").alias("in_b"))
    )
    bk = flags.orderBy("hx").limit(k)
    two48 = 1 << (4 * sketches._KMV_HEX)
    agg = bk.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sample"),
        F.max("hx").alias("kth_hash"),
        F.sum(F.col("in_a") * (1 - F.col("in_b")))
        .cast("bigint")
        .alias("count_churned"),
        F.sum(F.col("in_b") * (1 - F.col("in_a")))
        .cast("bigint")
        .alias("count_acquired"),
    )
    est = (
        agg.select(
            "n_sample",
            "count_churned",
            "count_acquired",
            F.expr(
                f"CASE WHEN n_sample < {k} THEN n_sample"
                f" ELSE CAST({(k - 1) * two48}L div"
                f" CAST(conv(substring(kth_hash, 1, {sketches._KMV_HEX}), 16, 10)"
                f" AS BIGINT) AS BIGINT) END"
            ).cast("bigint").alias("est_union"),
        )
        .withColumn(
            "kmv_churned_est",
            F.expr("CAST((count_churned * est_union) div n_sample AS BIGINT)"),
        )
        .withColumn(
            "kmv_acquired_est",
            F.expr("CAST((count_acquired * est_union) div n_sample AS BIGINT)"),
        )
        .withColumn("j", F.lit(1))
    )
    cust_a = ord_.where(yr == ya).select("o_custkey").distinct()
    cust_b = ord_.where(yr == yb).select("o_custkey").distinct()
    ex_ab = (
        cust_a.subtract(cust_b)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact_churned"))
        .withColumn("j", F.lit(1))
    )
    ex_ba = (
        cust_b.subtract(cust_a)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact_acquired"))
        .withColumn("j", F.lit(1))
    )
    return (
        est.join(ex_ab, "j")
        .join(ex_ba, "j")
        .select(
            F.lit(ya).cast("int").alias("year_a"),
            F.lit(yb).cast("int").alias("year_b"),
            "n_sample",
            "count_churned",
            "count_acquired",
            "est_union",
            "kmv_churned_est",
            "kmv_acquired_est",
            "n_exact_churned",
            "n_exact_acquired",
        )
    )


def _kmv_churn_oracle() -> str:
    k, hexn = sketches.KMV_K, sketches._KMV_HEX
    two = 1 << (4 * hexn)
    ya, yb = _KMV_YEAR_A, _KMV_YEAR_B
    return f"""
    WITH flags AS (
      SELECT md5(CAST(o_custkey AS VARCHAR)) AS hx,
             max(CASE WHEN year(o_orderdate) = {ya} THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN year(o_orderdate) = {yb} THEN 1 ELSE 0 END) AS in_b
      FROM orders
      WHERE year(o_orderdate) IN ({ya}, {yb})
      GROUP BY 1
    ),
    bk AS (SELECT * FROM flags ORDER BY hx LIMIT {k}),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_sample, max(hx) AS kth_hash,
             CAST(sum(in_a * (1 - in_b)) AS BIGINT) AS count_churned,
             CAST(sum(in_b * (1 - in_a)) AS BIGINT) AS count_acquired
      FROM bk
    ),
    est AS (
      SELECT n_sample, count_churned, count_acquired,
             CAST(CASE WHEN n_sample < {k} THEN n_sample
                  ELSE {(k - 1) * two} //
                       CAST(('0x' || substring(kth_hash, 1, {hexn})) AS BIGINT)
                  END AS BIGINT) AS est_union
      FROM agg
    ),
    ex_ab AS (
      SELECT CAST(count(*) AS BIGINT) AS n_exact_churned FROM (
        SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = {ya}
        EXCEPT
        SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = {yb}
      )
    ),
    ex_ba AS (
      SELECT CAST(count(*) AS BIGINT) AS n_exact_acquired FROM (
        SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = {yb}
        EXCEPT
        SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = {ya}
      )
    )
    SELECT CAST({ya} AS INT) AS year_a, CAST({yb} AS INT) AS year_b,
           e.n_sample, e.count_churned, e.count_acquired, e.est_union,
           CAST((e.count_churned * e.est_union) // e.n_sample AS BIGINT)
             AS kmv_churned_est,
           CAST((e.count_acquired * e.est_union) // e.n_sample AS BIGINT)
             AS kmv_acquired_est,
           x1.n_exact_churned, x2.n_exact_acquired
    FROM est e CROSS JOIN ex_ab x1 CROSS JOIN ex_ba x2
    """


register(
    QuerySpec(
        name="sketch_kmv_churn_customers",
        build=_kmv_churn_customers,
        doc="customer churn/acquisition between two order years estimated "
        "from the union's bottom-k sample (theta-sketch A-not-B, both "
        "directions) — completes the KMV union/intersection/difference "
        "algebra; 100% BIGINT, exhaustive at sf0.001, true estimation "
        "path at sf0.01",
        oracle=_kmv_churn_oracle(),
        tags=("sketch",),
    )
)
