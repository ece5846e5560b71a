"""Aggregation operators (SURVEY §2.5 A1–A5).

Reference parity:
- A1 group-by sum per member state (``data_manipulation/denormalized_tables.py:166-178``).
- A2 multi-key group-by avg with alias (``data_manipulation/serving_layer.py:184-195``)
  — the reference relies on implicit string→double coercion; we always
  cast explicitly (SURVEY §7 risk).
- A3/A4 counts (``curate_data.py:81-88``, ``lakehouse_data_igestion.py:216-219``).
- A5 describe/summary (``data_import.ipynb.py:156-162``).

Scale notes: ``groupBy().agg`` compiles to partial (map-side) + final
aggregation around one shuffle of the grouping key — already optimal.
Skewed keys are handled by AQE skew handling; for pathological
hot keys use a two-phase salted aggregate (``salted_group_agg``).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AGG_FNS = {
    "sum": F.sum,
    "avg": F.avg,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "count_distinct": F.countDistinct,
    "approx_count_distinct": F.approx_count_distinct,
    "stddev": F.stddev,
    "first": F.first,
    "collect_set": F.collect_set,
}


def _agg_cols(aggs: Mapping[str, tuple[str, str]] | Sequence[Column]) -> list[Column]:
    if isinstance(aggs, Mapping):
        return [_AGG_FNS[fn](F.col(f"`{c}`")).alias(alias) for alias, (fn, c) in aggs.items()]
    return list(aggs)


def group_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]] | Sequence[Column],
) -> DataFrame:
    """A1/A2: grouped aggregation. ``aggs`` is either
    ``{alias: (fn_name, column)}`` or a list of ready Column exprs.
    Every output is aliased — required for oracle hash parity."""
    return df.groupBy(*keys).agg(*_agg_cols(aggs))


def salted_group_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregate for skewed keys: aggregate on (keys, salt)
    then re-aggregate on keys. Only valid for algebraic aggregates
    (sum/min/max/count); avg is decomposed into sum+count here."""
    phase1: dict[str, tuple[str, str]] = {}
    phase2_exprs: list[Column] = []
    for alias, (fn, c) in aggs.items():
        if fn in ("sum", "min", "max"):
            phase1[alias] = (fn, c)
            phase2_exprs.append(_AGG_FNS[fn](F.col(alias)).alias(alias))
        elif fn == "count":
            phase1[alias] = ("count", c)
            phase2_exprs.append(F.sum(F.col(alias)).alias(alias))
        elif fn in ("avg", "mean"):
            phase1[f"__{alias}_sum"] = ("sum", c)
            phase1[f"__{alias}_cnt"] = ("count", c)
            phase2_exprs.append(
                (F.sum(f"__{alias}_sum") / F.sum(f"__{alias}_cnt")).alias(alias)
            )
        else:
            raise ValueError(f"{fn} is not salt-decomposable")
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*list(keys), "__salt").agg(*_agg_cols(phase1))
    return partial.groupBy(*keys).agg(*phase2_exprs)


def table_stats(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """A5: per-column summary statistics."""
    return df.select(*columns).summary() if columns else df.summary()


def breakpoint_ntile(
    df: DataFrame,
    value_col: str,
    n: int = 5,
    ascending: bool = True,
    bucket_col: str = "bucket",
    accuracy: int = 10_000,
) -> DataFrame:
    """Scale path for ``ntile(n) OVER (ORDER BY value)`` — percentile
    breakpoints plus a broadcast range assignment, instead of the
    un-partitioned window's single-partition global sort (fine to a few
    million rows, a straight scale-killer at 10⁸; this is the swap the
    ``orders_rfm_segments`` entry documents and pins).

    Mechanics: ntile's bucket-b upper boundary sits at global rank
    ``b·(N div n) + min(b, N mod n)`` (remainder rows go to the leading
    buckets). We query those exact ranks as quantile fractions through
    ``percentile_approx`` — one pass, mergeable sketch, O(accuracy)
    state — then assign ``bucket = 1 + #(breakpoints < value)`` as a
    chained CASE over n−1 literals (no join, no sort, no shuffle beyond
    the sketch's partial-aggregate exchange). Descending orders negate
    the value internally (exact for the BIGINT metrics this is meant
    for).

    Agreement contract (pinned by pytest): on values DISTINCT at the
    boundaries the buckets equal ntile's exactly whenever the sketch
    stores the sample exactly (N ≤ ``accuracy``; beyond that boundary
    placement is within the sketch's rank error ``N/accuracy``). Rows
    TIED on a boundary value all land in the lower bucket, where ntile
    would split the tie by its incidental order — at scale the
    value-deterministic behavior is the defensible one (ntile's split
    depends on sort-tie order unless a tiebreaker column is added).

    NULL values: boundaries are computed over NON-NULL rows only (both
    the count and the sketch ignore NULLs, consistently), and NULL rows
    are assigned bucket 1 ascending / bucket n descending — where
    Spark's default null ordering (ASC NULLS FIRST / DESC NULLS LAST)
    sorts them. This diverges from ntile when NULLs are numerous enough
    to consume whole buckets (they don't take capacity here) — the
    exact-agreement contract above is for NULL-free data; filter or
    impute first when that matters.

    Magnitude contract: ``percentile_approx``'s sketch stores doubles,
    so integer values must be exactly double-representable
    (|v| < 2⁵³) for the boundary to be exact — true of every metric
    this is meant for (days, counts, price cents); full-range 64-bit
    hashes would lose mantissa bits at the boundary.
    """
    if n < 1:
        raise ValueError(f"breakpoint_ntile: n must be >= 1, got {n}")
    null_bucket = 1 if ascending else n
    v = F.col(value_col) if ascending else -F.col(value_col)
    work = df.withColumn("__bp_v", v)
    # non-null count: the sketch ignores NULLs, so ranking fractions
    # must too — counting NULL rows here skewed every boundary rank low
    count = work.where(F.col("__bp_v").isNotNull()).count()
    if count == 0 or n == 1:
        return df.withColumn(
            bucket_col,
            F.when(F.col(value_col).isNull(), F.lit(null_bucket))
            .otherwise(F.lit(1))
            .cast("int"),
        )
    base, rem = divmod(count, n)
    ranks = [b * base + min(b, rem) for b in range(1, n)]
    # a rank of 0 (more buckets than rows) has no boundary value;
    # ntile leaves the trailing buckets empty — mirror by dropping it.
    # The sketch targets rank ceil(q·N): query q = (r − ½)/N so the
    # ceiling lands on r robustly — q = r/N re-multiplied in doubles
    # can come out a hair under r and select rank r−1 (caught by the
    # agreement pytest at N=1003).
    fracs = [(r - 0.5) / count for r in ranks if r > 0]
    bps = work.agg(
        F.percentile_approx("__bp_v", fracs, F.lit(accuracy)).alias("b")
    ).first()["b"]
    expr = F.lit(len(bps) + 1)
    for i in range(len(bps) - 1, -1, -1):
        expr = F.when(F.col("__bp_v") <= F.lit(bps[i]), F.lit(i + 1)).otherwise(
            expr
        )
    # NULLs fail every <= WHEN and would silently fall through to the
    # top bucket — route them to ntile's null end explicitly
    expr = F.when(F.col("__bp_v").isNull(), F.lit(null_bucket)).otherwise(expr)
    return work.withColumn(bucket_col, expr.cast("int")).drop("__bp_v")
