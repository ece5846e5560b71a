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
