"""Reshape operators (SURVEY §2.8 R1–R2) — the pipeline's signature op.

Reference parity: the reference melts the wide WDI table (one column per
year 1960–2020) with a Python loop that unions 61 single-year selects
(``data_manipulation/serving_layer.py:100-136``) — 61-way lineage, 61
output partitions. We implement the *semantic*, not the loop: Spark's
native ``unpivot`` lowers to a single Expand node — one pass over the
data, no union lineage, no extra shuffle. At 100 TB the loop version is
61 scans' worth of lineage and a planner blow-up; the Expand version is
one scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    ids: Sequence[str],
    value_columns: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
    var_cast: str | None = None,
    value_cast: str | None = None,
) -> DataFrame:
    """R1 unpivot/melt: wide → long in one Expand projection.

    ``var_cast``/``value_cast`` cast the output columns (the reference's
    year-name columns are strings holding numerics; explicit casts keep
    oracle parity — SURVEY §7 "string-typed numerics" risk).
    """
    out = df.unpivot(
        ids=[F.col(f"`{c}`") for c in ids],
        values=[F.col(f"`{c}`") for c in value_columns],
        variableColumnName=var_name,
        valueColumnName=value_name,
    )
    if var_cast:
        out = out.withColumn(var_name, F.col(var_name).cast(var_cast))
    if value_cast:
        out = out.withColumn(value_name, F.col(value_name).cast(value_cast))
    return out


def pivot_wide(
    df: DataFrame,
    ids: Sequence[str],
    pivot_column: str,
    value_column: str,
    agg: str = "first",
    pivot_values: Sequence | None = None,
) -> DataFrame:
    """R2 pivot (inverse of melt). Passing ``pivot_values`` explicitly
    skips the extra distinct-values job — always do so at scale."""
    agg_col = getattr(F, agg)(F.col(f"`{value_column}`"))
    grouped = df.groupBy(*ids)
    pivoted = (
        grouped.pivot(pivot_column, list(pivot_values))
        if pivot_values is not None
        else grouped.pivot(pivot_column)
    )
    return pivoted.agg(agg_col)
