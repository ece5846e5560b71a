"""Window operators (SURVEY §2.6 W1 + the lag formulation of J2).

Reference parity:
- W1 ranked top-k per group: ``row_number().over(Window.partitionBy('MS',
  'year').orderBy(desc('Enedc_g/km')))`` keep rank<=100, drop rank
  (``data_manipulation/serving_layer.py:256-267``).
- The YoY diff at ``denormalized_tables.py:181-187`` is morally
  ``lag(sum) over (partition by MS order by year)``; we expose that as
  the idiomatic path (one shuffle instead of the self-join's two).

Scale notes: a partitioned window shuffles once on the partition keys —
same cost as a groupBy. ``row_number`` under ties is non-deterministic,
so ``top_k_per_group`` demands a total order: pass tiebreaker columns
(SURVEY §7 risk — required for oracle hash parity too).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    keep_rank: bool = False,
    rank_col: str = "rank",
) -> DataFrame:
    """W1: top-k rows per group. ``order_by`` must be a total order
    (append unique tiebreakers) or results are nondeterministic."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    ranked = df.withColumn(rank_col, F.row_number().over(w))
    out = ranked.where(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def lag_diff(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: str,
    value: str,
    diff_col: str = "diff",
    lag_col: str | None = None,
) -> DataFrame:
    """Per-group difference vs the previous row — the single-shuffle
    window formulation of the reference's YoY self-join."""
    w = Window.partitionBy(*partition_by).orderBy(order_by)
    lagged = F.lag(F.col(value)).over(w)
    out = df.withColumn(diff_col, F.col(value) - lagged)
    if lag_col:
        out = out.withColumn(lag_col, lagged)
    return out
