"""Filter / predicate operators (SURVEY §2.3 F1–F8).

Reference parity:
- F1 SQL-string where ``length(Country_Code) = 3``
  (``data_ingestion_and_cleaning/curate_data.py:95-96``).
- F2 NOT NULL predicate (``data_manipulation/denormalized_tables.py:62-72``).
- F3 negated contains (``curate_data.py:97``).
- F4 rlike member-state regex (``curate_data.py:205-208``).
- F5 IN predicate (``curate_data.py:235``).
- F6 comparison on derived col (``data_manipulation/serving_layer.py:263-267``).
- F7 all-null row drop (``curate_data.py:79-83``).
- F8 distinct (``curate_data.py:85-89``).

Scale notes: F1–F6 are Catalyst-visible predicates → pushed to the
parquet scan (check ``PushedFilters`` in ``.explain``). F7 is a narrow
filter. F8 ``distinct`` over all columns is a full shuffle — at 100 TB
prefer key-scoped ``dropDuplicates(keys)`` (exposed here) or the
hash-based exact dedup in ``llm.dedup`` which shuffles only a 32-byte
digest instead of whole rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_expr(df: DataFrame, predicate: Column | str) -> DataFrame:
    """F1/F6: filter by a Column or SQL-string predicate — the reference
    shows the same filter both ways (``curate_data.py:95-101``)."""
    return df.where(predicate)


def filter_not_null(df: DataFrame, column: str) -> DataFrame:
    """F2: keep rows where ``column`` is not null."""
    return df.where(F.col(column).isNotNull())


def filter_not_contains(df: DataFrame, column: str, substring: str) -> DataFrame:
    """F3: keep rows where ``column`` does NOT contain ``substring``."""
    return df.where(~F.col(column).contains(substring))


def filter_rlike(df: DataFrame, column: str, pattern: str) -> DataFrame:
    """F4: regex match filter."""
    return df.filter(F.col(column).rlike(pattern))


def filter_in(df: DataFrame, column: str, values: Sequence) -> DataFrame:
    """F5: IN-list predicate."""
    return df.where(F.col(column).isin(list(values)))


def drop_all_null_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """F7: drop rows where every (subset) column is null."""
    return df.na.drop(how="all", subset=list(subset) if subset else None)


def distinct_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """F8: full-row dedup, or key-scoped ``dropDuplicates`` when
    ``subset`` is given (the scale-friendly form)."""
    return df.dropDuplicates(list(subset)) if subset else df.distinct()
