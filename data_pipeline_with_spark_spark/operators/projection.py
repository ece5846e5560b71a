"""Projection / column operators (SURVEY §2.2 P1–P8).

Reference parity:
- P1 bulk rename via select-alias comprehension
  (``data_ingestion_and_cleaning/curate_data.py:74-77,189-193``).
- P2 column subset (``data_manipulation/denormalized_tables.py:64-72``).
- P3 withColumn derived (``denormalized_tables.py:181-187``).
- P4 withColumnRenamed (``data_lake_into_lakehouse/lakehouse_data_igestion.py:178-181``).
- P5 drop (``data_manipulation/serving_layer.py:267``).
- P6 cast (``lakehouse_data_igestion.py:161,197-200``).
- P7/P8 lit / alias (``denormalized_tables.py:171-187``).

All narrow (no shuffle); Catalyst folds chains of these into a single
projection inside whole-stage codegen, so composing them freely is free
at any scale.
"""

from __future__ import annotations

import re
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_name(name: str) -> str:
    """The reference's column-name normalization: spaces → underscores,
    parens stripped (``curate_data.py:77,190-193``). Names may still
    contain ``/``, ``-`` or lead with digits — downstream SQL must
    backtick-quote (SURVEY §1 hazard)."""
    return re.sub(r"[()]", "", name.replace(" ", "_"))


def normalize_column_names(df: DataFrame) -> DataFrame:
    """P1: one projection renaming every column — a single ``select`` of
    aliases, not N ``withColumnRenamed`` calls (each of which grows the
    logical plan)."""
    return df.select([F.col(f"`{c}`").alias(normalize_name(c)) for c in df.columns])


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """P4 generalized: rename several columns in one pass."""
    return df.withColumnsRenamed(dict(mapping))


def select_columns(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """P2: keep a named subset (column pruning reaches the scan)."""
    return df.select([F.col(f"`{c}`") for c in columns])


def add_column(df: DataFrame, name: str, expr: Column | str) -> DataFrame:
    """P3/P7/P8: derived column; ``expr`` may be a Column or SQL string."""
    col = F.expr(expr) if isinstance(expr, str) else expr
    return df.withColumn(name, col)


def cast_columns(df: DataFrame, casts: Mapping[str, str]) -> DataFrame:
    """P6: cast named columns to new types in one projection."""
    return df.withColumns({c: F.col(f"`{c}`").cast(t) for c, t in casts.items()})
