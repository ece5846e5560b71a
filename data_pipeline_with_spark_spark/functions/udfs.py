"""UDF surface (SURVEY §2.10 U1–U2) and native equivalents.

Reference parity: ``data_manipulation/udf_complex_logic.py`` computes a
decade label (1994 → '1990s') three ways — row-pickled Python UDF
(:49-57), Arrow-vectorized pandas UDF (:86-93), and notes that native
Catalyst expressions beat both (:8). We keep all three so the U3 timing
harness can reproduce the comparison, and use the native form in every
real query.

Doctrine (kept from the reference): native > pandas_udf > udf. A Python
UDF forces a JVM↔Python round trip per batch and blinds Catalyst — at
100 TB a hot-path Python UDF is the single worst perf bug available.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def decade_native(year: Column | str) -> Column:
    """Catalyst-native decade label: codegen'd, optimizer-visible."""
    y = F.col(year) if isinstance(year, str) else year
    return F.concat((F.floor(y / 10) * 10).cast("int").cast("string"), F.lit("s"))


def _decade_py(year: int | None) -> str | None:
    # math.floor semantics so negative years agree with the native
    # floor(y/10)*10 form (-5 → '-10s', not '0s').
    return None if year is None else f"{math.floor(year / 10) * 10}s"


# U1: row-at-a-time Python UDF (slow path, kept for the benchmark).
decade_python_udf = F.udf(_decade_py, T.StringType())


# U2: Arrow-vectorized pandas UDF.
@F.pandas_udf(T.StringType())
def decade_pandas_udf(year: pd.Series) -> pd.Series:
    # Mask nulls BEFORE astype(str) — Int64 NA stringifies to '<NA>',
    # which would return the literal string '<NA>s' instead of NULL.
    dec = ((year // 10) * 10).astype("Int64")
    out = dec.astype(str) + "s"
    return out.where(dec.notna(), None)


# U4: Arrow GROUPED_AGG pandas UDF (Series → scalar per group) — the
# fourth face of the §2.10 taxonomy next to native / row-UDF / scalar
# pandas. Returns the BIGINT sum so the aggregate is order-free and
# bit-identical to the native sum (a float mean inside the UDF would
# depend on pandas' summation order; the mean is taken OUTSIDE via
# integer division). Arrow ships each group's column as one batch —
# the vectorized path — but the optimizer still can't push into it:
# keep grouped-agg UDFs for logic native aggregates can't express.
@F.pandas_udf(T.LongType())
def sum_cents_grouped_agg(cents: pd.Series) -> int:
    return int(cents.sum())


# Companion count (Spark disallows mixing GROUPED_AGG pandas UDFs with
# non-pandas aggregates in one agg() — INVALID_PANDAS_UDF_PLACEMENT —
# so the count rides the same Arrow path).
@F.pandas_udf(T.LongType())
def count_grouped_agg(cents: pd.Series) -> int:
    return int(len(cents))
