"""As-of and range joins — operators Spark has no native node for
(SURVEY §2.14 note: custom ops compose existing DataFrame primitives
before reaching for UDFs).

**As-of join** (backward): for each left row, the most recent right row
with ``right_ts <= left_ts`` per key. Implementation is the scalable
union trick, not a per-key UDF and not an inequality join (which Spark
would plan as a broadcast-nested-loop):

1. tag both inputs and stack them with ``unionByName`` (right's value
   columns null on left rows and vice versa);
2. one window over (key) ordered by (ts, right-first tiebreak) takes
   ``last(value, ignorenulls=True)`` — the running most-recent right
   values;
3. keep the left rows.

Cost: ONE shuffle on the key — the same price as a groupBy, regardless
of how many right rows precede each left row. Equal timestamps match
(right sorts before left at the same ts), which is DuckDB/pandas
``merge_asof`` backward semantics.

**Range join**: point-in-interval joins where the interval side is
small (calendars, SLA bands, rate tables) broadcast the intervals —
each fact row scans the broadcast table; no shuffle of the fact side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_columns: Sequence[str] | None = None,
) -> DataFrame:
    """Backward as-of join. Returns all left columns plus the right
    ``value_columns`` (default: every right column except key/ts) from
    the latest right row at-or-before each left row's timestamp."""
    if value_columns is None:
        value_columns = [c for c in right.columns if c not in (key, right_ts)]
    clash = sorted(set(value_columns) & set(left.columns))
    if clash:
        # Silently nulling-then-overwriting a left column would lose
        # data; fail loudly like pandas/DuckDB merge_asof suffix rules.
        raise ValueError(
            f"asof_join: left columns {clash} collide with right value "
            "columns; rename or pass explicit value_columns"
        )

    l_tagged = left.withColumn("__is_left", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    for c in value_columns:
        l_tagged = l_tagged.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    r_tagged = (
        right.select(key, right_ts, *value_columns)
        .withColumn("__is_left", F.lit(0))
        .withColumn("__ts", F.col(right_ts))
    )
    stacked = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # right rows (tag 0) sort before left rows (tag 1) at equal __ts, so
    # an exactly-simultaneous right row is visible to the left row.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = stacked.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in value_columns
        ],
    )
    out = filled.where(F.col("__is_left") == 1)
    for c in value_columns:
        out = out.drop(c).withColumnRenamed(f"__asof_{c}", c)
    return out.drop("__is_left", "__ts")


def range_join(
    facts: DataFrame,
    ranges: DataFrame,
    point: Column | str,
    lower: str,
    upper: str,
    how: str = "inner",
    inclusive_upper: bool = False,
) -> DataFrame:
    """Point-in-interval join with the interval side broadcast. The
    fact side never shuffles; Spark plans BroadcastNestedLoopJoin, and
    each fact row probes the (small) interval table."""
    p = F.col(point) if isinstance(point, str) else point
    upper_cmp = p <= F.col(upper) if inclusive_upper else p < F.col(upper)
    return facts.join(F.broadcast(ranges), (p >= F.col(lower)) & upper_cmp, how)
