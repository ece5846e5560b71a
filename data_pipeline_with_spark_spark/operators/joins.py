"""Join operators (SURVEY §2.4 J1–J2).

Reference parity:
- J1 inner equi-join on a multi-column USING list
  (``data_manipulation/denormalized_tables.py:90-98``).
- J2 inner equi-join on a boolean expression (YoY self-join of per-MS
  aggregates, ``denormalized_tables.py:181-187``).

The reference never picks a join strategy; Catalyst+AQE do. We surface a
``broadcast_right`` hint because at 100 TB the difference between a
broadcast-hash join (no shuffle of the fact table) and a sort-merge join
(full shuffle of both sides) is the whole ballgame for dim joins —
region/nation/supplier-style tables must always broadcast.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """J1: USING-style equi-join (keys deduplicated in output).
    ``how`` passes through, so left/right/full/semi/anti come free."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=list(on) if not isinstance(on, str) else on, how=how)


def expr_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """J2: join on an arbitrary boolean expression; both sides' columns
    survive (disambiguate via parent-frame refs, as the reference does)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, condition, how)


def salted_skew_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join hardened against a hot key: salt the (large, skewed)
    left side with a random bucket and replicate every right row across
    all buckets, so one hot key spreads over ``salt_buckets`` tasks
    instead of melting a single reducer.

    AQE's skew-join split (on in session.py) handles moderate skew at
    runtime; this explicit form is for the pathological case — a single
    key holding >1/buckets of the data — or engines/stages where AQE
    can't help (e.g. skewed window partitions rewritten as joins).
    Right-side replication costs salt_buckets× its size: use only with
    a small-to-medium right side.
    """
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_left.join(salted_right, on=[key, "__salt"], how=how).drop("__salt")
