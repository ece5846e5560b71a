"""True multi-column Z-order clustering (bit-interleaved space-filling
curve), upgrading the lexicographic "Z-order-lite" fallback.

Reference parity: ``OPTIMIZE … ZORDER BY`` at
``data_lake_into_lakehouse/delta_lake.py:54-67``. Lexicographic sort
clusters only the leading column; interleaving the bits of per-column
bucket ids (Morton order) gives every Z-ordered column file-level
locality, so parquet min/max stats prune on *any* of them — the same
design OSS Delta uses (range-id interleaving).

Implementation is pure Catalyst expressions end-to-end:
- per-column bucket id: ``width_bucket(value, min, max, 2^bits)`` over
  the column's observed range (one lightweight agg job for the stats;
  equal-width buckets — cheap, and at maintenance time that's the right
  trade vs. quantile sketches);
- Morton key: for bit i and column j, bit i of bucket_j lands at
  position ``i * n_cols + j`` of the key — shiftleft/AND arithmetic,
  fully codegen'd, no UDFs.

Scale: the stats agg is a single min/max pass (columnar, pushed to
footers where possible); the clustering itself is the same single
``repartitionByRange + sortWithinPartitions`` shuffle the lexicographic
variant pays. Nothing here is driver-side except 2×n_cols scalars.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double", "date", "timestamp")


def _as_double(c: Column, dtype: str) -> Column:
    if dtype == "date":
        return F.unix_date(c).cast("double")
    if dtype == "timestamp":
        return F.unix_timestamp(c).cast("double")
    return c.cast("double")


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Morton (Z-curve) key column over ``cols``. Columns must be
    numeric/date/timestamp (strings have no meaningful equal-width
    ranges; callers fall back to lexicographic for those). ``bits``
    buckets per column (8 → 256 buckets), key width = bits * len(cols)
    ≤ 63 bits."""
    if bits * len(cols) > 63:
        raise ValueError(f"zorder key too wide: {bits} bits × {len(cols)} cols > 63")
    dtypes = dict(df.dtypes)
    bad = [c for c in cols if dtypes.get(c) not in _NUMERIC]
    if bad:
        raise TypeError(f"zorder_key needs numeric/date/timestamp columns; got {bad}")
    n = 2**bits
    stats = df.agg(
        *[F.min(F.col(c)).alias(f"min_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c)).alias(f"max_{i}") for i, c in enumerate(cols)],
    ).first()
    key: Column | None = None
    for j, c in enumerate(cols):
        lo = _as_double(F.lit(stats[f"min_{j}"]), dtypes[c])
        hi = _as_double(F.lit(stats[f"max_{j}"]), dtypes[c])
        v = _as_double(F.col(c), dtypes[c])
        bucket = F.when(hi <= lo, F.lit(0)).otherwise(
            F.least(
                F.lit(n - 1),
                F.greatest(F.lit(0), F.width_bucket(v, lo, hi, F.lit(n)) - 1),
            )
        ).cast("bigint")
        for i in range(bits):
            bit = F.shiftrightunsigned(bucket, i).bitwiseAND(F.lit(1))
            term = F.shiftleft(bit, i * len(cols) + j)
            key = term if key is None else key + term
    return key.alias("__zorder_key")


def _string_bucket_map(df: DataFrame, c: str, n: int) -> DataFrame:
    """Rank-dictionary buckets for a string column: distinct values →
    percent_rank → 0..n-1. The global-order window runs over the
    DISTINCT value set only (vocabulary-sized, not corpus-sized), which
    is how Delta assigns range ids to string Z-order columns; for
    unbounded-cardinality columns, sample the distinct set first."""
    from pyspark.sql import Window

    vals = df.select(c).where(F.col(c).isNotNull()).distinct()
    w = Window.orderBy(F.col(c))
    return vals.withColumn(
        f"__zb_{c}",
        (F.percent_rank().over(w) * (n - 1)).cast("bigint"),
    )


def zorder_cluster(
    df: DataFrame, cols: list[str], target_partitions: int, bits: int = 8
) -> DataFrame:
    """Repartition + sort ``df`` along the Z-curve of ``cols`` so each
    output file covers a compact hyper-rectangle of the key space.
    Numeric/date/timestamp columns bucket by ``width_bucket`` over their
    range; string columns bucket by rank dictionary (broadcast-joined).
    """
    if bits * len(cols) > 63:
        raise ValueError(f"zorder key too wide: {bits} bits × {len(cols)} cols > 63")
    dtypes = dict(df.dtypes)
    bad = [c for c in cols if dtypes.get(c) not in _NUMERIC and dtypes.get(c) != "string"]
    if bad:
        raise TypeError(f"zorder_cluster supports numeric/date/timestamp/string; got {bad}")
    n = 2**bits
    numeric = [c for c in cols if dtypes[c] in _NUMERIC]
    stats = (
        df.agg(
            *[F.min(F.col(c)).alias(f"min_{c}") for c in numeric],
            *[F.max(F.col(c)).alias(f"max_{c}") for c in numeric],
        ).first()
        if numeric
        else None
    )
    work = df
    buckets: list[Column] = []
    for c in cols:
        if dtypes[c] in _NUMERIC:
            lo = _as_double(F.lit(stats[f"min_{c}"]), dtypes[c])
            hi = _as_double(F.lit(stats[f"max_{c}"]), dtypes[c])
            v = _as_double(F.col(c), dtypes[c])
            b = F.when(hi <= lo, F.lit(0)).otherwise(
                F.least(
                    F.lit(n - 1),
                    F.greatest(F.lit(0), F.width_bucket(v, lo, hi, F.lit(n)) - 1),
                )
            )
            buckets.append(F.coalesce(b, F.lit(0)).cast("bigint"))
        else:
            work = work.join(F.broadcast(_string_bucket_map(df, c, n)), on=c, how="left")
            buckets.append(F.coalesce(F.col(f"__zb_{c}"), F.lit(0)).cast("bigint"))
    key: Column | None = None
    for j, bucket in enumerate(buckets):
        for i in range(bits):
            bit = F.shiftrightunsigned(bucket, i).bitwiseAND(F.lit(1))
            term = F.shiftleft(bit, i * len(cols) + j)
            key = term if key is None else key + term
    helper = [f"__zb_{c}" for c in cols if dtypes[c] == "string"]
    return (
        work.withColumn("__zorder_key", key)
        .repartitionByRange(target_partitions, F.col("__zorder_key"))
        .sortWithinPartitions("__zorder_key")
        .drop("__zorder_key", *helper)
        .select(*[F.col(f"`{c}`") for c in df.columns])
    )
