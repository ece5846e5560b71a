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

import functools
import json
import os
from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path

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
    "sketch_",
    "graph_",
    "text_",
    "multimodal",
)


def _order_key(item: tuple[str, QuerySpec]) -> tuple[int, int]:
    name, spec = item
    for i, p in enumerate(_ORDER_PREFIXES):
        if name.startswith(p):
            return (0 if spec.headline else 1, i)
    return (0 if spec.headline else 2, len(_ORDER_PREFIXES))


@functools.lru_cache(maxsize=1)
def _driver_sample_history() -> dict[str, tuple[int, bool, bool]]:
    """Per-query driver sample history from ``CORRECTNESS_r*.json`` at
    the repo root AND under ``artifacts/`` (r13 housekeeping moved old
    round files there; reading only the root made every entry last
    sampled before r12 look never-sampled, which buried the genuinely
    stalest greens — r14 verdict task 8): name → (last round sampled,
    red in that sample, no-hash-evidence in that sample).

    The driver's gate samples a prefix window of ``queries()``, so a
    static order resamples the same names every round. The rotation
    (see ``all_queries(rotate=True)``) uses this history to give every
    query a turn in the window. Cached per process — the gate runs one
    process per round, and round files only change between rounds.
    """
    history: dict[str, tuple[int, bool, bool]] = {}
    root = Path(__file__).resolve().parents[2]
    files = list(root.glob("CORRECTNESS_r*.json")) + list(
        root.glob("artifacts/CORRECTNESS_r*.json")
    )
    for f in sorted(files):
        try:
            rnd = int(f.stem.split("_r")[-1])
        except ValueError:
            rnd = 0
        try:
            data = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        queries = data.get("queries") if isinstance(data.get("queries"), dict) else data
        for name, v in queries.items():
            if not isinstance(v, dict):
                continue
            err = v.get("err")
            red = (
                v.get("hash_match") is False
                or v.get("rows_match") is False
                or v.get("schema_match") is False
                or (err is not None and err != "no_oracle")
            )
            no_hash = v.get("hash_match") is not True
            prev = history.get(name)
            if prev is None or rnd >= prev[0]:
                history[name] = (rnd, red, no_hash)
    return history


def _rotation_key(item: tuple[str, QuerySpec]) -> tuple:
    """Least-recently-sampled rotation with red-first escalation:

    tier 0 — red in its most recent driver sample (a fix must be
             re-proven before anything else);
    tier 1 — never driver-sampled;
    tier 2 — GRADUATED: the latest sample predates this entry's oracle
             (recorded rows-only/no-hash, but an oracle is registered
             now) — the stronger hash evidence should land on record
             before stale greens refresh;
    tier 3 — green, ordered by last-sampled round ascending, so
             r1-era greens re-enter the window before last round's
             (stale evidence refreshes instead of aging forever).
    """
    name, spec = item
    hist = _driver_sample_history().get(name)
    if hist is None:
        return (1, 0, *_order_key(item))
    last_round, red, no_hash = hist
    if red:
        return (0, last_round, *_order_key(item))
    if no_hash and spec.oracle is not None:
        return (2, last_round, *_order_key(item))
    return (3, last_round, *_order_key(item))


def all_queries(rotate: bool | None = None) -> dict[str, QuerySpec]:
    """The full query catalog.

    ``rotate`` controls dict order only (the driver samples a prefix
    window). Default is the stable risk-family order so the public
    registry order never depends on untracked ``CORRECTNESS_r*.json``
    side files; the driver-gate entry point (``__spark_entry__``)
    passes ``rotate=True`` (or set ``SPARK_GRAFT_ROTATE=1``) to get
    the least-recently-sampled rotation.
    """
    # Import side-effect modules that populate the registry.
    from data_pipeline_with_spark_spark.plans import (  # noqa: F401
        catalog_core,
        catalog_events,
        catalog_extended,
        catalog_lake,
        catalog_llm,
        catalog_sketches,
        catalog_sources,
        catalog_streaming,
        catalog_tpch,
    )

    if rotate is None:
        rotate = os.environ.get("SPARK_GRAFT_ROTATE", "") == "1"
    items = list(_REGISTRY.items())
    items.sort(key=_rotation_key if rotate else _order_key)
    return dict(items)


def headline_queries() -> dict[str, QuerySpec]:
    return {k: v for k, v in all_queries().items() if v.headline}
