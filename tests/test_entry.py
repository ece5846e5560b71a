"""Driver-contract smoke tests: entry() runs, every query builds at
sf0.001, every oracle key has a matching query."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as se


def test_entry_smoke(spark):
    df = se.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_queries_build_at_smoke_sf(spark, sf_dir):
    qs = se.queries()
    assert len(qs) >= 25
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_oracle_keys_subset_of_queries():
    qs, oracles = se.queries(), se.oracle_sql()
    assert set(oracles) <= set(qs)
    assert all(isinstance(v, str) and v.strip() for v in oracles.values())
