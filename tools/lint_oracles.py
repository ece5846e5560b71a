"""Canonicalizer-hazard lint for the query registry.

The driver's correctness gate canonicalizes both result frames through
pandas (``sort_values`` over every column, then a value hash). Two
classes of query output break that contract even when the values are
identical (both bit the round-4 record):

1. **Unsortable cells** — a top-level ``array``/``struct``/``map``
   column reaches pandas as Python lists/dicts, and
   ``sort_values`` → ``factorize`` raises ``unhashable type``.
2. **Width-unstable numerics** — DuckDB widens ``sum(INTEGER)`` to
   HUGEINT and fixed-point aggregates to DECIMAL; pandas converts both
   to ``float64``/``object`` while Spark's twin column lands ``int64``,
   so the value hash diverges on identical numbers. The same applies to
   any Spark/DuckDB width mismatch (Spark ``int`` vs oracle ``BIGINT``).

This lint checks EVERY registered oracle pair without executing a
single Spark job: the Spark side is the analyzed schema of the built
plan, the DuckDB side is ``DESCRIBE <oracle>`` over empty views with
the fixture schemas. Wired into pytest (``tests/test_entry.py``), so a
new query with a hazardous output shape fails CI before the driver
ever samples it.

Usage: python tools/lint_oracles.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Value-class map: the driver hashes cell VALUES after pandas
# conversion, so integer width differences are harmless (int32 and
# int64 hash identically — proven by several long-green queries with
# spark int vs oracle BIGINT). What breaks the hash is a value-CLASS
# change: int on one side, float on the other (the HUGEINT→float64
# trap), or differing float precision.
_SPARK_CLASS = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "f32",
    "double": "f64",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
}

_DUCK_CLASS = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "FLOAT": "f32",
    "DOUBLE": "f64",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "ts",
}

# DuckDB types pandas degrades (HUGEINT → float64 / object,
# DECIMAL → object or float64) — never allowed in an oracle's output.
_DUCK_HAZARD = re.compile(r"HUGEINT|UHUGEINT|DECIMAL|\[\]|STRUCT|MAP|UNION|LIST")
_SPARK_HAZARD = re.compile(r"^(array|struct|map)<|^decimal\(")


def _round_spans(sql: str) -> list[tuple[int, int, int]]:
    """All round(x, N) calls with integer-literal precision: a list of
    (arg_start, arg_end, N) spans over the argument text (precision
    argument excluded)."""
    spans: list[tuple[int, int, int]] = []
    for m in re.finditer(r"\bround\s*\(", sql, re.I):
        start = m.end()
        depth, i = 1, start
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        inner_end = i - 1
        inner = sql[start:inner_end]
        depth, last_comma = 0, -1
        for j, ch in enumerate(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                last_comma = j
        if last_comma < 0:
            continue
        prec = inner[last_comma + 1 :].strip()
        if re.fullmatch(r"\d+", prec):
            spans.append((start, start + last_comma, int(prec)))
    return spans


def _double_round_hazards(name: str, sql: str) -> list[str]:
    """Flag round(expr, n) whose argument contains round(..., m) with
    m > n: re-rounding a value already quantized to a FINER grid lands
    on an exact .5e-n tie with ~1e-(m-n) density, where Spark
    (shortest-repr HALF_UP) and DuckDB (double-value) rounding disagree
    — the sim_semantic_dup_report r12 bug (round-4 of a round-6 cosine
    hit an exact 0.35355). Equal precision (the BM25 per-term pattern,
    round-6 terms summed then round-6) is safe: sums of a grid stay on
    the grid, never half-way between its own points."""
    spans = _round_spans(sql)
    out: list[str] = []
    for (s1, e1, n) in spans:
        for (s2, e2, m) in spans:
            if s1 < s2 and e2 <= e1 and m > n:
                out.append(
                    f"{name}: round(..., {n}) applied over round(..., {m}) — "
                    "re-rounding a finer-quantized value is a guaranteed-"
                    "density .5 tie generator; round the raw value once, or "
                    "fold in integers"
                )
    return out


def lint_specs(spark, sf_dir: str) -> list[str]:
    import duckdb

    from data_pipeline_with_spark_spark.plans import all_queries
    from data_pipeline_with_spark_spark.sources.readers import TESTDATA_TABLES

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        # Empty views with the real fixture schema: DESCRIBE needs types,
        # not rows, so the lint is O(plans), not O(data).
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet' LIMIT 0"
        )

    problems: list[str] = []
    for name, spec in all_queries().items():
        if spec.oracle is None:
            continue
        problems.extend(_double_round_hazards(name, spec.oracle))
        try:
            duck_types = {
                r[0]: r[1]
                for r in con.execute(f"DESCRIBE {spec.oracle}").fetchall()
            }
        except Exception as e:  # noqa: BLE001 — report, don't mask, any describe failure
            problems.append(f"{name}: oracle DESCRIBE failed: {e}")
            continue
        try:
            spark_types = dict(spec.build(spark, sf_dir).dtypes)
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: spark build failed: {e}")
            continue

        for col, sdt in spark_types.items():
            if _SPARK_HAZARD.match(sdt):
                problems.append(
                    f"{name}.{col}: spark type {sdt} is unsortable/width-unstable "
                    "under the driver canonicalizer — digest or cast it"
                )
        for col, ddt in duck_types.items():
            if _DUCK_HAZARD.search(ddt):
                problems.append(
                    f"{name}.{col}: oracle type {ddt} degrades in pandas "
                    "(HUGEINT/DECIMAL/list) — CAST it in the oracle SQL"
                )
        for col in set(spark_types) & set(duck_types):
            s_cls = _SPARK_CLASS.get(spark_types[col])
            d_cls = _DUCK_CLASS.get(duck_types[col])
            if s_cls is not None and d_cls is not None and s_cls != d_cls:
                problems.append(
                    f"{name}.{col}: value-class mismatch spark={spark_types[col]} "
                    f"oracle={duck_types[col]} — align both sides"
                )
    return problems


def main() -> int:
    from data_pipeline_with_spark_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("lint_oracles")
    problems = lint_specs(spark, sf_dir)
    for p in problems:
        print("HAZARD", p)
    print(f"{len(problems)} hazards across registered oracles")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
