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


def _round_spans(sql: str) -> list[tuple[int, int, int, int]]:
    """All round(x, N) calls with integer-literal precision: a list of
    (arg_start, arg_end, call_end, N) spans — [arg_start, arg_end) is
    the argument text (precision argument excluded), call_end is the
    index just past the closing paren (where an ``AS alias`` would
    follow)."""
    spans: list[tuple[int, int, int, int]] = []
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
            spans.append((start, start + last_comma, i, int(prec)))
    return spans


def _round_aliases(sql: str, spans) -> dict[str, int]:
    """Aliases carrying an already-rounded value: ``round(x, m) AS name``
    maps name → m, then one-level re-aliasing (``name AS other`` /
    ``t.name AS other``) propagates to a fixpoint. Case-folded. When the
    same name is bound more than once (CTE reuse), the FINEST precision
    wins — the lint is conservative by design."""
    aliases: dict[str, int] = {}
    for (_, _, end, m) in spans:
        am = re.match(r'\s+as\s+"?([A-Za-z_]\w*)"?', sql[end:], re.I)
        if am:
            name = am.group(1).lower()
            aliases[name] = max(aliases.get(name, 0), m)
    # one-level-per-pass propagation through plain re-aliases, to fixpoint
    for _ in range(8):
        grew = False
        for name, m in list(aliases.items()):
            for am in re.finditer(
                rf'\b{re.escape(name)}\s+as\s+"?([A-Za-z_]\w*)"?', sql, re.I
            ):
                other = am.group(1).lower()
                if aliases.get(other, 0) < m:
                    aliases[other] = m
                    grew = True
        if not grew:
            break
    return aliases


def _double_round_hazards(name: str, sql: str) -> list[str]:
    """Flag round(expr, n) whose argument is already quantized to a
    FINER grid — re-rounding lands on an exact .5e-n tie with
    ~1e-(m-n) density, where Spark (shortest-repr HALF_UP) and DuckDB
    (double-value) rounding disagree — the sim_semantic_dup_report r12
    bug (round-4 of a round-6 cosine hit an exact 0.35355). Two shapes:

    1. textual nesting: round(round(x, m), n) with m > n;
    2. alias indirection: round(x, m) AS a in a CTE/subquery, then
       round(a, n) downstream (the shape the r12 lint originally
       missed — found by the r11 advisor reconstructing the original
       bug through a CTE).

    Equal precision (the BM25 per-term pattern, round-6 terms summed
    then round-6) is safe: sums of a grid stay on the grid, never
    half-way between its own points. Alias tracking is regex-level —
    one rebinding level per propagation pass (fixpoint-iterated), no
    scope analysis — so an alias REUSED for a different, unrounded
    expression can false-positive; rename one of them."""
    spans = _round_spans(sql)
    out: list[str] = []
    for (s1, e1, _, n) in spans:
        for (s2, e2, _, m) in spans:
            if s1 < s2 and e2 <= e1 and m > n:
                out.append(
                    f"{name}: round(..., {n}) applied over round(..., {m}) — "
                    "re-rounding a finer-quantized value is a guaranteed-"
                    "density .5 tie generator; round the raw value once, or "
                    "fold in integers"
                )
    aliases = _round_aliases(sql, spans)
    for (s1, e1, _, n) in spans:
        arg = sql[s1:e1]
        for alias, m in aliases.items():
            if m > n and re.search(rf"\b{re.escape(alias)}\b", arg, re.I):
                out.append(
                    f"{name}: round({alias}, {n}) where `{alias}` carries a "
                    f"round(..., {m}) value through an alias — same .5 tie "
                    "generator as textual nesting; emit the finer-rounded "
                    "value or round the raw expression once"
                )
    return out


# A bare fractional literal in arithmetic with an INTEGER column turns
# the whole expression DECIMAL in Spark (1e-16 quantized fixed-point)
# while DuckDB runs doubles — a systematic per-term drift that broke
# events_psi_drift in r11. The analyzer makes this mechanically
# visible: the implicit promotion appears as `cast(col#id as
# decimal(…))` in the ANALYZED plan, while the safe double-promoted
# shape prints `cast(0.5 as double)`. Two signals, either flags:
#   1. a cast-to-decimal whose OPERAND references an attribute (`#` in
#      the operand text) — an integer column pulled into decimal;
#   2. `CheckOverflow` anywhere — the analyzer wraps every decimal
#      ADD/SUB/MUL/DIV in it, so its presence means decimal arithmetic
#      actually runs (even literal-only: Spark would fold 0.1+0.2
#      exactly in decimal where DuckDB doubles give …0004).
# Decimal LITERALS that are merely re-cast (e.g. fractional constants
# inside an array<double> cast — the classifier/PCA weight tables) are
# value-identical to double literals and deliberately NOT flagged.
def _decimal_plan_hazards(name: str, df) -> list[str]:
    tree = df._jdf.queryExecution().analyzed().treeString()
    for m in re.finditer(r" as decimal\(", tree):
        depth, i = 0, m.start() - 1
        while i >= 0:
            c = tree[i]
            if c == ")":
                depth += 1
            elif c == "(":
                if depth == 0:
                    break
                depth -= 1
            i -= 1
        operand = tree[i + 1 : m.start()]
        if "#" in operand:
            # one hazard per entry: the cast finding names the column,
            # so the CheckOverflow signal below would only repeat it
            return [
                f"{name}: column pulled into DECIMAL by a bare fractional "
                "literal — Spark runs the expression in fixed-point while "
                "the DuckDB oracle runs doubles (the events_psi_drift bug "
                f"class). CAST the literal AS DOUBLE. Offending cast: "
                f"cast({operand[:160]} as decimal(...)"
            ]
    if "CheckOverflow" in tree:
        return [
            f"{name}: decimal arithmetic (CheckOverflow) in the analyzed "
            "Spark plan — the DuckDB oracle runs doubles (the "
            "events_psi_drift bug class); CAST the fractional literals "
            "AS DOUBLE"
        ]
    return []


# InferFiltersFromGenerate recompute hazard (the r12 headline find,
# mechanized per that round's lead): for a NON-outer explode over a
# COMPUTED array, Catalyst infers `size(arr) > 0`, and predicate
# pushdown substitutes the array's full defining expression into a
# Filter that sinks below every projection — below the
# ensure_min_partitions exchange, onto the scan's few input partitions,
# with guard projections re-inlined (the O(tokens × shingles)
# re-tokenize `with_shingles` exists to prevent). util.exploded() is
# the engine-wide fix; this rule catches future regressions (a new
# entry hand-writing F.explode over an expensive array) mechanically.
# Signature in the OPTIMIZED plan: a Filter node testing
# `size(<higher-order-function array>) > 0` as a bare conjunct —
# verified to print exactly this shape on a reproduction of the
# novelty-postings hazard, and to be absent from the exploded()
# spelling (whose only filter is `isnotnull(pos)`). Two deliberate
# exclusions, both live in the catalog: a USER size predicate with a
# different bound (textrank's `size(tokens) >= 2`) and a size()>0
# guard inside a CASE WHEN of a user filter (curation's quality-score
# division guard) — the inferred filter is never CASE-wrapped and is
# always the `> 0` test.
_GENERATE_FILTER_RE = re.compile(
    r"size\((?:array_distinct\()?\s*(?:transform|filter|aggregate|zip_with)\("
)


def _generate_filter_hazards(name: str, df) -> list[str]:
    tree = df._jdf.queryExecution().optimizedPlan().treeString()
    for line in tree.splitlines():
        if "Filter" not in line or "> 0)" not in line:
            continue
        m = _GENERATE_FILTER_RE.search(line)
        if m and "CASE WHEN" not in line[: m.start()]:
            return [
                f"{name}: inferred size()>0 Filter recomputes a "
                "higher-order-function array below the explode "
                "(InferFiltersFromGenerate + pushdown — the r12 novelty "
                "hazard); use util.exploded() instead of F.explode. "
                f"Offending filter: {line.strip()[:200]}"
            ]
    return []


# Plan-regression lints (r13 verdict task 6): the two silent plan
# regressions most likely to slip into a previously-tuned entry.
#
# 1. SortMergeJoin where broadcast was available: every equi-join whose
#    smaller side is under spark.sql.autoBroadcastJoinThreshold should
#    plan as a BroadcastHashJoin; an SMJ appearing there means a code
#    change suppressed broadcast (a stats-hiding barrier, a stray
#    hint, a conf leak). Joins that CANNOT broadcast are excluded:
#    user-hinted joins (deliberate strategy), full-outer (no broadcast
#    side exists), and joins whose min side exceeds the threshold.
# 2. Lost WindowGroupLimit: a rank()/row_number()/dense_rank() window
#    whose output is filtered to a literal bound should optimize into a
#    partial top-k BELOW the Window — either a WindowGroupLimit
#    (partitioned windows, InferWindowGroupLimit) or a pushed
#    GlobalLimit/LocalLimit + top-k Sort (empty partition spec,
#    LimitPushDownThroughWindow — verified: that rule, not WGL, handles
#    the global-row_number case and is strictly better). Losing BOTH
#    silently reverts to fully sorting every partition. Flag when the
#    rank-filter shape exists but the Window's immediate child is
#    neither a WindowGroupLimit nor a pushed Limit.


def _iter_jnodes(node):
    yield node
    cs = node.children()
    for i in range(cs.size()):
        yield from _iter_jnodes(cs.apply(i))


def _smj_hazards(name: str, df, spark) -> list[str]:
    qe = df._jdf.queryExecution()
    threshold = (
        spark._jsparkSession.sessionState().conf().autoBroadcastJoinThreshold()
    )
    non_broadcastable = 0
    unknown_stats = 0
    for n in _iter_jnodes(qe.optimizedPlan()):
        if n.nodeName() != "Join":
            continue
        hinted = n.hint().toString() != "JoinHint(None, None)"
        full_outer = "FullOuter" in n.joinType().toString()
        try:
            min_side = min(
                int(n.children().apply(0).stats().sizeInBytes().toString()),
                int(n.children().apply(1).stats().sizeInBytes().toString()),
            )
        except Exception:  # noqa: BLE001 — unknown stats can't prove broadcastability
            min_side = threshold + 1
            unknown_stats += 1
        if hinted or full_outer or threshold <= 0 or min_side > threshold:
            non_broadcastable += 1
    if unknown_stats:
        # The fallback counts an unknown-stats join as non-broadcastable,
        # which can absorb a genuinely lost broadcast elsewhere in the
        # same plan (counts are plan-wide). Surface the blind spot
        # instead of hiding it (r14 advice) — a WARN, not a hazard:
        # stats estimation throwing is not itself a regression.
        print(
            f"  note {name}: stats unreadable on {unknown_stats} join(s) — "
            "SMJ-vs-broadcast lint is count-based and partially blind here",
            file=sys.stderr,
        )
    smj_count = qe.sparkPlan().treeString().count("SortMergeJoin")
    if smj_count > non_broadcastable:
        return [
            f"{name}: {smj_count} SortMergeJoin(s) in the physical plan but "
            f"only {non_broadcastable} join(s) are legitimately "
            "non-broadcastable (hinted / full-outer / min side over "
            "autoBroadcastJoinThreshold) — a small-side join lost its "
            "broadcast; check for stats-hiding barriers or stray hints"
        ]
    return []


_RANK_ALIAS_RE = re.compile(
    r"\b(?:row_number|rank|dense_rank)\(\)[^\n]*? AS (\w+)#(\d+)"
)


def _window_group_limit_hazards(name: str, df) -> list[str]:
    tree = df._jdf.queryExecution().optimizedPlan().treeString()
    lines = tree.splitlines()
    out: list[str] = []
    for i, wline in enumerate(lines):
        m = _RANK_ALIAS_RE.search(wline)
        if m is None or "Window" not in wline:
            continue
        alias, attr_id = m.groups()
        ref = rf"{re.escape(alias)}#{attr_id}L?"
        bounded = any(
            "Filter" in fl
            and (
                re.search(rf"\({ref} <=? \d+\)", fl)
                or re.search(rf"\({ref} = \d+\)", fl)
            )
            for fl in lines
        )
        if not bounded:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        if not re.search(r"WindowGroupLimit|GlobalLimit|LocalLimit", child):
            out.append(
                f"{name}: rank-filter over `{alias}#{attr_id}` but the "
                "Window's child is neither WindowGroupLimit nor a pushed "
                "Limit — the map-side partial top-k was lost and every "
                f"partition fully sorts. Window child: {child.strip()[:120]}"
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
            sdf = spec.build(spark, sf_dir)
            spark_types = dict(sdf.dtypes)
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: spark build failed: {e}")
            continue
        problems.extend(_decimal_plan_hazards(name, sdf))
        try:
            problems.extend(_generate_filter_hazards(name, sdf))
            problems.extend(_window_group_limit_hazards(name, sdf))
            problems.extend(_smj_hazards(name, sdf, spark))
        except Exception as e:  # noqa: BLE001 — optimization can fail where analysis didn't
            problems.append(f"{name}: optimized/physical-plan walk failed: {e}")

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
