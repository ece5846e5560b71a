"""Scaling evidence: run the headline queries at every fixture scale
factor and report how wall clock grows with data volume.

Writes SCALING.md. Reading it: each column is 10× the data of the one
before (sf0.001 → sf0.01 → sf0.1 → sf1; sf1 is derived from sf0.1 by
``tools/make_scaled_fixture.py`` when the driver doesn't provide one).
``exp`` is the log-log slope of time vs data over the top decade pair —
the scaling exponent. exp ≪ 1 means overhead-dominated at this scale
(healthy: the plan's data-dependent cost is still small), exp ≈ 1 is
scan/shuffle-bound (expected for full-corpus operators), exp > 1.15 is
flagged SUPERLINEAR (quadratic pair blowup, broadcast threshold
crossed, skew). This is the local proxy for the 100 TB question the
plans are designed around.

Usage: python tools/scaling_probe.py [--runs N]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_pipeline_with_spark_spark.plans import all_queries, headline_queries
from data_pipeline_with_spark_spark.session import get_spark
from data_pipeline_with_spark_spark.sources.writers import write_noop

# Iterative-lineage entries probed IN ADDITION to the headliners (r9
# verdict item #5): unrolled-round lineage (Lloyd, GD, BPE merges) is
# exactly where superlinear blowup hides — a per-round plan that grows
# with data (recompute instead of reuse, a collect that scales) shows
# up here first. NOT added to headline_queries: bench.py's frozen
# cross-round comparables must not change composition.
ITERATIVE_EXTRA = [
    "cluster_kmeans_lloyd",
    "curation_quality_classifier",
    "text_bpe_tokenize",
    # NOT the fixed-k sim_semantic_dedup: that entry is quadratic BY
    # CONTRACT (cell population grows with the corpus — measured exp
    # 1.77 / 323 s at sf1 in r10) and exists for the hash-matched
    # oracle; the sqrt(n)-cell auto variant is the scale path.
    "sim_semantic_dedup_auto",
    # r10 additions: PageRank is iterative-join lineage (5 rounds over
    # the near-dup graph); the sketches must show ~scan-bound exp with
    # O(1)-size outputs (a sketch that scales superlinearly is broken
    # by definition).
    "graph_pagerank_dup_docs",
    "sketch_hll_distinct_users",
    "sketch_cms_token_counts",
    # r11 additions (r10 verdict #6): the remaining sketch-algebra and
    # graph faces plus the streaming-ingest twins — all O(sketch)/
    # O(graph) outputs whose cost must track the scan; and the new
    # quantile histogram + triangle entries.
    "sketch_hll_union_types",
    "sketch_cms_join_cardinality",
    "sketch_hll_intersection",
    "sketch_quantile_prices",
    "stream_hll_ingest",
    "stream_cms_ingest",
    "stream_quantile_ingest",
    "graph_pagerank_event_flow",
    "graph_triangles_dup_docs",
    # late-r11 + r12 additions: the truss/core peeling pair share the
    # triangle entry's oriented-join shape but add unrolled peeling
    # rounds (checkpointed edge lists — flat per-round cost is the
    # claim); the KMV family is TakeOrderedAndProject (per-partition
    # heap, driver merge of k*p rows) so it must stay ~scan-bound; the
    # grouped/merged quantile faces add a group dimension to the
    # histogram pass; RRF fuses two verified top-N subtrees; hard
    # negatives is the brute-force scan with a label predicate; the
    # stream-static join must track the other streaming ingests.
    "graph_ktruss_dup_edges",
    "graph_kcore_dup_docs",
    "sketch_kmv_distinct_users",
    "sketch_kmv_overlap_types",
    "sketch_kmv_churn_customers",
    "sketch_quantile_by_type",
    "sketch_quantile_merge_sources",
    "sim_hybrid_rrf_search",
    "sim_hard_negatives",
    "stream_static_enrich",
    # r12 additions: TextRank is iterative-join lineage over the
    # O(vocab²)-bounded co-occurrence graph (edge build must be the
    # only data-dependent cost); novelty is two digest-keyed shuffles
    # over exploded shingles (scan-bound); its streaming twin must
    # track the other streaming ingests; MMR's greedy rounds run over
    # O(queries × pool) rows after the verified top-pool subtree (only
    # the pool scan scales); gap-fill windows over the O(types × hours)
    # aggregate; MAD is two count-map percentile passes; RFM windows
    # over the O(customers) aggregate.
    "text_textrank_keywords",
    "dedup_novelty_scores",
    "stream_novelty_ingest",
    "sim_mmr_select",
    "events_gapfill_locf",
    "events_mad_outliers",
    "orders_rfm_segments",
    # late-r12: the grouped-agg pandas UDF's Arrow group transfer is the
    # one data-dependent Python-path cost in the catalog (must stay
    # scan-bound); the eval harness is the brute-force scan + O(q×k)
    # grading; the salting pair must price within noise of their plain
    # twins (the extra exchange is on pre-aggregated/salted keys).
    "u4_grouped_agg_pandas_udf",
    "sim_retrieval_eval",
    "a13_salted_skew_agg",
    "j8_salted_skew_join",
    # r13 additions: connected components is the catalog's deepest
    # iterative-lineage entry (pointer doubling + periodic
    # localCheckpoint — per-round cost must stay flat) and was never
    # probed; the cap-cliff entry embeds a constant-size planted
    # mega-cluster in a growing corpus, so its cost must track the
    # plain capped-LSH entry, not the cluster.
    "dedup_connected_components",
    "dedup_lsh_cap_cliff_recovery",
    # r14 verdict task 4: the three slowest serial entries were the only
    # major family with no scaling exponent on record. Each runs a real
    # micro-batch loop (availableNow) whose per-batch cost must track
    # the BATCH, not the accumulated ledger/index — a merge that
    # re-scans the whole ledger per batch, or a probe that stops
    # pruning, shows up here as a growing exponent.
    "stream_dedup_exact",
    "stream_near_dup_pairs",
    "stream_ivfpq_ingest",
]

SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
_DERIVED_SF1 = Path(__file__).resolve().parents[1] / ".scaling" / "sf1"
if (_DERIVED_SF1 / "lineitem.parquet").exists():
    SFS.append(str(_DERIVED_SF1))

SUPERLINEAR = 1.15
RUNS = 3  # min-of-N per cell (one-sided-noise de-noising; see below)

# Hand-written sections below this marker in SCALING.md are carried
# over verbatim on regeneration.
MANUAL_MARKER = "<!-- MANUAL -->"


def main() -> None:
    spark = get_spark("scaling_probe")
    specs = dict(headline_queries())
    catalog = all_queries()
    for name in ITERATIVE_EXTRA:
        specs[name] = catalog[name]
    # warm every query once so measured runs are steady-state
    for spec in specs.values():
        write_noop(spec.build(spark, SFS[0]))
    # Noise discipline (r10): the shared host's effective CPU speed
    # swings up to ~2x in MULTI-MINUTE contention windows that don't
    # register as steal time (measured via bench.cpu_reference_seconds).
    # Two consequences for the probe:
    #   1. MIN, not median — contamination is strictly one-sided (noise
    #      only ever ADDS time), so the minimum is the consistent
    #      estimator of uncontended cost (the timeit doctrine); a median
    #      straddling a window fabricates SUPERLINEAR flags on linear
    #      plans (observed: minhash signatures sf1 84 s mid-window vs
    #      1.9-2.5 s quiet).
    #   2. INTERLEAVED sweeps, not back-to-back repeats — consecutive
    #      runs land in the same window, so min-of-consecutive inherits
    #      the contamination. Sweeping the whole (sf x query) grid RUNS
    #      times separates a cell's samples by many minutes; one of them
    #      lands quiet with high probability.
    samples: dict[tuple[str, str], list[float]] = {}
    # cpu_ref anchor per (run, sf) sweep: the probe's sf1 sweeps take
    # minutes, so contention windows can swallow ALL of a cell's samples
    # and survive the min — the anchors let a reader (and the flagged-
    # entry adjudication below) tell a contaminated sweep from a plan
    # change without re-running anything.
    from bench import cpu_reference_seconds

    sweep_refs: list[tuple[int | str, str, float]] = []

    def sweep(run_label: int | str, sf: str) -> float:
        ref = cpu_reference_seconds()
        sweep_refs.append((run_label, Path(sf).name, ref))
        for name, spec in specs.items():
            t0 = time.perf_counter()
            write_noop(spec.build(spark, sf))
            samples.setdefault((name, sf), []).append(
                time.perf_counter() - t0
            )
        return ref

    for run in range(RUNS):
        for sf in SFS:
            sweep(run, sf)

    # Auto-adjudication (r11): if EVERY sweep of a scale column started
    # hot (anchor >= HOT_REF), all of that column's samples may sit in
    # one contention window and the min is contaminated — exactly the
    # failure that fabricated two SUPERLINEAR flags this round. Wait
    # out the window (bounded) and take ONE extra quiet sweep of just
    # that column; if the box never quiets, the hot anchors in the
    # header document the residual risk.
    HOT_REF, QUIET_WAITS, WAIT_S = 0.45, 6, 60
    for sf in SFS:
        col = [r for lbl, name, r in sweep_refs if name == Path(sf).name]
        if min(col) < HOT_REF:
            continue
        for _ in range(QUIET_WAITS):
            if cpu_reference_seconds() < HOT_REF:
                sweep("requiet", sf)
                break
            time.sleep(WAIT_S)

    results: dict[str, list[float]] = {}
    for sf in SFS:
        for name in specs:
            results.setdefault(name, []).append(min(samples[(name, sf)]))

    n = len(SFS)
    col_names = [Path(sf).name for sf in SFS]
    derived_note = (
        " sf1 is derived from sf0.1 by `tools/make_scaled_fixture.py` (10"
        " key-offset copies; text letter-rotated and embeddings"
        " coordinate-rotated per copy so dedup/similarity densities are"
        " preserved instead of exploding)."
        if n == 4
        else ""
    )
    lines = [
        "# SCALING — headline query wall clock vs scale factor",
        "",
        "Generated by `python tools/scaling_probe.py` on local[32]; every cell",
        f"is the MIN of {RUNS} runs (host contention is one-sided noise; the",
        "minimum estimates uncontended cost — see the r10 box-noise notes in",
        "NEXT.md and the cpu_ref anchors in bench.py).",
        "",
        "Per-sweep cpu_ref anchors (quiet ≈ 0.34 s; a sweep at ≥ ~0.5 s is a",
        "contention window and its cells overstate cost — if EVERY sweep of a",
        "scale column is hot, even the min is contaminated):",
        "",
        "    "
        + "  ".join(
            (f"run{r}" if isinstance(r, int) else str(r)) + f" {sf}: {ref:.2f}"
            for r, sf, ref in sweep_refs
        ),
        "",
        "Data grows 10× per column"
        f" ({' → '.join(col_names)}, ~6k → ~6M lineitem rows at the extremes)."
        f"{derived_note}",
        "",
        "`exp` = log10(t_hi/t_lo) over the top decade (the least",
        "overhead-contaminated pair): the effective scaling exponent. exp ≪ 1 =",
        "overhead-dominated; exp ≈ 1 = scan/shuffle-bound (expected); exp >",
        f"{SUPERLINEAR} = flagged SUPERLINEAR.",
        "",
        "| query | " + " s | ".join(col_names) + " s | exp (top decade) | verdict |",
        "|---|" + "---|" * (n + 2),
    ]
    rows = []
    flagged = []
    for name, ts in results.items():
        # slope over the last decade pair, where real work dominates
        exp = (
            math.log10(ts[-1] / ts[-2])
            if ts[-2] > 0 and ts[-1] > 0
            else float("nan")
        )
        if exp > SUPERLINEAR:
            flagged.append((name, exp))
        rows.append((name, ts, exp))

    # Fresh-session adjudication (r12): twice now a SUPERLINEAR flag
    # survived quiet-ANCHORED sweeps yet vanished in a fresh session
    # (minhash signatures sf1: 7.5-11.6 s inside the aged probe session
    # vs 2.9-3.6 s fresh at cpu_ref 0.35-0.40 — in-session aging from a
    # ~600-plan sweep, not plan scaling). So the probe now re-times
    # every flagged entry in a FRESH subprocess (warm at the smallest
    # SF, then min-of-3 at the top two SFs, cpu_ref-bracketed) and
    # demotes the flag when the fresh exponent is clean on a quiet box.
    # A flag that SURVIVES this is a real plan defect by construction.
    adjudication: dict[str, tuple[float, float, float]] = {}
    if flagged and n >= 2:
        import json as _json
        import subprocess

        for name, _exp in flagged:
            script = (
                "import json, time\n"
                "from data_pipeline_with_spark_spark.session import get_spark\n"
                "from data_pipeline_with_spark_spark.plans import all_queries\n"
                "from data_pipeline_with_spark_spark.sources.writers import write_noop\n"
                "from bench import cpu_reference_seconds\n"
                f"spark = get_spark('scaling_adjudicate')\n"
                f"spec = all_queries()[{name!r}]\n"
                "ref0 = cpu_reference_seconds()\n"
                f"write_noop(spec.build(spark, {SFS[0]!r}))\n"
                "lo, hi = [], []\n"
                "for _ in range(3):\n"
                f"    t0 = time.perf_counter(); write_noop(spec.build(spark, {SFS[-2]!r})); lo.append(time.perf_counter() - t0)\n"
                "for _ in range(3):\n"
                f"    t0 = time.perf_counter(); write_noop(spec.build(spark, {SFS[-1]!r})); hi.append(time.perf_counter() - t0)\n"
                "print(json.dumps({'lo': lo, 'hi': hi, 'ref0': ref0, 'ref1': cpu_reference_seconds()}))\n"
            )
            try:
                proc = subprocess.run(
                    [sys.executable, "-c", script],
                    capture_output=True,
                    text=True,
                    timeout=900,
                    cwd=str(Path(__file__).resolve().parents[1]),
                )
                data = _json.loads(proc.stdout.strip().splitlines()[-1])
            except Exception as ex:  # noqa: BLE001 - adjudication is best-effort
                print(f"adjudication subprocess failed for {name}: {ex}")
                continue
            fexp = math.log10(min(data["hi"]) / min(data["lo"]))
            adjudication[name] = (fexp, data["ref0"], data["ref1"])

    demoted: dict[str, float] = {}
    for name, (fexp, ref0, ref1) in adjudication.items():
        if fexp <= SUPERLINEAR and max(ref0, ref1) < HOT_REF:
            demoted[name] = fexp
    flagged = [(nm, e) for nm, e in flagged if nm not in demoted]

    for name, ts, exp in rows:
        if name in demoted:
            verdict = f"aging-suspect (fresh exp {demoted[name]:.2f})"
        elif exp > SUPERLINEAR:
            verdict = "SUPERLINEAR"
        elif exp > 0.6:
            verdict = "linear-ish"
        else:
            verdict = "overhead-dom"
        cells = " | ".join(f"{t:.2f}" for t in ts)
        lines.append(f"| {name} | {cells} | {exp:.2f} | {verdict} |")
    totals = [sum(ts[i] for ts in results.values()) for i in range(n)]
    texp = math.log10(totals[-1] / totals[-2])
    cells = " | ".join(f"**{t:.2f}**" for t in totals)
    lines.append(f"| **total** | {cells} | **{texp:.2f}** | |")
    lines.append("")
    if flagged:
        lines.append("## Flagged superlinear")
        lines.append("")
        for name, exp in flagged:
            note = ""
            if name in adjudication:
                fexp, r0, r1 = adjudication[name]
                note = (
                    f" (fresh-session recheck exp {fexp:.2f} at cpu_ref"
                    f" {r0:.2f}/{r1:.2f} did NOT clear it)"
                )
            lines.append(
                f"- `{name}`: exp {exp:.2f} — investigate before scale-up.{note}"
            )
    else:
        lines.append("No query exceeds the superlinear threshold: every plan's")
        lines.append("cost is at-or-below linear in data volume over the top decade.")
    if demoted:
        lines.append("")
        lines.append("## Fresh-session adjudication")
        lines.append("")
        lines.append("In-probe flags re-timed in a fresh subprocess (warm at the")
        lines.append("smallest SF, min-of-3 at the top two SFs, cpu_ref-bracketed);")
        lines.append("a clean fresh exponent on a quiet box demotes the flag to")
        lines.append("aging-suspect — in-session JVM aging, not plan scaling:")
        lines.append("")
        for name, fexp in sorted(demoted.items()):
            _, r0, r1 = adjudication[name]
            lines.append(
                f"- `{name}`: fresh exp {fexp:.2f}"
                f" (cpu_ref {r0:.2f} -> {r1:.2f})"
            )
    lines.append("")
    # Preserve hand-written analysis: everything at or below the MANUAL
    # marker survives regeneration (a plain write_text once clobbered
    # the round-6 skew section — r7 review finding).
    out = Path("SCALING.md")
    if out.exists() and MANUAL_MARKER in (prev := out.read_text()):
        lines.append(prev[prev.index(MANUAL_MARKER):])
    out.write_text("\n".join(lines))
    # Machine-readable twin (r13 verdict task 2): the per-round bench
    # JSON carries its own sf0.1→sf1 exponents; SCALING.json gives
    # tooling the full 4-SF grid + adjudication without parsing the md.
    import json as _json

    Path("SCALING.json").write_text(
        _json.dumps(
            {
                "sfs": col_names,
                "superlinear_threshold": SUPERLINEAR,
                "queries": {
                    name: {
                        "min_sec": [round(t, 3) for t in ts],
                        "exp_top_decade": round(exp, 3),
                    }
                    for name, ts, exp in rows
                },
                "flagged": [
                    {"name": nm, "exp": round(e, 3)} for nm, e in flagged
                ],
                "demoted_aging_suspect": {
                    nm: round(e, 3) for nm, e in demoted.items()
                },
                "sweep_refs": [
                    [str(r), sf, round(ref, 4)] for r, sf, ref in sweep_refs
                ],
            },
            indent=1,
        )
    )
    print(f"wrote SCALING.md ({len(results)} queries, {n} scale points)")
    for name, exp in flagged:
        print(f"SUPERLINEAR: {name} exp={exp:.2f}")
    for name, fexp in demoted.items():
        print(f"demoted to aging-suspect: {name} fresh exp={fexp:.2f}")


if __name__ == "__main__":
    main()
