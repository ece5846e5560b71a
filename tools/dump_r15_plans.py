"""Dump per-query formatted plans for the optimization round.

Usage: python tools/dump_r15_plans.py <outdir> <suffix> [query ...]

Writes <outdir>/<query>_<suffix>.txt with the formatted physical plan of
each named query (default: all headline queries) built against
/root/testdata/sf0.1 — the bench's scale factor, so join-strategy
estimates match what the bench runs.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_pipeline_with_spark_spark.plans import all_queries, headline_queries
from data_pipeline_with_spark_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    outdir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:]
    outdir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump_r15_plans")
    catalog = all_queries()
    specs = (
        {n: catalog[n] for n in names} if names else headline_queries()
    )
    for name, spec in specs.items():
        df = spec.build(spark, SF_DIR)
        (outdir / f"{name}_{suffix}.txt").write_text(formatted_plan(df) + "\n")
        print(f"wrote {name}_{suffix}.txt", flush=True)


if __name__ == "__main__":
    main()
