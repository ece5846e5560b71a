#!/usr/bin/env python
"""Diff COVERAGE.md's oracle-strength annotations against the live
registry (r14 verdict task 5: the a7 note said *rows-only* long after
the entry gained a bound-style oracle — mechanize the check so
annotations can't drift again).

Rules enforced:
- a name annotated ``*(rows-only...)*`` must have ``oracle is None``;
- a name annotated ``*(bound-oracle...)*`` must have an oracle;
- every registry entry with ``oracle is None`` must carry a
  ``*(rows-only...)*`` annotation somewhere in COVERAGE.md (the
  weaker check must be declared, never silent).

Exit 0 = no drift. No Spark session needed (registry import only).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from data_pipeline_with_spark_spark.plans.registry import all_queries

    specs = all_queries()
    text = (Path(__file__).resolve().parent.parent / "COVERAGE.md").read_text()

    # `name` *(rows-only...)* / `name` *(bound-oracle...)*
    annotated = re.findall(r"`([a-z0-9_]+)`\s*\*\((rows-only|bound-oracle)[^)]*\)\*", text)
    problems: list[str] = []
    rows_only_names: set[str] = set()
    for name, kind in annotated:
        if name not in specs:
            problems.append(f"{name}: annotated *({kind})* but not in the registry")
            continue
        has_oracle = specs[name].oracle is not None
        if kind == "rows-only":
            rows_only_names.add(name)
            if has_oracle:
                problems.append(
                    f"{name}: COVERAGE.md says *rows-only* but the registry has an oracle"
                )
        elif not has_oracle:
            problems.append(
                f"{name}: COVERAGE.md says *bound-oracle* but the registry oracle is None"
            )

    for name, spec in specs.items():
        if spec.oracle is None and name not in rows_only_names:
            problems.append(
                f"{name}: oracle is None but COVERAGE.md never declares it *(rows-only)*"
            )

    for p in problems:
        print(f"DRIFT {p}")
    print(f"{len(problems)} annotation drift(s) across {len(specs)} registry entries "
          f"({len(annotated)} annotations checked)")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
