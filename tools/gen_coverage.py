"""Generate COVERAGE.md: one row per registered query — the SURVEY.md §2
crosswalk the correctness gate runs against. Regenerate after adding
operators:  python tools/gen_coverage.py > COVERAGE.md
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_multiboost_spark.registry import all_queries  # noqa: E402

GROUP_TITLES = {
    "A": "Group A — reference capabilities (AdaBoost.MH building blocks)",
    "B": "Group B — relational surface",
    "C": "Group C — streaming",
    "D": "Group D — LLM-pipeline extensions",
    "E": "Group E — engine/ops extensions (lakehouse, layout, time-series)",
}


def main() -> None:
    qs = all_queries()
    by_group: dict[str, list] = {}
    for q in qs.values():
        by_group.setdefault(q.group, []).append(q)

    print("# COVERAGE — registered queries vs SURVEY.md §2 (generated)\n")
    print(f"{len(qs)} queries; {sum(1 for q in qs.values() if q.oracle)} with "
          "exact DuckDB oracles, the rest rows-only (iterative/streaming/"
          "engine-specific per SURVEY §2).\n")
    print("Regenerate: `python tools/gen_coverage.py > COVERAGE.md`\n")
    print("Renamed (VERDICT r11 item 5): `q_d3_ivf_ann_arrow` (checked in "
          "CORRECTNESS_r01–r03) became the headline `q_d3_ivf_ann` in r5; "
          "the duplicate registration was dropped in r7. The declarative "
          "plan is `q_d3_ivf_ann_catalyst`. No evidence was lost — the name "
          "moved.\n")
    # every group present in the registry gets a section; missing a new
    # group letter here once silently dropped 9 rows from the audit table
    for g in sorted(set(list("ABCDE")) | set(by_group)):
        rows = sorted(by_group.get(g, []), key=lambda q: q.name)
        print(f"## {GROUP_TITLES.get(g, f'Group {g}')} ({len(rows)})\n")
        print("| query | oracle | source | summary |")
        print("|---|---|---|---|")
        for q in rows:
            fn = inspect.unwrap(q.fn)
            src = os.path.relpath(inspect.getsourcefile(fn), os.getcwd())
            line = inspect.getsourcelines(fn)[1]
            doc = (q.doc or "").split("\n")[0].strip().rstrip(".")
            kind = "SQL" if q.oracle else "rows"
            print(f"| `{q.name}` | {kind} | `{src}:{line}` | {doc} |")
        print()


if __name__ == "__main__":
    main()
