"""Aggregate a round's bench.py runs into tools/bench_cpu_r{N}.json — the
per-round CPU/wall medians the cross-round comparison reads (NEXT.md
invariant: the driver's BENCH artifact tail-truncates the per-query maps
and /tmp does not survive forever, so the medians must land in the repo
before session end).

Usage: python tools/agg_bench_cpu.py rN /tmp/bench_rN_run*.json
Writes tools/bench_cpu_rN.json with the same shape as bench_cpu_r12.json:
source, session_ratios, cpu_total_sec, shuffle_stamps,
queries_cpu_sec_median, queries_wall_sec_median.
"""

from __future__ import annotations

import json
import os
import statistics
import sys


def main() -> None:
    tag, paths = sys.argv[1], sys.argv[2:]
    runs = []
    for p in paths:
        with open(p) as f:
            txt = f.read()
        # bench.py emits ONE JSON line (possibly preceded by progress lines)
        line = [ln for ln in txt.splitlines() if ln.startswith("{")][-1]
        runs.append(json.loads(line))
    cpu_keys = sorted({k for r in runs for k in r.get("queries_cpu_sec", {})})
    wall_keys = sorted({k for r in runs for k in {**r.get("queries", {}), **r.get("extra_queries", {})}})

    def med(vals):
        return round(statistics.median(vals), 4) if vals else None

    out = {
        "source": (
            f"median over the {len(runs)} full bench.py outputs of the "
            f"round-{tag.lstrip('r')} session (/tmp/bench_{tag}_run1..{len(runs)}.json)"
        ),
        "session_ratios": [r["summary"]["vs_restated_baseline"] for r in runs],
        "cpu_total_sec": [r["summary"]["cpu_total_sec"] for r in runs],
        "shuffle_stamps": [
            # median in-run headline stamp: the warm-JVM shuffle reading the
            # cross-round wall comparison keys on (NEXT.md invariant)
            round(
                statistics.median(
                    p["spark_shuffle_5m_sec"]
                    for p in r.get("pass_probes", [])
                    if p.get("set") == "headline"
                ),
                4,
            )
            for r in runs
        ],
        "queries_cpu_sec_median": {
            k: med([r["queries_cpu_sec"][k] for r in runs if k in r.get("queries_cpu_sec", {})])
            for k in cpu_keys
        },
        "queries_wall_sec_median": {
            k: med(
                [
                    {**r.get("queries", {}), **r.get("extra_queries", {})}[k]
                    for r in runs
                    if k in r.get("queries", {}) or k in r.get("extra_queries", {})
                ]
            )
            for k in wall_keys
        },
    }
    dst = os.path.join(os.path.dirname(os.path.abspath(__file__)), f"bench_cpu_{tag}.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", dst, "ratios:", out["session_ratios"])


if __name__ == "__main__":
    main()
