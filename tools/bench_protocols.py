"""One-session dual-protocol bench: re-anchor the baseline (VERDICT r5 item 3).

Rounds 1-4 timed the frozen 17-query headline with BACK-TO-BACK per-query
sampling (v2: one warm-up then 3 consecutive timed runs per query); round 5
switched to INTERLEAVED passes (v3: 3 timed passes over the whole set,
median per query across passes) and simultaneously recorded a 1.55x ratio
vs the r1 baseline — leaving protocol change and real regression
confounded.  This tool measures BOTH protocols in ONE session, alternating
blocks (v2, v3, v2, v3) so multi-minute host phases hit both protocols
symmetrically, and prints one JSON line with both totals plus calibration
probes before/between/after.

The published re-anchor: frozen protocol = v3; restated baseline =
r1_baseline * median(v3_total / v2_total).  Results land in SCALING.md and
BASELINE.md; bench.py emits the restated number every round.

Usage: python tools/bench_protocols.py   (env as bench.py)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _calibrate(spark) -> dict[str, float]:
    import numpy as np

    a = np.random.default_rng(0).random((1500, 1500))
    cal_np = []
    for _ in range(3):
        t = time.perf_counter()
        a @ a
        cal_np.append(time.perf_counter() - t)
    cal_sp = []
    rng = spark.range(0, 5_000_000, 1, 32)
    for _ in range(3):
        t = time.perf_counter()
        rng.groupBy((rng.id % 1024).alias("k")).count().write.format("noop").mode(
            "overwrite"
        ).save()
        cal_sp.append(time.perf_counter() - t)
    return {
        "numpy_matmul_1500_sec": round(statistics.median(cal_np), 4),
        "spark_shuffle_5m_sec": round(statistics.median(cal_sp), 4),
    }


def main() -> None:
    from bench import HEADLINE

    from spark_multiboost_spark import plans
    from spark_multiboost_spark.registry import queries
    from spark_multiboost_spark.session import get_spark, warm_cache

    spark = get_spark("smb-bench-protocols")
    warm_cache(spark, SF_DIR)
    qs = queries()

    def run_one(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # global warm pass (protocol condition: warm session for query #1 too)
    for name in HEADLINE:
        run_one(name)
    plans.release_outstanding()

    def block_v2() -> dict[str, float]:
        # back-to-back: 1 warm-up + 3 consecutive timed runs per query
        out = {}
        for name in HEADLINE:
            run_one(name)  # per-query warm-up, discarded
            out[name] = statistics.median(run_one(name) for _ in range(3))
            plans.release_outstanding()
        return {n: round(v, 4) for n, v in out.items()}

    def block_v3() -> dict[str, float]:
        # interleaved: 1 warm-up pass + 3 timed passes over the whole set
        runs: dict[str, list[float]] = {n: [] for n in HEADLINE}
        for p in range(4):
            for name in HEADLINE:
                dt = run_one(name)
                if p > 0:
                    runs[name].append(dt)
            plans.release_outstanding()
        return {n: round(statistics.median(v), 4) for n, v in runs.items()}

    cals = [_calibrate(spark)]
    blocks = []
    for proto in ("v2", "v3", "v2", "v3"):
        t0 = time.perf_counter()
        timings = block_v2() if proto == "v2" else block_v3()
        blocks.append(
            {
                "protocol": proto,
                "total_sec": round(sum(timings.values()), 4),
                "block_wall_sec": round(time.perf_counter() - t0, 2),
                "queries": timings,
            }
        )
        cals.append(_calibrate(spark))

    v2_totals = [b["total_sec"] for b in blocks if b["protocol"] == "v2"]
    v3_totals = [b["total_sec"] for b in blocks if b["protocol"] == "v3"]
    ratio = statistics.median(v3_totals) / statistics.median(v2_totals)
    r1_baseline = 6.715  # BENCH_r01.json total, protocol v1/v2 family
    print(
        json.dumps(
            {
                "sf": SF_DIR,
                "v2_totals_sec": v2_totals,
                "v3_totals_sec": v3_totals,
                "v3_over_v2": round(ratio, 4),
                "r1_baseline_sec": r1_baseline,
                "restated_v3_baseline_sec": round(r1_baseline * ratio, 4),
                "calibration_probes": cals,
                "blocks": blocks,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
