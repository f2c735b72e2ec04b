"""Run-to-run stability check: execute the first N registry entries TWICE
in one session and compare Spark-side value hashes — catches partition-order
nondeterminism (windows missing unique tiebreakers, per-run sampled range
boundaries, driver-side dict ordering).

Usage: python tools/stability_check.py [N] [SF_DIR]

q_c16_query_progress is excluded by nature (wall-clock telemetry).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EXCLUDE = {"q_c16_query_progress"}


def _hash(df) -> str:
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            # round-then-add-0.0 collapses the whole (-5e-7, 5e-7) band to
            # '0.000000' on both sides (ADVICE r8: bare `x + 0.0` only fixed
            # exact -0.0 — a -1e-7 vs +1e-7 jitter pair still straddled the
            # sign); comparison granularity is 6dp by construction.
            pdf[c] = pdf[c].map(lambda x: f"{round(x, 6) + 0.0:.6f}")
        else:
            pdf[c] = pdf[c].astype(str)
    return hashlib.md5(
        "\n".join(
            sorted(map("|".join, pdf.itertuples(index=False, name=None)))
        ).encode()
    ).hexdigest()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 66
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from spark_multiboost_spark.registry import all_queries
    from spark_multiboost_spark.session import get_spark

    spark = get_spark("stability_check")
    qs = all_queries()
    names = [x for x in list(qs)[:n] if x not in EXCLUDE]
    unstable: dict[str, tuple[str, str]] = {}
    for i, name in enumerate(names):
        if i and i % 25 == 0:
            spark.catalog.clearCache()
            try:
                from spark_multiboost_spark.plans import release_outstanding

                release_outstanding()
            except ImportError:
                pass
        a = _hash(qs[name].fn(spark, sf_dir))
        b = _hash(qs[name].fn(spark, sf_dir))
        status = "stable" if a == b else "UNSTABLE"
        if a != b:
            unstable[name] = (a, b)
        print(f"[{i + 1}/{len(names)}] {name}: {status}", flush=True)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n": len(names),
                "stable": len(names) - len(unstable),
                "unstable": sorted(unstable),
            }
        )
    )


if __name__ == "__main__":
    main()
