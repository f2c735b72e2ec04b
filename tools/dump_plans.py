"""Dump .explain("formatted") for benched queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> [name ...]
  tag     e.g. r13  -> writes under plans/r13/
  suffix  e.g. before | after
  names   query names; default = bench.py HEADLINE + SHOWCASE

The optimization-round judge checks plan claims against these files
(OPTIMIZATION_r13.md); regenerate the _after files whenever a benched
query's body changes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench

        names = bench.HEADLINE + bench.SHOWCASE
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from spark_multiboost_spark.registry import queries
    from spark_multiboost_spark.session import get_spark, warm_cache

    spark = get_spark("smb-dump-plans")
    warm_cache(spark, SF_DIR)
    qs = queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"dump_plans: {name}")
        try:
            df = qs[name](spark, SF_DIR)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - record the failure in the file
            plan = f"ERROR building/explaining {name}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} ({suffix}, {SF_DIR})\n")
            f.write(plan)
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
