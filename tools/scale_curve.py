"""Scale-curve runner (SCALING.md §8c protocol): time the seven flagship
queries at each given SF dir in ONE warm session — median-of-3 after one
warm-up run, noop sink, local[$SPARK_GRAFT_CPUS].

Usage: python tools/scale_curve.py [--queries q1,q2,...] DIR [DIR ...]
e.g.   python tools/scale_curve.py /root/testdata/sf0.1 .scaledata/sf1.0
       python tools/scale_curve.py --queries q_d4_bpe_train,q_ext_kcore_bucketed \
           /root/testdata/sf0.1 .scaledata/sf1.0
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

FLAGSHIPS = [
    "q_b11_pricing_summary",
    "q_b05_join_revenue_by_priority",
    "q_d1_exact_dedup",
    "q_d2_minhash_lsh",
    "q_d3_topk_cosine",
    "q_a5_stump_z",
    "q_ext_pagerank",
]


def main() -> None:
    argv = sys.argv[1:]
    names = FLAGSHIPS
    if argv and argv[0] == "--queries":
        names = argv[1].split(",")
        argv = argv[2:]
    dirs = argv or ["/root/testdata/sf0.1"]
    from spark_multiboost_spark.session import get_spark, warm_cache
    from spark_multiboost_spark.registry import queries

    spark = get_spark("scale_curve")
    qs = queries()
    out: dict[str, dict[str, float]] = {}
    for d in dirs:
        warm_cache(spark, d)
        for name in names:  # untimed global warm pass
            qs[name](spark, d).write.format("noop").mode("overwrite").save()
        row = {}
        for name in names:
            ts = []
            for _ in range(3):
                t0 = time.time()
                qs[name](spark, d).write.format("noop").mode("overwrite").save()
                ts.append(time.time() - t0)
            row[name] = round(statistics.median(ts), 3)
            print(d, name, row[name], flush=True)
        out[d] = row
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
