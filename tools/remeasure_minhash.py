"""Re-measure the q_d2_minhash_lsh sf0.1 -> sf1.0 scale ratio (VERDICT r5
item 4: the 14.4x-for-10x-data outlier in SCALING.md §8c-bis; resolution in
§8g).

Protocol: ONE session; each timed round runs
[numpy matmul probe, JVM shuffle probe, warm_cache+minhash@sf0.1,
warm_cache+minhash@sf1.0] so a host slow-phase inflates the probes alongside
the query.  warm_cache is RE-RUN (untimed) at every dir switch: the session
table cache (session.py::_TABLE_CACHE) holds ONE sf_dir, so naive
interleaving silently reverts the other dir to raw un-fanned scans — the
documents table then serializes its shingle/md5 compute onto one core and
the measurement is of the wrong plan (this bug produced a bogus first
re-measure; §8g).  Medians over N rounds; prints one JSON line.

Usage: python tools/remeasure_minhash.py [ROUNDS=5]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF10 = os.path.join(REPO, ".scaledata", "sf1.0")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import numpy as np

    from spark_multiboost_spark import plans
    from spark_multiboost_spark.registry import queries
    from spark_multiboost_spark.session import get_spark, warm_cache

    spark = get_spark("remeasure_minhash")
    q = queries()["q_d2_minhash_lsh"]
    mat = np.random.default_rng(0).random((1500, 1500))
    rng = spark.range(0, 5_000_000, 1, 32)

    def run(sf_dir: str) -> float:
        warm_cache(spark, sf_dir)  # untimed: restore this dir's fanned-out
        # cached base tables after the other dir displaced them
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm-up
        t = time.perf_counter()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t
        plans.release_outstanding()
        return dt

    run(SF01)
    run(SF10)

    samples: dict[str, list[float]] = {"numpy": [], "shuffle": [], "sf0.1": [], "sf1.0": []}
    for _ in range(rounds):
        t = time.perf_counter()
        mat @ mat
        samples["numpy"].append(time.perf_counter() - t)
        t = time.perf_counter()
        rng.groupBy((rng.id % 1024).alias("k")).count().write.format("noop").mode(
            "overwrite"
        ).save()
        samples["shuffle"].append(time.perf_counter() - t)
        samples["sf0.1"].append(run(SF01))
        samples["sf1.0"].append(run(SF10))
        print(
            {k: round(v[-1], 3) for k, v in samples.items()},
            file=sys.stderr,
            flush=True,
        )

    med = {k: round(statistics.median(v), 4) for k, v in samples.items()}
    med["ratio_sf10_over_sf01"] = round(med["sf1.0"] / med["sf0.1"], 2)
    med["rounds"] = rounds
    print(json.dumps(med))
    spark.stop()


if __name__ == "__main__":
    main()
