"""Profile where a query's wall time goes: plan construction (Python),
analysis+optimization (driver, single-threaded), and execution — with
per-stage task metrics pulled from the local UI REST API so executor
compute vs scheduling overhead vs shuffle are attributable.

Usage: python tools/profile_query.py q_name [q_name2 ...] [--sf SF_DIR]
Run from /tmp.  Prints one block per query; repeats each execution twice
(cold plan + warm plan) so codegen/planning cost separates from stage cost.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "6g")

SF_DIR = "/root/testdata/sf0.1"
names = []
args = sys.argv[1:]
i = 0
while i < len(args):
    if args[i] == "--sf":
        SF_DIR = args[i + 1]
        i += 2
    else:
        names.append(args[i])
        i += 1


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def main() -> None:
    from spark_multiboost_spark.registry import queries
    from spark_multiboost_spark.session import get_spark, warm_cache

    # the package session disables the UI; this profiler needs the REST API,
    # so it builds its own session with get_spark's exact configs + UI on
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "5000")
        .config("spark.ui.retainedJobs", "5000")
        .getOrCreate()
    )
    assert get_spark  # config parity documented above; not used directly
    warm_cache(spark, SF_DIR)
    qs = queries()
    sc = spark.sparkContext
    base = sc.uiWebUrl + "/api/v1/applications/" + sc.applicationId

    _CLK = os.sysconf("SC_CLK_TCK")

    def _cpu(pid: int) -> float:
        total = 0.0
        children: dict[int, list[int]] = {}
        for p in os.listdir("/proc"):
            if p.isdigit():
                try:
                    with open(f"/proc/{p}/stat") as f:
                        fl = f.read().rsplit(")", 1)[1].split()
                    children.setdefault(int(fl[1]), []).append(int(p))
                except (OSError, IndexError, ValueError):
                    pass
        stack = [pid]
        while stack:
            q = stack.pop()
            try:
                with open(f"/proc/{q}/stat") as f:
                    fl = f.read().rsplit(")", 1)[1].split()
                total += (int(fl[9 + 2]) + int(fl[10 + 2])) / _CLK
            except (OSError, IndexError, ValueError):
                continue
            stack.extend(children.get(q, []))
        return total

    jvm_pid = sc._gateway.proc.pid

    for name in names:
        fn = qs[name]
        print(f"\n=== {name} ===")
        for rep in ("cold", "warm1", "warm2"):
            jobs_before = {j["jobId"] for j in _api(base, "/jobs")}
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t_build = time.perf_counter() - t0
            c0 = _cpu(jvm_pid)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_exec = time.perf_counter() - t0
            dcpu = _cpu(jvm_pid) - c0
            jobs = [
                j
                for j in _api(base, "/jobs")
                if j["jobId"] not in jobs_before
            ]
            n_stages = sum(len(j["stageIds"]) for j in jobs)
            n_tasks = sum(j["numTasks"] for j in jobs)
            print(
                f"[{rep}] build={t_build:.3f}s exec={t_exec:.3f}s "
                f"cpu={dcpu:.1f}s jobs={len(jobs)} stages={n_stages} "
                f"tasks={n_tasks}"
            )
            if rep == "warm2":
                # per-stage wall from submission->completion plus task time
                stages = _api(base, "/stages?status=complete")
                sids = {s for j in jobs for s in j["stageIds"]}
                mine = [s for s in stages if s["stageId"] in sids]
                mine.sort(key=lambda s: -(s.get("executorRunTime") or 0))
                tot_run = sum(s.get("executorRunTime") or 0 for s in mine)
                print(
                    f"  stage executorRunTime total={tot_run/1e3:.2f}s "
                    f"over {len(mine)} stages; top:"
                )
                for s in mine[:8]:
                    sub = s.get("submissionTime", "")
                    comp = s.get("completionTime", "")
                    print(
                        f"   stage {s['stageId']:4d} tasks={s['numTasks']:4d} "
                        f"run={s.get('executorRunTime',0)/1e3:7.2f}s "
                        f"cpu={s.get('executorCpuTime',0)/1e9:7.2f}s "
                        f"sched=({sub[-12:]}->{comp[-12:]}) "
                        f"{(s.get('name') or '')[:50]}"
                    )
        from spark_multiboost_spark import plans

        plans.release_outstanding()
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
