"""8-vs-32-core adjudication drill (r13, VERDICT items 6/8).

For each named query: warm min-of-N wall time plus per-run job count and
total task count (status tracker), so "anti-scaling" can be split into
(a) genuinely contended parallel work vs (b) fixed scheduling overhead
on more, smaller tasks. Honors $SPARK_GRAFT_CPUS / $SPARK_GRAFT_SF_DIR.

Usage: python tools/drill_scaling.py [--runs N] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from modware_loader_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    runs = 3
    argv = sys.argv[1:]
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        del argv[i : i + 2]
    names = argv
    spark = get_spark("drill-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    # warm-ups (mirror bench.py: JVM codegen + Python worker fork)
    qs["q1_pricing_summary"](spark, SF_DIR).count()
    spark.range(sc.defaultParallelism).repartition(
        sc.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").count()

    def sweep() -> None:
        for rdd in list(sc._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
        spark.catalog.clearCache()

    out = {}
    for name in names:
        qs[name](spark, SF_DIR).count()  # cold / memo fill
        sweep()
        samples, jobs, tasks = [], [], []
        for _ in range(runs):
            before_jobs = set(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).count()
            samples.append(round(time.perf_counter() - t0, 3))
            new_jobs = [
                j for j in (tracker.getJobIdsForGroup(None) or [])
                if j not in before_jobs
            ]
            ntasks = 0
            for j in new_jobs:
                ji = tracker.getJobInfo(j)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None:
                        ntasks += si.numTasks
            jobs.append(len(new_jobs))
            tasks.append(ntasks)
            sweep()
        out[name] = {
            "cpus": sc.defaultParallelism,
            "warm": min(samples),
            "samples": samples,
            "jobs": jobs,
            "tasks": tasks,
        }
        print(f"{name}: warm={min(samples)} samples={samples} jobs={jobs} tasks={tasks}")
    tag = os.environ.get("SPARK_GRAFT_DRILL_TAG", str(sc.defaultParallelism))
    path = f"/tmp/drill_scaling_c{tag}.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
