"""One-pass job/stage audit over the full declared surface (r14).

For every entry: wall clock, #jobs, #stages, summed task time
(executorRunTime) and parallel efficiency = task_time / (wall * cores).
Low efficiency + many stages = latency-bound (stage-chain overhead);
high efficiency = compute-bound.  One warmed pass at $SPARK_GRAFT_SF_DIR.

Run: python tools/audit_jobs_r14.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/audit_jobs_r14.json"

    from arcane_stream_microsoft_synapse_link_spark.session import get_spark

    import __spark_entry__ as em

    spark = get_spark("audit-jobs-r14")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    queries = em.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    # warm pass (codegen + python workers)
    for name, fn in queries.items():
        try:
            fn(spark, "/root/testdata/sf0.001").collect()
        except Exception:
            pass
    for rdd in sc._jsc.getPersistentRDDs().values():
        rdd.unpersist(False)
    sc._jvm.System.gc()

    store = sc._jsc.sc().statusStore()
    _empty = sc._jvm.java.util.ArrayList()

    def job_snapshot() -> list:
        jobs = store.jobsList(None)
        return [
            (
                jobs.apply(i).jobId(),
                jobs.apply(i).stageIds().size(),
            )
            for i in range(jobs.size())
        ]

    def stage_metrics() -> dict[int, float]:
        """stageId -> executorRunTime ms (completed attempts); {} when the
        AppStatusStore signature doesn't match this Spark build."""
        out: dict[int, float] = {}
        try:
            stages = store.stagesList(_empty)
            for i in range(stages.size()):
                s = stages.apply(i)
                out[s.stageId()] = out.get(s.stageId(), 0.0) + float(s.executorRunTime())
        except Exception:
            pass
        return out

    results: dict[str, dict] = {}
    for name, fn in queries.items():
        before_jobs = {j for j, _ in job_snapshot()}
        sm0 = stage_metrics()
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).collect()
        except Exception as exc:
            results[name] = {"error": str(exc)[:120]}
            continue
        wall = time.perf_counter() - t0
        snap = job_snapshot()
        sm1 = stage_metrics()
        new_jobs = [(j, ns) for j, ns in snap if j not in before_jobs]
        task_ms = sum(v - sm0.get(k, 0.0) for k, v in sm1.items()) - sum(
            v for k, v in sm0.items() if k not in sm1
        )
        results[name] = {
            "wall_s": round(wall, 3),
            "jobs": len(new_jobs),
            "stages": sum(ns for _, ns in new_jobs),
            "task_s": round(max(task_ms, 0.0) / 1000.0, 2),
            "eff": round(max(task_ms, 0.0) / 1000.0 / (wall * cores), 3),
        }
        for rdd in sc._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    total = sum(v.get("wall_s", 0) for v in results.values())
    print(json.dumps({"entries": len(results), "total_wall_s": round(total, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
