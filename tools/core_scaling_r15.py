"""Why does the 8-core bench beat the 32-core bench at sf0.1? (VERDICT
r14 item 6.)  Runs the worst c32/c8 inversion entries under the current
$SPARK_GRAFT_CPUS and records, per entry: wall clock, #jobs, #tasks,
sum of task executorRunTime (the actual compute), scheduler-delay sum,
and GC time — from the status store.  Run once with SPARK_GRAFT_CPUS=32
and once with 8; compare: if executorRunTime is ~equal while wall and
task counts diverge, the inversion is per-task scheduling overhead on
tiny partitions (small-SF property), not serial plans.

Run: SPARK_GRAFT_UI=true SPARK_GRAFT_CPUS=N python tools/core_scaling_r15.py [entry ...]
Appends one JSON line per entry to CORE_SCALING_R15.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT = [
    "ops_hybrid_retrieval",
    "ops_span_dedup",
    "ops_tfidf_top_terms",
    "ops_minhash_near_dup",
    "ops_incremental_dedup",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    from arcane_stream_microsoft_synapse_link_spark.session import get_spark

    import __spark_entry__ as em

    spark = get_spark("core-scaling-r15")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    queries = em.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # prime Python workers + codegen
    import pandas as pd  # noqa: F401

    spark.range(32).repartition(32).mapInPandas(lambda it: it, schema="id long").count()

    store = sc._jsc.sc().statusStore()
    import urllib.request

    ui = sc.uiWebUrl
    app_id = sc.applicationId

    def stage_totals():
        """Sum completed-stage task metrics from the local UI REST API."""
        out = {"tasks": 0, "run_ms": 0, "gc_ms": 0, "sched_ms": 0, "stages": 0}
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete") as r:
            stages = json.load(r)
        for st in stages:
            out["stages"] += 1
            out["tasks"] += st["numCompleteTasks"]
            out["run_ms"] += st["executorRunTime"]
            out["gc_ms"] += st["jvmGcTime"]
            out["sched_ms"] += st["executorDeserializeTime"]
        return out

    results = []
    for name in names:
        fn = queries[name]
        try:
            fn(spark, "/root/testdata/sf0.001").collect()  # warm
            fn(spark, sf_dir).collect()  # warm at scale
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: warmup failed {exc}")
            continue
        for rdd in sc._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        base = stage_totals()
        jl = store.jobsList(None)
        jobs_before = jl.size()
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        wall = time.perf_counter() - t0
        after = stage_totals()
        jl = store.jobsList(None)
        rec = {
            "entry": name,
            "cpus": cpus,
            "wall_s": round(wall, 3),
            "n_jobs": jl.size() - jobs_before,
            "n_stages": after["stages"] - base["stages"],
            "n_tasks": after["tasks"] - base["tasks"],
            "task_run_s": round((after["run_ms"] - base["run_ms"]) / 1000.0, 3),
            "task_deser_s": round((after["sched_ms"] - base["sched_ms"]) / 1000.0, 3),
            "gc_s": round((after["gc_ms"] - base["gc_ms"]) / 1000.0, 3),
        }
        for rdd in sc._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        results.append(rec)
        print(json.dumps(rec), flush=True)
    with open(os.path.join(REPO, "CORE_SCALING_R15.jsonl"), "a") as fh:
        for rec in results:
            fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
