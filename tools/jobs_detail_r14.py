"""Per-job attribution for one entry: job id, duration, #stages, and the
job's call-site description — which plan pieces cost which jobs.

Run: python tools/jobs_detail_r14.py <entry> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from arcane_stream_microsoft_synapse_link_spark.session import get_spark

    import __spark_entry__ as em

    spark = get_spark("jobs-detail")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    q = em.queries()[name]
    # warm
    q(spark, "/root/testdata/sf0.001").collect()
    q(spark, sf_dir).collect()
    for rdd in sc._jsc.getPersistentRDDs().values():
        rdd.unpersist(False)
    sc._jvm.System.gc()

    store = sc._jsc.sc().statusStore()
    jl = store.jobsList(None)
    before = {jl.apply(i).jobId() for i in range(jl.size())}
    t0 = time.perf_counter()
    q(spark, sf_dir).collect()
    wall = time.perf_counter() - t0
    jl = store.jobsList(None)
    rows = []
    for i in range(jl.size()):
        j = jl.apply(i)
        if j.jobId() in before:
            continue
        sub = j.submissionTime()
        comp = j.completionTime()
        dur = None
        try:
            if sub.isDefined() and comp.isDefined():
                dur = (comp.get().getTime() - sub.get().getTime()) / 1000.0
        except Exception:
            pass
        desc = ""
        try:
            d = j.description()
            desc = d.get() if d.isDefined() else ""
        except Exception:
            pass
        rows.append((j.jobId(), dur, j.stageIds().size(), j.numTasks(), desc[:110]))
    rows.sort()
    print(f"{name}: wall={wall:.2f}s jobs={len(rows)} sum_job_s={sum(r[1] or 0 for r in rows):.2f}")
    for jid, dur, nst, nt, desc in rows:
        print(f"  job {jid}: {dur if dur is not None else '?':>5}s stages={nst} tasks={nt} {desc}")
    spark.stop()


if __name__ == "__main__":
    main()
