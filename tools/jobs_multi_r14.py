"""Per-job attribution for several entries in ONE session (r14 pass 3).

For each entry: wall, job count, summed job seconds (the gap to wall is
driver-side planning/AQE), and the biggest jobs with stage/task counts.

Run: python tools/jobs_multi_r14.py entry [entry...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def steal_s() -> float:
    try:
        with open("/proc/stat") as fh:
            return int(fh.readline().split()[8]) / 100.0
    except (OSError, ValueError, IndexError):
        return 0.0


def main() -> None:
    names = sys.argv[1:]
    from arcane_stream_microsoft_synapse_link_spark.session import get_spark

    import __spark_entry__ as em

    spark = get_spark("jobs-multi")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    queries = em.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    for name in names:
        q = queries[name]
        q(spark, "/root/testdata/sf0.001").collect()  # warm
        q(spark, sf_dir).collect()
        for rdd in list(sc._jsc.getPersistentRDDs().values()):
            rdd.unpersist(False)
        sc._jvm.System.gc()

        store = sc._jsc.sc().statusStore()
        jl = store.jobsList(None)
        before = {jl.apply(i).jobId() for i in range(jl.size())}
        st0 = steal_s()
        t0 = time.perf_counter()
        q(spark, sf_dir).collect()
        wall = time.perf_counter() - t0
        st = steal_s() - st0
        jl = store.jobsList(None)
        rows = []
        for i in range(jl.size()):
            j = jl.apply(i)
            if j.jobId() in before:
                continue
            sub, comp = j.submissionTime(), j.completionTime()
            dur = None
            if sub.isDefined() and comp.isDefined():
                dur = (comp.get().getTime() - sub.get().getTime()) / 1000.0
            rows.append((j.jobId(), dur or 0.0, j.stageIds().size(), j.numTasks()))
        rows.sort()
        tot = sum(r[1] for r in rows)
        print(
            f"\n== {name}: wall={wall:.2f}s steal={st:.1f} jobs={len(rows)} "
            f"sum_job_s={tot:.2f} driver_gap={wall - tot:.2f}"
        )
        for jid, dur, nst, ntk in sorted(rows, key=lambda r: -r[1])[:8]:
            print(f"   job {jid}: {dur:5.2f}s stages={nst} tasks={ntk}")


if __name__ == "__main__":
    main()
