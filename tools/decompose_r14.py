"""Per-entry cost decomposition probe (optimization round 14).

Splits one timed run of each named entry into:
  - build_s:   calling the query builder (py4j traffic + eager analyzer
               passes per DataFrame op + any .first()/collect the builder
               itself performs)
  - exec_s:    .collect() on the built DataFrame (optimizer + physical
               planning + codegen + execution + result pickup)
  - jobs/stages/tasks: scheduler work per run (AppStatusStore deltas) —
               stage count is the latency proxy at local scale.

Run: python tools/decompose_r14.py [--runs N] name...   (default: a
representative cheap/expensive mix).  Prints one TSV line per entry with
median values over N runs (default 3) plus per-run steal evidence.
"""

from __future__ import annotations

import os
import statistics
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
    args = sys.argv[1:]
    runs = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1

    from arcane_stream_microsoft_synapse_link_spark.session import get_spark

    import __spark_entry__ as em

    spark = get_spark("decompose-r14")
    spark.sparkContext.setLogLevel("ERROR")
    queries = em.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not names:
        names = [
            "ops_salted_distinct", "ops_mixture_apply", "q31_stats_aggs",
            "ops_minhash_near_dup", "ops_incremental_dedup", "ops_pmi_collocations",
        ]
    bad = [n for n in names if n not in queries]
    if bad:
        raise SystemExit(f"unknown entries: {bad}")

    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()

    def counts() -> tuple[int, int]:
        jobs = store.jobsList(None)
        njobs = jobs.size()
        nstages = sum(
            jobs.apply(i).stageIds().size() for i in range(njobs)
        )
        return njobs, nstages

    # warm every named entry once at sf0.001 then once at target scale so
    # codegen/worker startup isn't charged to run 1
    for n in names:
        for d in ("/root/testdata/sf0.001", sf_dir):
            try:
                queries[n](spark, d).collect()
            except Exception:
                pass
    for rdd in sc._jsc.getPersistentRDDs().values():
        rdd.unpersist(False)
    sc._jvm.System.gc()

    print("entry\tbuild_s\texec_s\ttotal_s\tjobs\tstages\tsteals")
    for n in names:
        builds, execs, steals = [], [], []
        jobs0 = stages0 = 0
        jobs = stages = 0
        for r in range(runs):
            s0 = steal_s()
            jobs0, stages0 = counts()
            t0 = time.perf_counter()
            df = queries[n](spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            jobs, stages = counts()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            steals.append(round(steal_s() - s0, 1))
            for rdd in sc._jsc.getPersistentRDDs().values():
                rdd.unpersist(False)
        b = statistics.median(builds)
        e = statistics.median(execs)
        print(
            f"{n}\t{b:.3f}\t{e:.3f}\t{b + e:.3f}"
            f"\t{jobs - jobs0}\t{stages - stages0}\t{steals}"
        )
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
