"""Strict oracle check + sf0.1 timing for a named set of entries —
the per-change verification loop of the r14 optimization round.

Run: python tools/check_entries_r14.py name... [--runs N] [--no-time]
Oracle-compares each entry strict at sf0.001 and sf0.01 (the gate
scales; ORACLE_SF-pinned entries at their pinned scale exactly like the
driver), then times N runs at sf0.1 with per-run steal.
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
    do_time = True
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--no-time":
            do_time = False; i += 1
        else:
            names.append(args[i]); i += 1

    from arcane_stream_microsoft_synapse_link_spark.session import get_spark
    from arcane_stream_microsoft_synapse_link_spark.plans import ORACLE_SF
    from tests.oracle_harness import compare

    import __spark_entry__ as em

    spark = get_spark("check-r14")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    queries = em.queries()
    oracle = em.oracle_sql()
    fails = 0
    for n in names:
        if n not in queries:
            print(f"UNKNOWN {n}"); fails += 1
            continue
        for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            pinned = ORACLE_SF.get(n)
            d = pinned or sf_dir
            ok, msg = compare(spark, d, queries[n], oracle[n], strict=True)
            print(f"{'PASS' if ok else 'FAIL'} {n} @ {os.path.basename(d)} {msg[:300]}")
            if not ok:
                fails += 1
            if pinned:
                break
        for rdd in sc._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)

    if do_time and not fails:
        # warm then time at sf0.1
        for n in names:
            try:
                queries[n](spark, "/root/testdata/sf0.001").collect()
                queries[n](spark, "/root/testdata/sf0.1").collect()
            except Exception:
                pass
        for rdd in sc._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        sc._jvm.System.gc()
        store = sc._jsc.sc().statusStore()

        def njobs() -> int:
            return store.jobsList(None).size()

        for n in names:
            walls, steals = [], []
            j0 = j1 = 0
            for _ in range(runs):
                s0 = steal_s()
                j0 = njobs()
                t0 = time.perf_counter()
                queries[n](spark, "/root/testdata/sf0.1").collect()
                walls.append(time.perf_counter() - t0)
                j1 = njobs()
                steals.append(round(steal_s() - s0, 1))
                for rdd in sc._jsc.getPersistentRDDs().values():
                    rdd.unpersist(False)
            print(
                f"TIME {n} median={statistics.median(walls):.2f}s "
                f"runs={[round(w, 2) for w in walls]} steal={steals} jobs={j1 - j0}"
            )
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
