"""Root-cause harness for the multi-entity CDC bench variance (VERDICT
r12 item 2): identical-code attempts of the 8-runner tick spanned 2.7×
across rounds ([7599, 4538, 2795] r12; [9327, 1461, 4481] r11).

Decomposition per attempt, from the JVM AppStatusStore + GC MX beans:

- ``wall_s``           — what the bench reports (rate = rows / wall)
- ``task_time_s``      — Σ successful-task durations across the attempt's
                         jobs: the actual distributed work
- ``jvm_occupancy``    — task_time / (wall × 32 slots): how busy the
                         executor pool was
- ``gc_delta_s``       — JVM GC time accumulated during the attempt
- ``driver_gap_s``     — wall − (task_time / 32): time NOT explained by
                         task execution even at perfect packing — driver
                         orchestration (py4j round-trips from 8 Python
                         threads under one GIL, job submission, commit
                         bookkeeping)

If task_time is stable across attempts while wall swings, the variance
is scheduling/orchestration noise, not data work — the decomposition the
round-13 SCALE.md block records.  Run:
``python tools/diag_multi_entity.py [n_attempts]``.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def gc_time_ms(spark) -> float:
    beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return float(sum(beans.get(i).getCollectionTime() for i in range(beans.size())))


def attempt_task_seconds(spark, group: str) -> tuple[float, int]:
    sc = spark.sparkContext
    st = sc.statusTracker()
    store = sc._jsc.sc().statusStore()
    total_ms, n_jobs = 0.0, 0
    for j in st.getJobIdsForGroup(group):
        info = st.getJobInfo(j)
        if info is None:
            continue
        n_jobs += 1
        for sid in info.stageIds:
            si = st.getStageInfo(sid)
            if si is None or si.numTasks == 0:
                continue
            tl = store.taskList(sid, si.currentAttemptId, int(si.numTasks))
            for i in range(tl.size()):
                t = tl.apply(i)
                d = t.duration()
                if d.isDefined() and t.status() == "SUCCESS":
                    total_ms += float(d.get())
    return total_ms / 1000.0, n_jobs


def main() -> int:
    n_attempts = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    from arcane_stream_microsoft_synapse_link_spark.session import get_spark

    from bench import _gc_hint, _multi_entity_bench

    spark = get_spark("arcane-diag-multi")
    spark.sparkContext.setLogLevel("ERROR")
    slots = spark.sparkContext.defaultParallelism

    rows = []
    tmp = tempfile.mkdtemp(prefix="diag_multi_")
    try:
        # one untimed warm attempt: JIT + merge plan shapes
        _multi_entity_bench(spark, os.path.join(tmp, "warm"))
        _gc_hint(spark)
        for a in range(n_attempts):
            group = f"diag-multi-{a}"
            spark.sparkContext.setJobGroup(group, group)
            g0 = gc_time_ms(spark)
            t0 = time.perf_counter()
            rate = _multi_entity_bench(spark, os.path.join(tmp, f"a{a}"))
            wall = time.perf_counter() - t0
            g1 = gc_time_ms(spark)
            spark.sparkContext.setJobGroup("", "")
            task_s, n_jobs = attempt_task_seconds(spark, group)
            rows.append(
                {
                    "attempt": a,
                    "rate_rows_per_sec": rate,
                    # _multi_entity_bench times only run_once_all; wall here
                    # includes fixture build + backfill — report both
                    "outer_wall_s": round(wall, 2),
                    "timed_tick_s": round(40000.0 / rate, 2),
                    "task_time_s": round(task_s, 2),
                    "n_jobs": n_jobs,
                    "jvm_occupancy": round(task_s / (wall * slots), 3),
                    "gc_delta_s": round((g1 - g0) / 1000.0, 2),
                    "driver_gap_s": round(wall - task_s / slots, 2),
                }
            )
            print(json.dumps(rows[-1]))
            _gc_hint(spark)
        ticks = sorted(r["timed_tick_s"] for r in rows)
        out = {
            "slots": slots,
            "attempts": rows,
            "tick_spread": round(ticks[-1] / ticks[0], 2),
            "task_time_spread": round(
                max(r["task_time_s"] for r in rows)
                / max(1e-9, min(r["task_time_s"] for r in rows)),
                2,
            ),
        }
        print(json.dumps(out))
        with open(os.path.join(REPO, "SCALE_MULTI_DIAG.json"), "w") as fh:
            json.dump(out, fh, indent=1)
        return 0
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
