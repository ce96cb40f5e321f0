"""Second-stage multi-entity variance probe: per-attempt PHASE split
(fixture build / backfill / timed tick), time-window job attribution
(job groups are thread-local — the 8 runner threads escape them, so
jobs are attributed by submission-time window from the status store),
and an optional fresh-session-per-attempt arm that separates SESSION
aging from machine noise.  Run:
``python tools/diag_multi_entity2.py [n_attempts] [--fresh]``."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def cpu_stat() -> dict:
    """host CPU accounting from /proc/stat (jiffies): steal = hypervisor
    preemption of this VM's vCPUs — the one term neither Spark nor the
    engine controls."""
    with open("/proc/stat") as fh:
        f = fh.readline().split()
    ks = ("user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal")
    return dict(zip(ks, (int(x) for x in f[1:9])))


def gc_time_ms(spark) -> float:
    beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return float(sum(beans.get(i).getCollectionTime() for i in range(beans.size())))


def jobs_in_window(spark, t0_ms: float, t1_ms: float) -> dict:
    store = spark.sparkContext._jsc.sc().statusStore()
    jl = store.jobsList(None)
    n, task_ms = 0, 0.0
    st = spark.sparkContext.statusTracker()
    for i in range(jl.size()):
        j = jl.apply(i)
        sub = j.submissionTime()
        if not sub.isDefined():
            continue
        ts = sub.get().getTime()
        if not (t0_ms <= ts <= t1_ms):
            continue
        n += 1
        sids = j.stageIds()  # scala Seq — iterate via size/apply
        for si_i in range(sids.size()):
            sid = sids.apply(si_i)
            si = st.getStageInfo(sid)
            if si is None:
                continue
            tl = store.taskList(sid, si.currentAttemptId, int(si.numTasks))
            for k in range(tl.size()):
                t = tl.apply(k)
                d = t.duration()
                if d.isDefined() and t.status() == "SUCCESS":
                    task_ms += float(d.get())
    return {"n_jobs": n, "task_s": task_ms / 1000.0}


def one_attempt(spark, tmp: str, a: int, total: int = 40000) -> dict:
    from datetime import datetime, timedelta

    from arcane_stream_microsoft_synapse_link_spark.streaming.runner import (
        MultiEntityRunner,
        StreamSpec,
    )
    from tests.synapse_fixture import ENTITY, SynapseFixture, data_row, delete_row, model_json

    n_entities, base_ts, v0 = 8, datetime(2021, 7, 1, 12, 0, 0), 6_000_000_000
    n = total // (2 * n_entities)
    jvm_now = lambda: float(spark.sparkContext._jvm.java.lang.System.currentTimeMillis())  # noqa: E731

    p0 = time.perf_counter()
    specs, fxs = [], []
    for e in range(n_entities):
        root = os.path.join(tmp, f"me{e}")
        fx = SynapseFixture(os.path.join(root, "source"))
        key = lambda i, e=e: f"{i:08d}-aaaa-bbbb-cccc-ddddeeee{e:04d}"  # noqa: E731

        def write_folder(ts, rows):
            name = fx.folder_name(ts)
            d = os.path.join(fx.root, name, ENTITY)
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(fx.root, name, "model.json"), "w") as fh:
                fh.write(model_json())
            with open(os.path.join(d, "data.csv"), "w") as fh:
                fh.write("\n".join(rows) + "\n")
            return name

        write_folder(base_ts - timedelta(hours=2), [data_row(key(i), v0 + i, f"D{i}") for i in range(n)])
        upd = [data_row(key(i), v0 + n + i, f"U{i}") for i in range(n // 2)] + [
            data_row(key(n + i), v0 + i, f"N{i}") for i in range(n // 2)
        ]
        write_folder(base_ts - timedelta(minutes=30), upd)
        dels = [delete_row(key(i), v0 + 2 * n + i) for i in range(n // 10)]
        stale = [data_row(key(i), v0 + i, f"D{i}") for i in range(n // 10, n)]
        f3 = write_folder(base_ts - timedelta(minutes=10), dels + stale)
        fx.set_changelog(fx.folder_name(base_ts - timedelta(hours=2)))
        fxs.append((fx, f3))
        specs.append(StreamSpec(entity_name=ENTITY, source_root=fx.root, target_root=os.path.join(root, "target")))
    fixture_s = time.perf_counter() - p0

    multi = MultiEntityRunner(spark, specs, max_workers=n_entities)
    c0 = cpu_stat()
    g0 = gc_time_ms(spark)
    jb0 = jvm_now()
    p1 = time.perf_counter()
    multi.backfill_all()
    backfill_s = time.perf_counter() - p1
    jb1 = jvm_now()
    for fx, f3 in fxs:
        fx.set_changelog(f3)
    p2 = time.perf_counter()
    multi.run_once_all()
    tick_s = time.perf_counter() - p2
    jb2 = jvm_now()
    g1 = gc_time_ms(spark)
    c1 = cpu_stat()
    dj = {k: (c1[k] - c0[k]) / 100.0 for k in c1}  # jiffies -> seconds

    back = jobs_in_window(spark, jb0, jb1)
    tick = jobs_in_window(spark, jb1, jb2)
    return {
        "attempt": a,
        "fixture_s": round(fixture_s, 2),
        "backfill_s": round(backfill_s, 2),
        "tick_s": round(tick_s, 2),
        "rate": round(total / tick_s, 1),
        "gc_delta_s": round((g1 - g0) / 1000.0, 2),
        "tick_jobs": tick["n_jobs"],
        "tick_task_s": round(tick["task_s"], 2),
        "tick_driver_gap_s": round(tick_s - tick["task_s"] / 32, 2),
        "backfill_jobs": back["n_jobs"],
        "backfill_task_s": round(back["task_s"], 2),
        "cpu_steal_s": round(dj["steal"], 2),
        "cpu_busy_s": round(dj["user"] + dj["system"] + dj["nice"], 2),
        "cpu_idle_s": round(dj["idle"], 2),
    }


def main() -> int:
    n_attempts = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 6
    fresh = "--fresh" in sys.argv
    total = 40000
    for arg in sys.argv[1:]:
        if arg.startswith("--total="):
            total = int(arg.split("=")[1])
    from arcane_stream_microsoft_synapse_link_spark.session import get_spark

    from bench import _gc_hint, _multi_entity_bench

    rows = []
    tmp = tempfile.mkdtemp(prefix="diag_multi2_")
    spark = None
    try:
        for a in range(n_attempts):
            if fresh or spark is None:
                if spark is not None:
                    spark.stop()
                    from pyspark.sql import SparkSession

                    SparkSession.builder._options = {}
                spark = get_spark(f"arcane-diag2-{a if fresh else 0}")
                spark.sparkContext.setLogLevel("ERROR")
                _multi_entity_bench(spark, os.path.join(tmp, f"warm{a}"))  # warm the new JVM
                _gc_hint(spark)
            rows.append(one_attempt(spark, os.path.join(tmp, f"a{a}"), a, total))
            print(json.dumps(rows[-1]), flush=True)
            _gc_hint(spark)
        ticks = sorted(r["tick_s"] for r in rows)
        out = {"fresh_session_per_attempt": fresh, "total_rows_per_tick": total, "attempts": rows,
               "tick_spread": round(ticks[-1] / ticks[0], 2)}
        print(json.dumps(out))
        name = "SCALE_MULTI_DIAG_FRESH.json" if fresh else (
            "SCALE_MULTI_DIAG_BIG.json" if total != 40000 else "SCALE_MULTI_DIAG.json")
        with open(os.path.join(REPO, name), "w") as fh:
            json.dump(out, fh, indent=1)
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
