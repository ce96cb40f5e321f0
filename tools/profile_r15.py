"""Per-entry profiling probe for the r15 optimization round.

Times individual declared entries in isolation (uniform sf0.001 warmup
first, then N timed runs at the target scale with per-run /proc/stat
steal deltas), optionally dumping ``explain("formatted")`` to
``plans/r15/<entry>_<tag>.txt`` — the before/after evidence the round
commits.  Timing uses the same full-materialization collect() as
bench.py so numbers are comparable with the headline artifact; pass
``--noop`` to time the noop sink instead (guide §1.4) when isolating
computation from result pickup.

Run:  python tools/profile_r15.py [--runs N] [--noop] [--explain TAG] name...
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
    args = sys.argv[1:]
    runs = 3
    noop = False
    explain_tag = None
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--runs":
            runs = int(args[i + 1]); i += 2
        elif a == "--noop":
            noop = True; i += 1
        elif a == "--explain":
            explain_tag = args[i + 1]; i += 2
        else:
            names.append(a); i += 1

    from arcane_stream_microsoft_synapse_link_spark.session import get_spark

    import __spark_entry__ as em

    spark = get_spark("profile-r14")
    spark.sparkContext.setLogLevel("ERROR")
    queries = em.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    bad = [n for n in names if n not in queries]
    if bad:
        raise SystemExit(f"unknown entries: {bad}")

    # prime Python workers once
    import pandas as pd  # noqa: F401

    spark.range(32).repartition(32).mapInPandas(lambda it: it, schema="id long").count()

    def release() -> None:
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(False)
        except Exception:
            pass

    for name in names:
        fn = queries[name]
        try:
            fn(spark, "/root/testdata/sf0.001").collect()  # codegen warmup
        except Exception as exc:
            print(f"{name}: WARMUP FAILED {exc}", flush=True)
            continue
        release()
        if explain_tag:
            os.makedirs(os.path.join(REPO, "plans", "r15"), exist_ok=True)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            with open(
                os.path.join(REPO, "plans", "r15", f"{name}_{explain_tag}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
        ts = []
        st = []
        for _ in range(runs):
            s0 = steal_s()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            ts.append(round(time.perf_counter() - t0, 3))
            st.append(round(steal_s() - s0, 1))
            release()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: median={med} runs={ts} steal={st}", flush=True)


if __name__ == "__main__":
    main()
