"""Decompose per-entry wall into plan BUILD (Python/py4j DataFrame
construction) vs EXEC (collect) on a warm engine session — the r15
screening probe for where driver-side fixed costs live.

For each named entry: one cold warmup invocation (build+collect at the
target sf), then N warm iterations measuring t_build = queries()[name]
(spark, sf_dir) and t_exec = df.collect() separately.  Medians printed
per entry.  Entries whose build phase runs eager jobs (collects inside
the function) attribute that time to build — exactly the driver-latency
cost we want visible.

Run: python tools/build_exec_r15.py [--runs N] [--sf DIR] name...
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    from arcane_stream_microsoft_synapse_link_spark import session

    spark = session.get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    queries = entry.queries()
    for name in names:
        fn = queries[name]
        fn(spark, sf_dir).collect()  # cold warmup
        builds, execs = [], []
        for _ in range(runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.collect()
            t2 = time.time()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        print(
            f"{name}: build={statistics.median(builds):.3f} "
            f"exec={statistics.median(execs):.3f} "
            f"builds={[round(b,2) for b in builds]} execs={[round(e,2) for e in execs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
