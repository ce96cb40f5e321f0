"""Focused oracle verification of named entries on a VANILLA session
(same machinery as tests/sweep_vanilla.py, restricted to a list — the
per-batch check of the r14 optimization round).

Run: python tools/verify_entries_r14.py entry [entry...] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from arcane_stream_microsoft_synapse_link_spark.plans import ORACLE_SF
    from tests.oracle_harness import compare

    queries = entry.queries()
    oracle = entry.oracle_sql()
    fails = []
    for name in names:
        if name not in oracle:
            print(f"SKIP {name} (no oracle)")
            continue
        t0 = time.time()
        try:
            ok, msg = compare(
                spark, ORACLE_SF.get(name, sf_dir), queries[name], oracle[name], strict=True
            )
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {e}"
        dt = time.time() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name} {dt:.2f}s {'' if ok else msg[:300]}", flush=True)
        if not ok:
            fails.append(name)
    print(f"SUMMARY: {len(fails)} failures: {fails}", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
