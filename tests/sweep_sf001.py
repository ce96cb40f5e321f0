"""Ad-hoc strict oracle sweep at sf0.01 (the driver's gate SF).

Run: python tests/sweep_sf001.py [sf_dir]
Prints one line per oracle-backed query with PASS/FAIL + timing, and a
summary. Not collected by pytest (no test_ prefix).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arcane_stream_microsoft_synapse_link_spark.plans import ORACLE, ORACLE_SF, QUERIES
from arcane_stream_microsoft_synapse_link_spark.session import get_spark
from tests.oracle_harness import compare


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("sweep", shuffle_partitions=16)
    fails = []
    for name in QUERIES:
        if name not in ORACLE:
            continue
        t0 = time.time()
        try:
            # VALUES oracles carry literals computed at one fixed scale
            ok, msg = compare(
                spark, ORACLE_SF.get(name, sf_dir), QUERIES[name], ORACLE[name], strict=True
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
