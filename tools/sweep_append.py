"""Append late-added registry entries to the standing sweeps with the
SAME estimator the full generators use (median of 3 timed passes per
scale after a warm pass), instead of re-running the whole 200-entry
regeneration for one newcomer.

Appended entries are marked ``"appended": true`` in per_entry so a
reader can tell which rows came from the full sweep context and which
from this incremental pass — the estimator is identical, the sweep-load
context is not.  Totals and entry counts are updated.  Run:
``python tools/sweep_append.py <entry> [<entry> ...]``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def medians(spark, fn, d, n=3, release=None):
    xs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(spark, d).collect()
        xs.append(time.perf_counter() - t0)
        if release:
            release(spark)
    xs.sort()
    return round(xs[len(xs) // 2], 4)


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: sweep_append.py <entry> [...]", file=sys.stderr)
        return 2

    from arcane_stream_microsoft_synapse_link_spark.session import get_spark

    import __spark_entry__ as em
    from bench import _gc_hint, _release_cached_blocks, build_ops_d2_corpus

    queries = em.queries()
    missing = [n for n in names if n not in queries]
    if missing:
        print(f"unknown entries: {missing}", file=sys.stderr)
        return 2

    spark = get_spark("arcane-sweep-append")
    spark.sparkContext.setLogLevel("ERROR")

    # --- SCALE_QUERIES: sf0.01 -> sf0.1 (scale_queries discipline) ----
    for n in names:
        queries[n](spark, "/root/testdata/sf0.001").collect()  # warm
    _release_cached_blocks(spark)
    _gc_hint(spark)
    sq_path = os.path.join(REPO, "SCALE_QUERIES.json")
    with open(sq_path) as fh:
        sq = json.load(fh)
    for n in names:
        lo = medians(spark, queries[n], "/root/testdata/sf0.01", release=_release_cached_blocks)
        hi = medians(spark, queries[n], "/root/testdata/sf0.1", release=_release_cached_blocks)
        sq["per_entry"][n] = {
            "t_1x": lo,
            "t_10x": hi,
            "ratio": round(hi / lo, 2),
            "appended": True,
        }
        print(f"SCALE_QUERIES {n}: {lo} -> {hi} (ratio {round(hi / lo, 2)})")
    sq["entries"] = len(sq["per_entry"])
    sq["total_1x_sec"] = round(sum(v["t_1x"] for v in sq["per_entry"].values()), 2)
    sq["total_10x_sec"] = round(sum(v["t_10x"] for v in sq["per_entry"].values()), 2)
    sq["flagged"] = sorted(
        k for k, v in sq["per_entry"].items() if v["ratio"] and v["ratio"] > 13.0
    )
    with open(sq_path, "w") as fh:
        json.dump(sq, fh, indent=1, sort_keys=True)

    # --- SCALE_OPS_D2: sf0.1 -> ~sf1 (scale_ops_d2 discipline) --------
    ops_names = [n for n in names if not n.startswith(("q", "tpch"))]
    if ops_names:
        sod_path = os.path.join(REPO, "SCALE_OPS_D2.json")
        with open(sod_path) as fh:
            sod = json.load(fh)
        tmp = tempfile.mkdtemp(prefix="ops_d2_append_")
        try:
            build_ops_d2_corpus(spark, tmp, "/root/testdata/sf0.1")
            _release_cached_blocks(spark)
            _gc_hint(spark)
            for n in ops_names:
                lo = medians(spark, queries[n], "/root/testdata/sf0.1", release=_release_cached_blocks)
                hi = medians(spark, queries[n], tmp, release=_release_cached_blocks)
                sod["per_entry"][n] = {
                    "sf0.1": lo,
                    "sf1": hi,
                    "ratio": round(hi / lo, 2),
                    "appended": True,
                }
                print(f"SCALE_OPS_D2 {n}: {lo} -> {hi} (ratio {round(hi / lo, 2)})")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        sod["entries"] = len(sod["per_entry"])
        sod["total_sf01_sec"] = round(
            sum(v["sf0.1"] for v in sod["per_entry"].values() if v.get("sf0.1")), 2
        )
        sod["total_sf1_sec"] = round(
            sum(v["sf1"] for v in sod["per_entry"].values() if v.get("sf1")), 2
        )
        sod["flagged"] = sorted(
            k for k, v in sod["per_entry"].items() if v.get("ratio") and v["ratio"] > 13.0
        )
        with open(sod_path, "w") as fh:
            json.dump(sod, fh, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
