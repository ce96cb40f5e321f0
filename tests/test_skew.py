"""TPC-H hot-key skew probe (VERDICT r8 item 7).

At 100 TB a single hot ``l_orderkey`` is the classic join killer: every
row of the hot key hashes to ONE shuffle partition, so one task sorts and
joins a constant fraction of the table while 999 executors idle.  The
engine's defenses, in order:

1. **Plan shape.** The declared q21 is the aggregate rewrite
   (plans/tpch.py:953): per-order distinct-supplier COUNTS replace the
   EXISTS/NOT-EXISTS self-joins, so the hot key's raw rows are absorbed
   by map-side partial aggregation before any reduce-side state grows.
   q01 partial-aggregates into 4 group keys the same way.
2. **AQE skew-join splitting** (session posture:
   ``spark.sql.adaptive.skewJoin.enabled=true``) for shapes that DO ship
   raw hot rows through a sort-merge join.

This probe builds a genuinely skewed 10× corpus — lineitem and orders
replicated 10× with shifted keys (6M / 1.5M rows), then 40% of lineitem
rows rewritten to ONE hot 'F'-status orderkey (~2.4M rows on a single
join key; the storage layout stays balanced via round-robin files, so
only the JOIN key is hot — the production shape) — and asserts the
VERDICT-named plans (tpch_q01, tpch_q21) complete with NO hot task:
per executed stage, the max task's SHUFFLE-READ RECORD COUNT is bounded
by a small multiple of the stage median.  Volume, not wall clock
(r12 advice): per-task input placement is the thing skew handling
actually controls, and it is immune to the GC/scheduler debt of a
long-lived suite JVM — the wall-clock form of this assertion flaked at
minute 80 of a full-suite run on a stage whose DATA was perfectly
balanced.  Metrics come from the JVM ``AppStatusStore`` task list (the
UI's data source; the UI server is off in tests); stages are discovered
via the public StatusTracker per job group.

The probe's sensitivity is itself tested (negative control):
``test_volume_probe_detects_unhandled_skew`` runs the naive raw-row
sort-merge join with AQE skew splitting DISABLED and asserts the
detector FIRES on the hot partition (~2.4M records on one task vs a
~110k median), then re-runs with splitting enabled and asserts it is
clean — so a silent regression of either the detector or the AQE
posture fails loudly.

Calibration honesty (measured while building the r8 probe, 2026-08-15,
and recorded in SCALE.md): at local[32] sandbox scale the hot partition
is too CHEAP to dominate wall clock (a 2.4M-row narrow-tuple sort is
~40 ms inside a task with ~1 s constant overheads) — which is exactly
why the assertion is on record placement, where the 100 TB failure mode
is visible at any scale.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
HOT_FRACTION = 0.4
REPLICAS = 10
SHIFT = 10_000_000
# a task may not read more than this multiple of its stage's median
# shuffle-read record count...
SPREAD_BOUND = 8.0
# ...judged only for stages where the max task reads enough records for
# spread to matter (tiny post-agg shuffles are noise)
MIN_MAX_RECORDS = 50_000


def _task_shuffle_records_by_stage(
    spark, job_group: str, min_tasks: int = 4
) -> dict[int, list[float]]:
    """Successful-task shuffle-read record counts per EXECUTED stage of
    one job group.

    Stage discovery uses the PUBLIC StatusTracker (job group → job ids →
    stage ids); per-task metrics come from the JVM ``AppStatusStore``
    ``taskList`` — the same store the UI's task table reads, available
    with the UI server off.  Stages AQE skipped (reused exchange output;
    zero completed tasks) naturally return no metrics and are excluded;
    scan-only stages (zero shuffle-read everywhere) drop out via the
    caller's MIN_MAX_RECORDS floor."""
    sc = spark.sparkContext
    st = sc.statusTracker()
    store = sc._jsc.sc().statusStore()
    out: dict[int, list[float]] = {}
    for j in st.getJobIdsForGroup(job_group):
        info = st.getJobInfo(j)
        if info is None:
            continue
        for sid in info.stageIds:
            si = st.getStageInfo(sid)
            if si is None or si.numTasks < min_tasks:
                continue
            tl = store.taskList(sid, si.currentAttemptId, int(si.numTasks))
            recs: list[float] = []
            for i in range(tl.size()):
                t = tl.apply(i)
                tm = t.taskMetrics()
                if t.status() == "SUCCESS" and tm.isDefined():
                    recs.append(float(tm.get().shuffleReadMetrics().recordsRead()))
            if recs:
                out[int(sid)] = recs
    return out


def _hot_task_offenders(stats: dict[int, list[float]]) -> list[tuple]:
    """Stages where one task's shuffle-read records exceed SPREAD_BOUND ×
    the stage median (floored at 1k records so near-empty stages cannot
    divide by ~0)."""
    import statistics

    offenders = []
    for sid, recs in stats.items():
        mx, med = max(recs), statistics.median(recs)
        if mx >= MIN_MAX_RECORDS and mx > SPREAD_BOUND * max(med, 1_000.0):
            offenders.append((sid, round(mx), round(med), len(recs)))
    return offenders


def _assert_no_straggler(stats: dict[int, list[float]], label: str) -> None:
    assert stats, f"{label}: no stages captured"
    offenders = _hot_task_offenders(stats)
    assert not offenders, (
        f"{label}: hot-task stages (stage, max_records, median_records, "
        f"n_tasks): {offenders} — skew handling did not bound the hot partition"
    )


@pytest.fixture(scope="module")
def skewed_sf(spark, tmp_path_factory):
    """A 10×-sf0.1 dir (6M-row lineitem / 1.5M-row orders via key-shifted
    replicas) with HOT_FRACTION of lineitem rows on one hot 'F'-status
    o_orderkey.  Dims and non-fact tables are the original files
    (symlinked).  The hot key is chosen from 'F' orders so it survives
    q21's status filter — a hot key the query PRUNES would probe
    nothing."""
    root = tmp_path_factory.mktemp("sfskew10x")
    for name in (
        "region nation customer supplier part events documents embeddings"
    ).split():
        os.symlink(f"{SF}/{name}.parquet", str(root / f"{name}.parquet"))
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    hot = (
        orders.where(F.col("o_orderstatus") == "F")
        .agg(F.min("o_orderkey").alias("k"))
        .collect()[0]["k"]
    )
    li10, o10 = None, None
    for r in range(REPLICAS):
        a = li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(r * SHIFT))
        b = orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(r * SHIFT))
        li10 = a if li10 is None else li10.unionByName(a)
        o10 = b if o10 is None else o10.unionByName(b)
    li10 = li10.withColumn(
        "l_orderkey",
        F.when(F.rand(7) < HOT_FRACTION, F.lit(hot)).otherwise(F.col("l_orderkey")),
    )
    # multi-file writes: a single-file corpus would be ONE parquet row
    # group, which is unsplittable — every scan would serialize on one
    # task and measure a fixture artifact instead of join skew
    li10.repartition(32).write.parquet(str(root / "lineitem.parquet"))
    o10.repartition(8).write.parquet(str(root / "orders.parquet"))
    return str(root)


@pytest.mark.slow
def test_hot_orderkey_no_single_task_straggler(spark, skewed_sf):
    from arcane_stream_microsoft_synapse_link_spark.plans import QUERIES

    # skew handling must be ON in the session posture — defense 2 is part
    # of what this probe certifies
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    overrides = {
        # production mechanism, test-scale thresholds (defaults: 256 MB /
        # 64 MB advisory — the whole 10× shuffle is smaller than one
        # production split, so the knobs scale with the data)
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        # ...including scan/shuffle parallelism: at 100 TB a lineitem scan
        # is thousands of tasks; give the probe real task counts so
        # per-task spread is measurable at all
        "spark.sql.files.maxPartitionBytes": "8m",
        "spark.sql.shuffle.partitions": "32",
        # the fact-fact joins must stay sort-merge: a broadcast join at
        # test scale would bypass the skewed shuffle the probe exercises
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        for qname in ("tpch_q01", "tpch_q21"):
            group = f"skewprobe-{qname}"
            spark.sparkContext.setJobGroup(group, f"skew probe {qname}")
            try:
                rows = QUERIES[qname](spark, skewed_sf).collect()
            finally:
                spark.sparkContext.setJobGroup("", "")
            assert rows  # the skewed corpus still produces results
            _assert_no_straggler(_task_shuffle_records_by_stage(spark, group), qname)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.mark.slow
def test_hot_orderkey_results_replicate_exactly(spark, skewed_sf):
    """Correctness companion: skew (and the skew confs) must not change
    ANSWERS.  q01 never touches l_orderkey, so on the 10×-replicated
    corpus its additive aggregates are EXACTLY 10× the sf0.1 values and
    its averages identical — hot-key planting included."""
    from arcane_stream_microsoft_synapse_link_spark.plans import QUERIES

    got = {
        (r["l_returnflag"], r["l_linestatus"]): (r["count_order"], r["sum_qty"])
        for r in QUERIES["tpch_q01"](spark, skewed_sf).collect()
    }
    want = {
        (r["l_returnflag"], r["l_linestatus"]): (
            REPLICAS * r["count_order"],
            REPLICAS * r["sum_qty"],
        )
        for r in QUERIES["tpch_q01"](spark, SF).collect()
    }
    assert got == want


@pytest.mark.slow
def test_volume_probe_detects_unhandled_skew(spark, skewed_sf):
    """Negative control (r12 advice: keep the probe falsifiable): the
    NAIVE raw-row sort-merge join of the skewed corpus — no aggregate
    rewrite, AQE skew splitting OFF — must trip the volume detector
    (~2.4M records land on the hot task vs a ~110k median); the same
    join with splitting ON must be clean.  A regression of either the
    detector or the skew-join posture fails one of the two arms."""
    li = spark.read.parquet(f"{skewed_sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{skewed_sf}/orders.parquet")

    def run(label: str, skew_enabled: bool) -> list:
        overrides = {
            "spark.sql.adaptive.skewJoin.enabled": str(skew_enabled).lower(),
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
            "spark.sql.shuffle.partitions": "32",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        }
        saved = {k: spark.conf.get(k, None) for k in overrides}
        group = f"skewprobe-naive-{label}"
        try:
            for k, v in overrides.items():
                spark.conf.set(k, v)
            spark.sparkContext.setJobGroup(group, f"naive skew join {label}")
            try:
                (
                    li.join(orders, li.l_orderkey == orders.o_orderkey)
                    .agg(F.count(F.lit(1)))
                    .collect()
                )
            finally:
                spark.sparkContext.setJobGroup("", "")
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
        return _hot_task_offenders(_task_shuffle_records_by_stage(spark, group))

    unhandled = run("off", skew_enabled=False)
    assert unhandled, (
        "detector missed the planted hot partition with skew splitting off — "
        "the probe has lost its sensitivity"
    )
    handled = run("on", skew_enabled=True)
    assert not handled, (
        f"AQE skew splitting left hot tasks: {handled} — posture regression"
    )
