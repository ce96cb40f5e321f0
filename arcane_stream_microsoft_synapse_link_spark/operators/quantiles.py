"""Exact percentiles at scale: distributed rank selection.

``F.percentile`` (and any sort-free exact-quantile aggregate) is a
TypedImperativeAggregate whose partial buffers hold the observed values —
the final merge concentrates every distinct value on ONE reducer. Fine at
millions of rows; a wall at 100 TB. ``percentile_approx`` fixes memory but
gives up exactness.

This operator computes EXACT interpolated percentiles with bounded memory
everywhere:

1. one pass to count ``n`` — the target ranks are ``h = p * (n-1)``,
   needing only the values at global ranks ``floor(h)`` / ``ceil(h)``;
2. ``repartitionByRange`` on the value + ``sortWithinPartitions`` — a
   balanced range shuffle + local sort, exactly a distributed ORDER BY;
   ``monotonically_increasing_id`` (partition_id << 33 | local counter)
   then encodes each row's partition AND local rank with zero extra
   shuffle — no window, no single reducer;
3. partition counts (K integers to the driver, metadata like AQE stats)
   prefix-sum into global-rank offsets; global rank = offset[pid] +
   local counter, offsets applied as a map literal, not a join;
4. the ≤ 2·|ps| hit rows are filtered out and interpolated with the exact
   formula Spark's ``percentile`` uses: ``(ceil(h)-h)·v_lo +
   (h-floor(h))·v_hi``.

Cost: ONE full-data shuffle plus a count — the honest price of exactness;
no executor ever holds more than one partition of values. Ties are safe:
equal values land in one range partition and any tie order selects the
same value for a given rank.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import release_checkpoint
from ..session import local_df


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    ps: list[float],
    num_range_partitions: int | None = None,
    interpolation: str = "spark",
) -> DataFrame:
    """One row per requested percentile: (p double, value double).
    Null values are excluded (aggregate semantics). Returns an empty
    result if the column has no non-null rows.

    ``interpolation`` picks the final (driver-side, ≤2·|ps| values) float
    expression: ``"spark"`` mirrors Spark's ``percentile`` aggregate
    (``(hi-h)·v_lo + (h-lo)·v_hi``); ``"cont"`` mirrors the SQL-standard
    ``quantile_cont`` / NumPy ``linear`` form
    (``v_lo + (h-lo)·(v_hi-v_lo)``) — bit-identical to DuckDB's, verified
    against its output. The distributed plan is identical either way."""
    if interpolation not in ("spark", "cont"):
        raise ValueError(f"unknown interpolation {interpolation!r}")
    spark: SparkSession = df.sparkSession
    bad = [p for p in ps if not 0.0 <= p <= 1.0]
    if bad:
        raise ValueError(f"percentiles must be in [0, 1], got {bad}")  # fail before the shuffle
    out_schema = "p double, value double"
    vals = df.select(F.col(value_col).cast("double").alias("v")).where(F.col("v").isNotNull())

    k = num_range_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # localCheckpoint pins the range partitioning AND row order: the frame
    # is consumed by TWO actions (counts, rank filter), RangePartitioner
    # re-samples with a new seed per job, and the id column must be
    # assigned to identical rows in both passes — without the pin the
    # offsets would describe different partition boundaries than the
    # second pass reads (observed: every quantile but min/max silently
    # wrong). On a cluster with dynamic allocation use checkpoint() to
    # reliable storage instead.
    mid = F.monotonically_increasing_id()  # partition_id << 33 | local row counter
    # eager=False (r15): the pin's guarantee — both actions read the SAME
    # materialized (row, mid) blocks — only needs the blocks cached by the
    # FIRST consuming action (the counts collect below, which touches every
    # partition); an eager pin paid one extra full range-shuffle job for
    # the same guarantee.
    ranged = (
        vals.repartitionByRange(k, "v")
        .sortWithinPartitions("v")
        .select("v", mid.alias("mid"))
        .localCheckpoint(eager=False)
    )
    pid = F.shiftright("mid", 33).cast("int")
    local = F.col("mid").bitwiseAND(F.lit((1 << 33) - 1))
    # K integers to the driver — bounded metadata, not data. n comes free
    # as their sum (no separate pre-shuffle count job).
    counts = {
        r["pid"]: r["cnt"]
        for r in ranged.groupBy(pid.alias("pid")).agg(F.count("*").alias("cnt")).collect()
    }
    n = sum(counts.values())
    if n == 0:
        release_checkpoint(ranged)
        return local_df(spark, [], out_schema)
    hs = {p: p * (n - 1) for p in ps}
    need = sorted({int(math.floor(h)) for h in hs.values()} | {int(math.ceil(h)) for h in hs.values()})
    if counts and max(counts.values()) >= 1 << 33:
        # the id's local counter is 33 bits; a bigger partition would wrap
        # into the partition-id bits and silently corrupt every rank
        raise ValueError(
            f"range partition of {max(counts.values())} rows exceeds the 2^33 id-counter "
            f"range — raise num_range_partitions (currently {k})"
        )
    offsets, cum = {}, 0
    for p_ in sorted(counts):
        offsets[p_] = cum
        cum += counts[p_]
    off_map = F.create_map(*[F.lit(x) for kv in sorted(offsets.items()) for x in kv])

    hit_rows = (
        ranged.withColumn("gr", F.element_at(off_map, pid) + local)
        .where(F.col("gr").isin([int(r) for r in need]))
        .select("gr", "v")
        .collect()
    )
    at = {r.gr: r.v for r in hit_rows}
    # all needed values are on the driver — release the pinned blocks so a
    # long-lived session doesn't accumulate checkpoint storage (plain
    # unpersist() would be a no-op: the blocks live on the checkpoint RDD)
    release_checkpoint(ranged)

    # interpolate in the exact arithmetic order of the chosen engine —
    # the two forms differ in final-ulp rounding, which matters for
    # bit-exact comparison against either engine's builtin
    out = []
    for p in ps:  # one output row per REQUESTED p (duplicates included)
        h = hs[p]
        lo, hi = int(math.floor(h)), int(math.ceil(h))
        if lo == hi:
            v = at[lo]
        elif interpolation == "spark":
            v = (hi - h) * at[lo] + (h - lo) * at[hi]
        else:  # "cont"
            v = at[lo] + (h - lo) * (at[hi] - at[lo])
        out.append((float(p), float(v)))
    return local_df(spark, out, out_schema)


def ntile_exact(
    df: DataFrame,
    k: int,
    order_cols: list[str],
    num_range_partitions: int | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Exact ``NTILE(k) OVER (ORDER BY order_cols)`` WITHOUT the global
    window: the window form plans as a single-partition sort (one task
    orders the whole input — the one plan shape that cannot survive a
    100× scale-up), while this runs the same distributed rank-selection
    machinery as :func:`exact_percentiles`:

    1. ``repartitionByRange`` on the order columns + in-partition sort —
       a balanced range shuffle, i.e. a distributed ORDER BY;
    2. ``monotonically_increasing_id`` encodes (partition, local rank)
       with zero extra shuffle; per-partition counts (K integers of
       driver metadata) prefix-sum into global-rank offsets applied as a
       map literal;
    3. the bucket is a pure projection of the global rank ``r`` (0-based,
       ``n`` rows): SQL NTILE gives the first ``n mod k`` buckets
       ``n div k + 1`` rows and the rest ``n div k`` — closed-form, no
       second pass.

    ``order_cols`` must be a TOTAL order (append a unique tie-break
    column) — otherwise tied rows straddle bucket boundaries in an
    engine-dependent order and the assignment is nondeterministic (the
    same caveat applies to window NTILE; both declared consumers pin
    ties).  Output: the input columns plus ``bucket`` (int, 1-based),
    bit-identical to the window form under a total order.

    The returned frame references localCheckpoint blocks (the pin that
    keeps the offset map describing the partitioning the output pass
    reads — see :func:`exact_percentiles`); they are released when the
    DataFrame is garbage-collected or the session ends, so use within a
    query scope, not as a long-lived cached table.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark: SparkSession = df.sparkSession
    p = num_range_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    mid = F.monotonically_increasing_id()
    ranged = (
        df.repartitionByRange(p, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__mid", mid)
        # eager=False: see exact_percentiles — the counts collect is the
        # first consumer and materializes every partition's blocks
        .localCheckpoint(eager=False)
    )
    pid = F.shiftright("__mid", 33).cast("int")
    local = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
    counts = {
        r["pid"]: r["cnt"]
        for r in ranged.groupBy(pid.alias("pid")).agg(F.count("*").alias("cnt")).collect()
    }
    n = sum(counts.values())
    if counts and max(counts.values()) >= 1 << 33:
        raise ValueError(
            f"range partition of {max(counts.values())} rows exceeds the 2^33 "
            f"id-counter range — raise num_range_partitions (currently {p})"
        )
    offsets, cum = {}, 0
    for pp in sorted(counts):
        offsets[pp] = cum
        cum += counts[pp]
    off_map = F.create_map(*[F.lit(x) for kv in sorted(offsets.items()) for x in kv])
    r0 = (F.element_at(off_map, pid) + local).cast("bigint")  # 0-based global rank
    q, rem = divmod(n, k)
    if q == 0:
        # fewer rows than buckets: rank r lands alone in bucket r+1
        bucket = (r0 + 1).cast("int")
    else:
        head = rem * (q + 1)  # rows covered by the (q+1)-sized buckets
        # integer DIV, not float /: Column./ is double division, which
        # drifts off the exact-integer convention once ranks exceed 2^53
        # (all terms are non-negative, so DIV == floor-div here)
        ranged = ranged.withColumn("__r0", r0)
        bucket = (
            F.when(F.col("__r0") < head, F.expr(f"__r0 DIV {q + 1}"))
            .otherwise(rem + F.expr(f"(__r0 - {head}) DIV {q}"))
            .cast("int")
            + 1
        )
        return ranged.withColumn(bucket_col, bucket).drop("__mid", "__r0")
    return ranged.withColumn(bucket_col, bucket).drop("__mid")
