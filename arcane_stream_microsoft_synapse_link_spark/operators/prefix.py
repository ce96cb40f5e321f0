"""Distributed prefix scan: exact global running totals without a
single-partition window.

``SUM(x) OVER (ORDER BY ...)`` — the prefix sum — plans as one
single-partition window sort: one task orders and scans the whole
input, the same scale-killer shape ``ntile``/global ``row_number`` had
before round 13 (see ``operators/quantiles.py``).  The classic
distributed scan fixes it in three bounded steps:

1. ``repartitionByRange`` on the order columns + in-partition sort — a
   balanced range shuffle (a distributed ORDER BY);
2. per-partition TOTALS (K scalars of driver metadata, like AQE stats)
   prefix-summed on the driver into partition OFFSETS, applied as a map
   literal — no join, no second shuffle;
3. a window partitioned BY THE PHYSICAL PARTITION ID and ordered within
   it: every partition scans ITS OWN rows in parallel; adding the
   offset yields the exact global running total.

The partition-id window is the load-bearing trick: ``Window.partitionBy
(spark_partition_id())`` keeps all 32 (or 10,000) partitions scanning
concurrently where ``Window.orderBy(...)`` alone would collapse to one
task.  Used by the sequence-packing operator (every doc needs its global
token offset) and reusable for any ORDER-BY-running-total.

Same caveats as the quantile machinery: the frame is consumed by two
passes (totals, output), so the range partitioning is pinned with
``localCheckpoint`` — on a cluster with dynamic allocation swap in
``checkpoint()``; order columns must be a TOTAL order for a
deterministic result (append a unique tie-break).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def running_total(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    num_range_partitions: int | None = None,
    out_col: str = "running_total",
    exclusive: bool = False,
) -> DataFrame:
    """Input columns + ``out_col`` = exact running total of ``value_col``
    over the total order given by ``order_cols`` (inclusive by default;
    ``exclusive=True`` gives the sum of strictly-preceding rows — the
    offset form sequence packing needs).  Long arithmetic throughout:
    callers sum token counts / byte sizes, and 2⁶³ outruns any corpus.
    """
    from pyspark.sql.window import Window

    spark: SparkSession = df.sparkSession
    p = num_range_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = (
        df.repartitionByRange(p, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        # eager=False: the totals collect below is the first consumer and
        # materializes every partition — same pin, one less driver job
        # (see operators/quantiles.py)
        .localCheckpoint(eager=False)
    )
    totals = {
        r["__pid"]: r["t"]
        for r in ranged.groupBy("__pid")
        .agg(F.sum(F.col(value_col).cast("bigint")).alias("t"))
        .collect()
    }
    offsets, cum = {}, 0
    for pid in sorted(totals):
        offsets[pid] = cum
        cum += totals[pid] or 0
    off_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    local = F.sum(F.col(value_col).cast("bigint")).over(
        w.rowsBetween(Window.unboundedPreceding, -1 if exclusive else 0)
    )
    return ranged.withColumn(
        out_col,
        (F.element_at(off_map, F.col("__pid")) + F.coalesce(local, F.lit(0))).cast(
            "bigint"
        ),
    ).drop("__pid")
