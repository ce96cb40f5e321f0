"""Training-data export: deterministic seeded shuffle into shards.

Pre-training loaders want the corpus (a) globally shuffled so batches are
i.i.d.-ish, (b) split into a fixed shard count for data-parallel readers,
and (c) byte-identical across re-runs (resume / reproducibility). A random
``rand()`` shuffle satisfies none of that; hashing each row with a seeded
mixer satisfies all three: shard and order are pure functions of
(id, seed).

The mix function is a plain LCG step in BIGINT arithmetic —
``(id * 1103515245 + 12345 + seed) mod 2^31`` — chosen because every SQL
engine computes it identically (no engine-specific hash builtin), which
keeps the operator oracle-checkable. For ids wide enough to overflow
64-bit multiplication (beyond ~8e9) swap the mixer for ``xxhash64(id,
seed)``; the shape of the plan is unchanged.

Scale shape: shard assignment is a projection (no shuffle); the in-shard
ordering is ``repartition(shard) + sortWithinPartitions`` — one shuffle,
each output file written sorted, no global sort. ``row_number`` over a
shard-partitioned window is the declared-query spelling of the same thing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2**31


def shuffle_hash(id_col: str = "doc_id", seed: int = 0):
    """Seeded deterministic mix of an integer id (BIGINT-exact in any
    engine). ``pmod`` keeps the hash non-negative for negative ids too —
    SQL ``%`` follows the dividend's sign, which would put negative ids in
    negative "shards"."""
    return F.pmod(F.col(id_col) * F.lit(_LCG_A) + F.lit(_LCG_C + seed), F.lit(_LCG_M))


def seeded_shuffle_shards(
    df: DataFrame,
    num_shards: int = 8,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Assign every row a shard and a deterministic in-shard position.

    Returns the input columns plus ``shard`` (BIGINT, 0..num_shards-1) and
    ``pos`` (BIGINT, 1-based rank of the row inside its shard in shuffled
    order — ties on the mixed hash broken by id, so total and stable).
    """
    h = shuffle_hash(id_col, seed).alias("_h")
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return (
        df.withColumn("_h", h)
        .withColumn("shard", (F.col("_h") % num_shards).cast("bigint"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("_h")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    num_shards: int = 8,
    id_col: str = "doc_id",
    seed: int = 0,
) -> None:
    """Materialize the shuffled corpus as ``path/shard=N/*.parquet``, each
    shard's files internally sorted by the shuffle order. One shuffle
    total: repartition on shard, sort within partitions, partitioned write
    (no global sort, no driver collect)."""
    (
        df.withColumn("_h", shuffle_hash(id_col, seed))
        .withColumn("shard", (F.col("_h") % num_shards).cast("bigint"))
        .repartition(num_shards, "shard")
        .sortWithinPartitions("shard", "_h", id_col)
        .drop("_h")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
