"""Training-data export: deterministic seeded shuffle into shards.

Pre-training loaders want the corpus (a) globally shuffled so batches are
i.i.d.-ish, (b) split into a fixed shard count for data-parallel readers,
and (c) byte-identical across re-runs (resume / reproducibility). A random
``rand()`` shuffle satisfies none of that; hashing each row with a seeded
mixer satisfies all three: shard and order are pure functions of
(id, seed).

The mix function is a 31-bit xorshift-multiply hash (two rounds of
``x = (x * 73244475) mod 2^31; x ^= x >> 16`` over a seed-offset input) —
portable BIGINT/xor/shift arithmetic every SQL engine computes
identically, which keeps the operator oracle-checkable. It must be
NONLINEAR in the id: an affine mixer (plain LCG) mod a power-of-two shard
count degenerates to ``shard = f(id mod num_shards)`` — strided ids (every
8th doc after upstream sampling) would collapse into one shard, and
changing the seed would only relabel shards, never regroup docs. The xor
steps break that structure (verified by the strided-id test). All
intermediates stay below 2^31 so the multiplies can't overflow 64-bit;
``xxhash64(id, seed)`` is the drop-in alternative where oracle
portability isn't needed.

Scale shape: shard assignment is a projection (no shuffle); the in-shard
ordering is ``repartition(shard) + sortWithinPartitions`` — one shuffle,
each output file written sorted, no global sort. ``row_number`` over a
shard-partitioned window is the declared-query spelling of the same thing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_M31 = 2**31
_MULT = 73244475  # 0x45d9f3b, the classic 32-bit hash multiplier
_SEED_STEP = 507111937  # 2654435761 (Knuth) mod 2^31


def shuffle_hash(id_col: str = "doc_id", seed: int = 0):
    """Seeded deterministic nonlinear mix of an integer id (BIGINT-exact
    in any engine; see module docstring for why it must not be affine).
    ``pmod`` keeps the input non-negative for negative ids too — SQL ``%``
    follows the dividend's sign, which would put negative ids in negative
    "shards"."""
    x = F.pmod(F.col(id_col) + F.lit((seed * _SEED_STEP) % _M31), F.lit(_M31))
    for _ in range(2):
        x = (x * F.lit(_MULT)) % F.lit(_M31)
        x = x.bitwiseXOR(F.shiftright(x, 16))
    return x


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
