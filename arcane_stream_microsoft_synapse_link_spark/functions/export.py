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

from pyspark.sql import Column, DataFrame
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


def weighted_sample_topk(
    df: DataFrame,
    weight: Column,
    k: int = 100,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of ``k`` rows — the
    Efraimidis–Spirakis one-pass reservoir design (keys u_i^(1/w_i), take
    the top k), which gives exactly the distribution of sequential
    weighted draws without replacement.  Training mixtures use this to
    realize per-source temperature weights as an actual subset.

    Deterministic and oracle-replayable: the uniform u_i comes from the
    row's md5 (seed-prefixed, 15 hex chars → exact BIGINT in both Spark
    ``conv`` and DuckDB ``::UBIGINT``), and the E-S key is compared
    through its log transform ``ln(u)/w`` — monotone in u^(1/w) but built
    only from ln/divide, both IEEE correctly-rounded, where ``pow`` is
    not guaranteed so and could order near-ties differently per engine.

    Plan shape: pure projection → global top-k (TakeOrderedAndProject —
    partial top-k per partition, k rows to the driver-side merge, no full
    sort, no shuffle of the corpus). One scan at any size.
    """
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))), 1, 15),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    key = F.log(u) / weight.cast("double")
    return (
        df.select(F.col(id_col), weight.cast("bigint").alias("w"), key.alias("es_key"))
        .orderBy(F.desc("es_key"), F.asc(id_col))
        .limit(k)
    )
