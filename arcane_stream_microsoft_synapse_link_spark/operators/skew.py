"""Skew mitigation: salted two-phase aggregation.

AQE handles skewed *joins* (splitting oversized shuffle blocks) and
map-side partial aggregation absorbs most groupBy skew for algebraic
functions. The remaining hot spot at 100 TB is a skewed key whose partial
states are themselves large — above all COUNT(DISTINCT x), whose partial
state is the distinct set: one reducer receives every value of the hot
key. Salting splits that key across ``num_salts`` reducers with an exact
two-phase combine.

- ``salted_agg``: algebraic aggregates (sum/count/min/max) — rows of one
  key spread across salts (row-derived salt), partials combined exactly.
- ``salted_count_distinct``: the salt is derived from the *value*
  (``pmod(xxhash64(col), n)``) so each distinct value lands in exactly one
  salt bucket → per-bucket distinct counts add up exactly.

Top-k-per-key needs no helper here: Spark 4 plans ``row_number() ≤ k``
with ``WindowGroupLimit`` (per-map-partition top-k before the shuffle) —
see the plan test in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# partial aggregate → exact combiner for the algebraic functions
_COMBINE = {
    "sum": F.sum,
    "count": F.sum,  # counts add
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str | Column]],
    num_salts: int = 32,
) -> DataFrame:
    """Exact two-phase aggregation: groupBy(keys + salt) partials, then
    groupBy(keys) combine. ``aggs`` maps output name → (kind, column) with
    kind in {sum, count, min, max}. The salt is row-derived
    (``monotonically_increasing_id % n``) — any assignment is correct for
    algebraic functions; it only controls reducer fan-out."""
    unknown = {k for k, (kind, _) in aggs.items() if kind not in _COMBINE}
    if unknown:
        raise ValueError(f"non-algebraic agg kinds for salting: {unknown}")
    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(num_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            (F.count(col) if kind == "count" else getattr(F, kind)(col)).alias(f"_p_{name}")
            for name, (kind, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _COMBINE[kind](f"_p_{name}").alias(name)
            for name, (kind, _) in aggs.items()
        ]
    )


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    col: str,
    num_salts: int = 32,
    out_name: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT col) per key without a single-reducer hot spot:
    value-derived salt routes each distinct value to exactly one bucket,
    per-bucket exact distinct counts are then summed. Shuffle 1 carries
    (keys, salt) groups — the hot key is split ``num_salts`` ways; shuffle 2
    carries one row per (keys, salt)."""
    salted = df.withColumn("_vsalt", F.pmod(F.xxhash64(col), F.lit(num_salts)))
    per_bucket = salted.groupBy(*keys, "_vsalt").agg(
        F.count_distinct(col).alias("_pd")
    )
    return per_bucket.groupBy(*keys).agg(F.sum("_pd").cast("bigint").alias(out_name))
