"""Salted two-phase aggregation correctness (operators/skew.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from arcane_stream_microsoft_synapse_link_spark.operators.skew import (
    salted_agg,
    salted_count_distinct,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a long tail
    rows = [("hot", i % 17, float(i % 5)) for i in range(900)]
    rows += [(f"k{i % 10}", i % 23, float(i % 7)) for i in range(100)]
    return spark.createDataFrame(rows, "key string, val long, x double")


def test_salted_agg_matches_plain(spark, skewed):
    got = {
        r.key: (r.total, r.n, r.lo, r.hi)
        for r in salted_agg(
            skewed,
            ["key"],
            {"total": ("sum", "x"), "n": ("count", "x"), "lo": ("min", "val"), "hi": ("max", "val")},
            num_salts=8,
        ).collect()
    }
    want = {
        r.key: (r.total, r.n, r.lo, r.hi)
        for r in skewed.groupBy("key")
        .agg(
            F.sum("x").alias("total"),
            F.count("x").alias("n"),
            F.min("val").alias("lo"),
            F.max("val").alias("hi"),
        )
        .collect()
    }
    assert got == want


def test_salted_count_distinct_matches_plain(spark, skewed):
    got = {
        r.key: r.n_distinct
        for r in salted_count_distinct(skewed, ["key"], "val", num_salts=8).collect()
    }
    want = {
        r.key: r.d
        for r in skewed.groupBy("key").agg(F.count_distinct("val").alias("d")).collect()
    }
    assert got == want


def test_salted_agg_rejects_non_algebraic(spark, skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, ["key"], {"bad": ("avg", "x")})


def test_lsh_degenerate_bucket_bounded(spark):
    """Skew probe for the LSH bucket cap (SCALE.md): a planted degenerate
    bucket — 10k byte-identical docs, which share every band hash — must
    produce at most C(max_bucket, 2) candidate pairs, not C(10k, 2) ≈ 50M,
    and must not starve detection of an unrelated planted near-dup pair.
    The cap runs BEFORE any collect (spillable window), so no reducer ever
    buffers the full bucket; exact dedup first is the documented
    prescription for such corpora."""
    from arcane_stream_microsoft_synapse_link_spark.functions.dedup import (
        lsh_candidate_pairs,
        minhash_near_duplicates,
    )

    clone = "the exact same document body repeated verbatim in every clone " * 5
    near_a = "a genuinely unique long document about distributed query engines " * 4
    near_b = near_a + "with one trailing clause changed at the end only"
    uniq = [  # fully disjoint token sets — no legitimate shingle overlap
        " ".join(f"tok{i}x{j}" for j in range(12)) for i in range(50)
    ]
    rows = (
        [(i, clone) for i in range(10_000)]
        + [(20_000, near_a), (20_001, near_b)]
        + [(30_000 + i, t) for i, t in enumerate(uniq)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(16)

    max_bucket = 64
    pairs = lsh_candidate_pairs(df, max_bucket=max_bucket).collect()
    clone_pairs = [p for p in pairs if p.id_a < 10_000 and p.id_b < 10_000]
    cap_limit = max_bucket * (max_bucket - 1) // 2
    assert 0 < len(clone_pairs) <= cap_limit, len(clone_pairs)
    # total fan-out stays bucket-bounded, nowhere near the 50M cross product
    assert len(pairs) <= cap_limit + 10

    # the unrelated planted near-dup still surfaces through the verify stage
    found = {
        (r.id_a, r.id_b)
        for r in minhash_near_duplicates(df, threshold=0.5).select("id_a", "id_b").collect()
    }
    assert (20_000, 20_001) in found
