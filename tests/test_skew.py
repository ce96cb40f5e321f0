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
