"""Declared-query correctness: Spark result vs DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from arcane_stream_microsoft_synapse_link_spark.plans import ORACLE, ORACLE_SF, QUERIES

from .oracle_harness import compare


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, sf_dir, name):
    assert name in QUERIES, f"oracle {name} has no Spark query"
    # literal-VALUES oracles are pinned to the driver's sf0.01 compare
    # scale (plans/values_oracle.py); everything else runs at the sweep sf
    ok, msg = compare(spark, ORACLE_SF.get(name, sf_dir), QUERIES[name], ORACLE[name], strict=True)
    assert ok, msg


def test_all_queries_have_runnable_plans(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
