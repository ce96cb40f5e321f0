"""Driver-contract guards: the 50-entry correctness gate walks
__spark_entry__.queries() in order, so the ordering IS part of the
product surface (see memory: gate is hard-capped at the first 50)."""

from __future__ import annotations

import re

import __spark_entry__ as entry
from arcane_stream_microsoft_synapse_link_spark.plans import ORACLE, QUERIES


def test_first_50_entries_are_the_declared_sql_surface():
    names = list(entry.queries())
    first50 = names[:50]
    # round 3 rotation: q1..q48 (27 + 23 = exactly 50 entries) lead
    assert all(re.match(r"^q\d+", n) for n in first50), first50
    assert len([n for n in names if re.match(r"^q\d+", n)]) == 50
    # every gated entry is oracle-backed (hash-comparable, not rows-only)
    assert all(n in ORACLE for n in first50)


def test_oracle_keys_are_registered_queries():
    missing = [k for k in ORACLE if k not in QUERIES]
    assert missing == [], missing


def test_ordering_is_deterministic():
    assert list(entry.queries()) == list(entry.queries())
    assert entry.oracle_sql() == dict(ORACLE)


def test_no_decimal_output_in_oracle_sql():
    """The driver's hasher renders DECIMAL differently per engine; no gated
    oracle may declare a decimal OUTPUT column (interior casts that feed
    SUM/ROUND before a final DOUBLE/BIGINT cast are fine and load-bearing).
    Heuristic: 'AS DECIMAL(...)' followed by an output alias 'AS name,' is
    checked via the outermost-cast pattern 'AS DECIMAL(p,s)) AS col'."""
    offenders = []
    for name, sql in ORACLE.items():
        for m in re.finditer(r"AS\s+DECIMAL\(\d+,\s*\d+\)\)\s+AS\s+(\w+)", sql, re.IGNORECASE):
            offenders.append((name, m.group(1)))
    assert offenders == [], offenders
