"""Property-based CDC merge testing: random change sequences replayed
through the engine must match a trivially-correct Python dict oracle.

The oracle models the reference's observable contract (version-guarded
last-writer-wins with deletes): for each key, the highest version across
all applied batches decides existence and payload; stale re-uploads never
regress state; replays are no-ops.

Hypothesis drives the batch structure (keys, versions, deletes, batch
splits); Spark runs once per example via the shared session. Examples are
kept small (Spark latency) but deeply varied (duplicate keys in one batch,
version ties, delete-then-stale-reupload, cross-batch reordering).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arcane_stream_microsoft_synapse_link_spark.operators.dedup import latest_by_version
from arcane_stream_microsoft_synapse_link_spark.operators.merge import cdc_merge

# One change row: (key 0-5, version 1-9, is_delete, payload tag)
change = st.tuples(
    st.integers(0, 5),
    st.integers(1, 9),
    st.booleans(),
    st.integers(0, 99),
)
batches_strategy = st.lists(st.lists(change, min_size=1, max_size=8), min_size=1, max_size=4)


def dedupe_versions(batches):
    """Drop in-batch rows sharing (key, version) — real Synapse change
    feeds never emit version ties, and the engine's in-batch winner on a
    tie is order-undefined (row_number over equal versions)."""
    out = []
    for b in batches:
        seen: set[tuple[int, int]] = set()
        rows = []
        for r in b:
            if (r[0], r[1]) not in seen:
                seen.add((r[0], r[1]))
                rows.append(r)
        out.append(rows)
    return out


def oracle_apply(batches):
    """Dict replay of version-guarded CDC semantics. NO tombstone memory:
    after a delete merges, the target holds no row for the key — a later
    stale upsert re-inserts (matches the reference's MERGE WHEN NOT
    MATCHED AND NOT IsDelete THEN INSERT; impossible in real feeds where
    versions only grow)."""
    state: dict[int, tuple[int, int]] = {}  # key -> (version, payload)
    for batch in batches:
        winners: dict[int, tuple[int, bool, int]] = {}
        for key, ver, is_del, payload in batch:
            cur = winners.get(key)
            if cur is None or ver > cur[0]:
                winners[key] = (ver, is_del, payload)
        for key, (ver, is_del, payload) in winners.items():
            if key in state and ver <= state[key][0]:
                continue  # stale — version guard rejects
            if is_del:
                state.pop(key, None)  # absent key → delete is a no-op
            else:
                state[key] = (ver, payload)
    return state


def engine_apply(spark, batches):
    target = None
    for batch in batches:
        rows = [
            (f"k{key}", int(ver), bool(is_del), int(payload), f"k{key}")
            for key, ver, is_del, payload in batch
        ]
        staged = spark.createDataFrame(
            rows,
            "Id string, versionnumber long, IsDelete boolean, payload long, arcane_merge_key string",
        )
        target = cdc_merge(target, staged)
    if target is None:
        return {}
    return {
        r["arcane_merge_key"]: (r["versionnumber"], r["payload"])
        for r in target.collect()
    }


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=batches_strategy)
@pytest.mark.slow
def test_cdc_merge_matches_dict_oracle(spark, batches):
    batches = dedupe_versions(batches)
    expected = {f"k{k}": v for k, v in oracle_apply(batches).items()}
    actual = engine_apply(spark, batches)
    assert actual == expected, f"batches={batches}"


def test_version_tie_within_batch_keeps_single_row(spark):
    """Two rows, same key, same version, one delete one upsert — the engine
    must keep exactly one row (never both) and replays stay stable."""
    staged = spark.createDataFrame(
        [("a", 5, False, 1, "a"), ("a", 5, True, 2, "a")],
        "Id string, versionnumber long, IsDelete boolean, payload long, arcane_merge_key string",
    )
    out = latest_by_version(staged)
    assert out.count() == 1
