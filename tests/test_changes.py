"""Change Data Feed (`VersionedTable.changes`) — the Delta
``table_changes`` analog over the snapshot store: row-level
insert/update/delete between two committed versions, with unchanged
(hard-linked) bucket directories pruned by inode metadata before any
data is read."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arcane_stream_microsoft_synapse_link_spark.streaming.runner import StreamRunner, StreamSpec
from arcane_stream_microsoft_synapse_link_spark.tables import VersionedTable

from .synapse_fixture import BASE_VERSION, ENTITY, KEYS, SynapseFixture, minus


def _mk(spark, rows):
    return spark.createDataFrame(rows, "arcane_merge_key string, val long, versionnumber long")


def _changes(df):
    return {
        r["arcane_merge_key"]: (r["_change_type"], r["val"])
        for r in df.collect()
    }


def test_changes_insert_update_delete(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_mk(spark, [("a", 1, 10), ("b", 2, 10), ("c", 3, 10)]))
    t.commit(_mk(spark, [("a", 1, 10), ("b", 20, 11), ("d", 4, 10)]))

    out = _changes(t.changes(spark, 1, 2))
    assert out == {"b": ("update", 20), "c": ("delete", 3), "d": ("insert", 4)}
    # version-column compare gives the same classification
    out_v = _changes(t.changes(spark, 1, 2, version_col="versionnumber"))
    assert out_v == out
    meta = t.changes(spark, 1, 2).select("_from_version", "_to_version").first()
    assert (meta["_from_version"], meta["_to_version"]) == (1, 2)


def test_changes_default_head_and_validation(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(_mk(spark, [("a", 1, 10)]))
    t.commit(_mk(spark, [("a", 2, 11)]))
    t.commit(_mk(spark, [("a", 2, 11), ("b", 1, 10)]))
    # to_version defaults to the head; diff spans multiple commits
    out = _changes(t.changes(spark, 1))
    assert out == {"a": ("update", 2), "b": ("insert", 1)}
    with pytest.raises(ValueError):
        t.changes(spark, 3, 3)


def test_changes_prunes_untouched_linked_buckets(spark, tmp_path):
    """Incremental bucketed commit hard-links untouched buckets; the diff
    must classify only keys in rewritten buckets and produce NOTHING from
    linked ones (which the inode walk prunes before any read)."""
    t = VersionedTable(str(tmp_path / "t"), bucket_count=8, bucket_key="arcane_merge_key")
    rows = [(f"k{i}", i, 10) for i in range(40)]
    t.commit(_mk(spark, rows))

    # rewrite ONE key's bucket only (incremental commit carries just that
    # bucket's rows, like cdc_merge does)
    bucket_of = {
        r["arcane_merge_key"]: r["b"]
        for r in _mk(spark, rows)
        .select("arcane_merge_key", F.pmod(F.xxhash64("arcane_merge_key"), F.lit(8)).cast("int").alias("b"))
        .collect()
    }
    target_key = "k7"
    tb = bucket_of[target_key]
    same_bucket = [r for r in rows if bucket_of[r[0]] == tb]
    updated = [
        (k, v + 100 if k == target_key else v, 11 if k == target_key else ver)
        for (k, v, ver) in same_bucket
    ]
    t.commit(_mk(spark, updated), touched_buckets=[tb])

    out = _changes(t.changes(spark, 1, 2))
    new_val = next(v for (k, v, _) in updated if k == target_key)
    assert out == {target_key: ("update", new_val)}


@pytest.mark.slow
def test_changes_over_cdc_scenario(spark, tmp_path):
    fx = SynapseFixture(tmp_path / "source")
    spec = StreamSpec(
        entity_name=ENTITY,
        source_root=str(tmp_path / "source"),
        target_root=str(tmp_path / "target"),
    )
    fx.upload_batch(minus(hours=2), update_changelog=True)
    runner = StreamRunner(spark, spec)
    assert runner.backfill() == 5
    v1 = runner.table.current_version()
    fx.upload_batch(minus(minutes=5), add_delete=True, add_upsert=True, update_changelog=True)
    assert runner.run_once() == 1
    v2 = runner.table.current_version()

    cdf = runner.table.changes(spark, v1, v2, key_col="Id", version_col="versionnumber")
    got = {r["Id"]: r["_change_type"] for r in cdf.collect()}
    assert got[KEYS[0]] == "delete"
    assert got[KEYS[1]] == "update"
    assert got[KEYS[5]] == "insert" and got[KEYS[6]] == "insert"
    assert set(got) == {KEYS[0], KEYS[1], KEYS[5], KEYS[6]}
    # update rows carry the NEW version
    upd = {r["Id"]: r["versionnumber"] for r in cdf.filter("_change_type = 'update'").collect()}
    assert upd[KEYS[1]] == BASE_VERSION + 100


@pytest.mark.slow
def test_changes_random_commit_sequences(spark, tmp_path):
    """Adversarial CDF check: random mutation sequences over flat AND
    bucketed-incremental tables — for every version pair, changes(a, b)
    must equal the brute-force python diff of the two recorded states
    (including the inode-pruned path, where untouched buckets are
    hard-linked and never read)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(5)
    keys = [f"k{i}" for i in range(12)]

    for trial, bucket_count in [(0, 0), (1, 4)]:
        t = VersionedTable(
            str(tmp_path / f"t{trial}"),
            bucket_count=bucket_count,
            bucket_key="arcane_merge_key",
        )
        if bucket_count:
            probe = _mk(spark, [(k, 0, 0) for k in keys]).select(
                "arcane_merge_key",
                F.pmod(F.xxhash64("arcane_merge_key"), F.lit(bucket_count))
                .cast("int")
                .alias("b"),
            )
            bucket_of = {r["arcane_merge_key"]: r["b"] for r in probe.collect()}
        state: dict[str, tuple[int, int]] = {}
        history = []
        for v in range(1, 5):
            changed_keys = set()
            for k in rng.sample(keys, 5):
                if k in state and rng.random() < 0.3:
                    del state[k]
                else:
                    state[k] = (rng.randint(0, 100), v)
                changed_keys.add(k)
            rows = [(k, val, ver) for k, (val, ver) in state.items()]
            if bucket_count and history:
                touched = sorted({bucket_of[k] for k in changed_keys})
                partial = [r for r in rows if bucket_of[r[0]] in touched]
                t.commit(_mk(spark, partial), touched_buckets=touched)
            else:
                t.commit(_mk(spark, rows))
            history.append(dict(state))

        for a in range(1, 5):
            for b in range(a + 1, 5):
                got = {
                    r["arcane_merge_key"]: (r["_change_type"], r["val"])
                    for r in t.changes(spark, a, b).collect()
                }
                sa, sb = history[a - 1], history[b - 1]
                exp = {}
                for k in set(sa) | set(sb):
                    if k not in sa:
                        exp[k] = ("insert", sb[k][0])
                    elif k not in sb:
                        exp[k] = ("delete", sa[k][0])
                    elif sa[k] != sb[k]:
                        exp[k] = ("update", sb[k][0])
                assert got == exp, (trial, a, b, got, exp)
