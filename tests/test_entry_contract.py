"""Driver-contract guards: the 50-entry correctness gate walks
__spark_entry__.queries() in order, so the ordering IS part of the
product surface (see memory: gate is hard-capped at the first 50)."""

from __future__ import annotations

import re

import __spark_entry__ as entry
from arcane_stream_microsoft_synapse_link_spark.plans import ORACLE, QUERIES


def test_gate_window_leads_with_checkable_never_verified_entries():
    """History-driven ordering (r5, amended r6 per VERDICT r5 item 2a):
    the front of the window is every entry that can still earn a NEW
    driver verdict — oracle-backed entries with no green row in any
    CORRECTNESS_r*.json (including ones newly promoted from rows-only),
    plus rows-only entries never gated at all.  A rows-only entry with a
    prior ``err: no_oracle`` row has had its one possible check and must
    NOT pin the front tier.  The verified remainder keeps the round-keyed
    rotation."""
    names = list(entry.queries())
    green, visited = entry._gate_history()
    front = [
        n for n in QUERIES
        if (n in ORACLE and n not in green) or n not in visited
    ]
    lead = names[: len(front)]
    assert set(lead) == set(front), (sorted(set(front) - set(lead)))
    n_oracle_front = sum(1 for n in front if n in ORACLE)
    assert all(n in ORACLE for n in lead[:n_oracle_front])
    # verified remainder still rotates by round parity
    rest = names[len(front) :]
    rest_sql = [n for n in rest if re.match(r"^q\d+", n)]
    rest_ops = [n for n in rest if not re.match(r"^q\d+", n)]
    if rest_sql and rest_ops:
        if entry._current_round() % 2 == 0:
            assert not re.match(r"^q\d+", rest[0])
        else:
            assert re.match(r"^q\d+", rest[0])


def test_gate_window_is_fully_checkable():
    """With the r6 ranking, every slot of the 50-entry window is either
    oracle-backed (hash-verifiable) or a BRAND-NEW rows-only entry taking
    its single possible gate visit — the driver's capacity is never burned
    on rows-only entries it has already seen (VERDICT r5 item 2 'done'
    bar: ≥45 verifiable rows; with no new rows-only entries this is
    50/50)."""
    names = list(entry.queries())[:50]
    _, visited = entry._gate_history()
    burned = [n for n in names if n not in ORACLE and n in visited]
    assert burned == [], burned
    if len(ORACLE) >= 50:
        n_checkable = sum(1 for n in names if n in ORACLE)
        assert n_checkable >= 45, n_checkable


def test_ever_green_reflects_artifacts():
    """_ever_green() must equal a green set recomputed independently from
    the CORRECTNESS_r*.json artifacts on disk (artifact-relative, per
    VERDICT r5 item 1 — the r5 version froze round-4 state and went
    permanently red when r5 artifacts landed)."""
    import json
    import pathlib

    import re

    here = pathlib.Path(entry.__file__).resolve().parent
    expect_green, expect_visited = set(), set()
    for p in here.glob("CORRECTNESS_r*.json"):
        data = json.loads(p.read_text())
        m = re.match(r"CORRECTNESS_r0*(\d+)", p.stem)
        rnd = int(m.group(1)) if m else 0
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("rows_match") and row.get("hash_match") is not False and not row.get("err"):
                # plan-aware gate (r14): a green row predating the entry's
                # re-plan round no longer vouches for it
                if rnd >= entry.REPLANNED.get(name, 0):
                    expect_green.add(name)
                    expect_visited.add(name)
            elif row.get("err") == "no_oracle":
                expect_visited.add(name)
    green, visited = entry._gate_history()
    assert green == expect_green
    assert visited == expect_visited
    assert entry._ever_green() == expect_green


def test_hugeint_rows_transition_pinned_to_r4_artifacts():
    """Targeted regression pin on the FIXED artifact slice only (immutable
    history, safe to hard-code): in r1-r4 the four HUGEINT-oracle rows were
    never green; the r5 window verified them."""
    import json
    import pathlib

    here = pathlib.Path(entry.__file__).resolve().parent
    four = {"ops_dedup_accounting", "ops_distribution_drift",
            "ops_embedding_quantize", "ops_mixture_weights"}
    early_green = set()
    for rnd in (1, 2, 3, 4):
        p = here / f"CORRECTNESS_r{rnd:02d}.json"
        if not p.exists():
            p = here / f"CORRECTNESS_r{rnd}.json"
        if not p.exists():
            continue
        for name, row in json.loads(p.read_text()).items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("hash_match") is not False
                and not row.get("err")
            ):
                early_green.add(name)
    assert not early_green & four, sorted(early_green & four)
    r5 = here / "CORRECTNESS_r05.json"
    if r5.exists():
        rows = json.loads(r5.read_text())
        for n in four:
            assert (
                rows[n].get("rows_match")
                and rows[n].get("hash_match") is not False
                and not rows[n].get("err")
            ), n


def test_doc_surface_counts_match_registry():
    """README/MIGRATION literal surface counts must equal the live
    registry (VERDICT r4 item 6 / r5 item 4: the counts have drifted two
    rounds running; this assert makes that class of drift impossible)."""
    import pathlib

    n_q, n_o = len(QUERIES), len(ORACLE)
    n_rows_only = n_q - n_o
    root = pathlib.Path(entry.__file__).resolve().parent
    readme = (root / "README.md").read_text()
    migration = (root / "MIGRATION.md").read_text()
    assert f"{n_q} entries, {n_o} oracle-backed" in readme, (
        f"README.md surface count drifted: expected '{n_q} entries, {n_o} oracle-backed'"
    )
    if n_rows_only:
        assert f"the {n_rows_only} rows-only entries" in readme
    else:
        assert "every entry oracle-backed" in readme
    assert f"{n_q} declared queries" in migration, (
        f"MIGRATION.md surface count drifted: expected '{n_q} declared queries'"
    )
    # the oracle count in the same MIGRATION sentence drifted independently
    # of the declared count once (code-review r6) — pin it too
    assert f"{n_o} of them hash-verified strict" in migration, (
        f"MIGRATION.md oracle count drifted: expected '{n_o} of them hash-verified strict'"
    )


def test_plan_audit_covers_registry():
    """PLAN_AUDIT.json must audit EVERY registry entry with zero
    violations, and its cartesian allowlist must name real entries
    (VERDICT r8 items 3+9: the audit shipped one entry stale and the
    allowlist drifted to a renamed entry — both now impossible without a
    red test)."""
    import json
    import pathlib

    root = pathlib.Path(entry.__file__).resolve().parent
    audit = json.loads((root / "PLAN_AUDIT.json").read_text())
    per_entry = audit["per_entry"]
    missing = sorted(set(QUERIES) - set(per_entry))
    stale = sorted(set(per_entry) - set(QUERIES))
    assert missing == [], f"entries never audited: {missing}"
    assert stale == [], f"audited entries no longer in registry: {stale}"
    assert audit["violations"] == []
    assert audit["entries"] == len(QUERIES)
    bad_allow = [a for a in audit["cartesian_allowlist"] if a not in QUERIES]
    assert bad_allow == [], f"allowlist names unknown entries: {bad_allow}"
    errors = {k: v["error"] for k, v in per_entry.items() if "error" in v}
    assert errors == {}, f"entries whose plan failed to build: {errors}"


def test_scale_queries_covers_registry():
    """SCALE_QUERIES.json (the 10× volume-scaling evidence for the
    declared surface) must carry a ratio for EVERY registry entry and
    zero flagged-superlinear entries — an entry cannot ship without its
    scaling measured (VERDICT r8 items 1+9)."""
    import json
    import math
    import pathlib

    root = pathlib.Path(entry.__file__).resolve().parent
    sq = json.loads((root / "SCALE_QUERIES.json").read_text())
    per_entry = sq["per_entry"]
    missing = sorted(set(QUERIES) - set(per_entry))
    stale = sorted(set(per_entry) - set(QUERIES))
    assert missing == [], f"entries never scale-swept: {missing}"
    assert stale == [], f"swept entries no longer in registry: {stale}"
    assert sq["flagged"] == [], f"superlinear entries: {sq['flagged']}"
    bad = {k: v for k, v in per_entry.items() if not math.isfinite(v["ratio"])}
    assert bad == {}, f"entries with failed timings: {bad}"
    # SCALE.md's measured block must quote the live registry size (the
    # README/MIGRATION counts are pinned by test_doc_surface_counts...)
    scale_md = (root / "SCALE.md").read_text()
    assert f"{len(QUERIES)}/{len(QUERIES)} entries ≤ linear" in scale_md, (
        "SCALE.md scaling block drifted from the registry size"
    )


def test_round_inference_monotonic():
    r = entry._current_round()
    assert isinstance(r, int) and r >= 2  # r1 artifacts exist in this repo


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
    type_words = {"DOUBLE", "BIGINT", "FLOAT", "INT", "INTEGER", "DECIMAL"}
    offenders = []
    for name, sql in ORACLE.items():
        for m in re.finditer(r"AS\s+DECIMAL\(\d+,\s*\d+\)\)\s+AS\s+(\w+)", sql, re.IGNORECASE):
            # 'DECIMAL(...)) AS DOUBLE' is an inner decimal feeding an outer
            # DOUBLE cast — the approved pattern, not a decimal output
            if m.group(1).upper() not in type_words:
                offenders.append((name, m.group(1)))
    assert offenders == [], offenders


def test_bench_compact_line_never_exceeds_driver_window():
    """The driver json-parses only the last ~2000 B of stdout: an oversized
    line is HEAD-truncated into unparseable JSON, so the compact renderer
    must stay under MAX_LINE for any plausible surface size."""
    import json

    import bench

    for n in (10, 122, 200, 400):
        result = {
            "metric": "declared-query wall clock (sum over all queries)",
            "queries": {
                f"ops_some_rather_long_operator_name_{i}": 0.1 + (i % 17) for i in range(n)
            },
            "steady": {},
            "sf": 0.1,
            "cdc": {
                "backfill_rows": 20000,
                "backfill_sec": 1.5,
                "backfill_rows_per_sec": 13066.6,
                "streamed_rows": 40000,
                "stream_sec": 1.7,
                "stream_rows_per_sec": 23762.9,
                "final_row_count": 28000,
                "readstream_rows_per_sec": 12166.6,
                "multi_entity_rows_per_sec": 18720.7,
            },
        }
        line = bench._compact_line(result)
        assert len(line) <= bench.MAX_LINE, (n, len(line))
        parsed = json.loads(line)
        shown_sum = sum(parsed["queries"].values())
        others = parsed.get("others", {"n": 0, "sum": 0})
        assert len(parsed["queries"]) + others["n"] == n
        # headline total always reflects ALL entries, not just the shown ones
        assert abs(parsed["value"] - sum(result["queries"].values())) < 0.5 + 0.01 * n
        if others["n"]:
            assert abs(shown_sum + others["sum"] - parsed["value"]) < 0.1 * n


def test_values_oracles_registered_when_testdata_present():
    """plans/values_oracle.register() degrades SILENTLY if a reference
    throws (entries quietly fall back to the weaker rows-only check) —
    this assert makes that failure loud: with the driver's testdata on
    disk, every promoted entry must actually be oracle-backed."""
    import os

    if not os.path.isdir("/root/testdata/sf0.01"):
        return
    promoted = {
        "ops_media_features", "ops_media_resize", "ops_media_frames",
        "ops_image_near_dup", "ops_audio_near_dup", "ops_video_near_dup",
        "ops_fingerprint_rolling", "ops_embedding_pca", "ops_bpe_train",
        "ops_bpe_encode", "ops_bpe_pack", "ops_simhash_near_dup",
        "ops_minhash_near_dup", "ops_embedding_near_dup",
        "ops_dedup_pipeline", "ops_incremental_dedup", "ops_knn_ivf",
        "ops_knn_pq", "ops_knn_ivfpq", "ops_knn_index_probe",
        "ops_embedding_cluster", "ops_semantic_dedup",
    }
    missing = promoted - set(ORACLE)
    assert not missing, sorted(missing)


def test_scale_ops_d2_covers_ops_surface():
    """SCALE_OPS_D2.json (the ops-surface second decade, VERDICT r9 item
    3) must account for EVERY ops_* entry: measured with a finite ratio,
    or excluded with a written reason — never silently absent — with
    zero flagged-superlinear entries and no overlap between the two
    sets."""
    import json
    import math
    import pathlib

    root = pathlib.Path(entry.__file__).resolve().parent
    d2 = json.loads((root / "SCALE_OPS_D2.json").read_text())
    ops = {n for n in QUERIES if not n.startswith(("q", "tpch"))}
    measured = set(d2["per_entry"])
    excluded = set(d2["excluded"])
    assert measured & excluded == set()
    missing = sorted(ops - measured - excluded)
    stale = sorted((measured | excluded) - ops)
    assert missing == [], f"ops entries unaccounted for: {missing}"
    assert stale == [], f"swept entries no longer in registry: {stale}"
    assert d2["flagged"] == [], f"superlinear ops entries: {d2['flagged']}"
    bad = {
        k: v
        for k, v in d2["per_entry"].items()
        if v["ratio"] is None or not math.isfinite(v["ratio"])
    }
    assert bad == {}, f"entries with failed timings: {bad}"
    empty_reasons = [k for k, v in d2["excluded"].items() if not str(v).strip()]
    assert empty_reasons == []
