"""Unit tests for the scale-path join operators (operators/joins.py):
as-of join edge semantics and binned range-join boundary handling."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from arcane_stream_microsoft_synapse_link_spark.operators.joins import (
    asof_join,
    range_join_binned,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-05T12:00:00")),  # after both rights -> latest
            (2, 10, _ts("2024-01-03T00:00:00")),  # equal ts -> <= includes it
            (3, 10, _ts("2024-01-01T00:00:00")),  # before all rights -> null
            (4, 99, _ts("2024-01-05T00:00:00")),  # key with no rights -> null
        ],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-02T00:00:00"), 100),
            (10, _ts("2024-01-03T00:00:00"), 200),
        ],
        "k long, rts timestamp, val long",
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts", value_col="val")
    got = {r["event_id"]: r["asof_value"] for r in out.collect()}
    assert got == {1: 200, 2: 200, 3: None, 4: None}


def test_asof_join_tie_on_right_ts_takes_max_value(spark):
    left = spark.createDataFrame([(1, 7, _ts("2024-06-01T00:00:00"))], "event_id long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(7, _ts("2024-05-01T00:00:00"), 5), (7, _ts("2024-05-01T00:00:00"), 9)],
        "k long, rts timestamp, val long",
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts", value_col="val")
    assert out.collect()[0]["asof_value"] == 9


@pytest.mark.slow
def test_range_join_binned_matches_naive(spark):
    # intervals straddling bin boundaries + inclusive endpoints
    points = spark.createDataFrame([(i, i) for i in range(0, 40)], "pid long, p long")
    intervals = spark.createDataFrame(
        [(1, 3, 9), (2, 8, 8), (3, 10, 25), (4, 39, 60)],
        "iid long, lo long, hi long",
    )
    out = range_join_binned(points, intervals, "p", "lo", "hi", bin_width=4)
    got = sorted((r["iid"], r["pid"]) for r in out.collect())
    naive = sorted(
        (r["iid"], r["pid"])
        for r in points.crossJoin(intervals)
        .where(F.col("p").between(F.col("lo"), F.col("hi")))
        .collect()
    )
    assert got == naive and len(naive) == 7 + 1 + 16 + 1


def test_range_join_binned_no_duplicate_pairs(spark):
    # an interval spanning many bins must emit each contained point once
    points = spark.createDataFrame([(1, 50)], "pid long, p long")
    intervals = spark.createDataFrame([(1, 0, 100)], "iid long, lo long, hi long")
    out = range_join_binned(points, intervals, "p", "lo", "hi", bin_width=3)
    assert out.count() == 1


def test_asof_join_random_matches_python_oracle(spark):
    """Randomized (seeded) as-of join vs a brute-force python oracle."""
    import random

    rng = random.Random(7)
    lefts = [
        (i, rng.randrange(8), _ts("2024-01-01T00:00:00") + dt.timedelta(minutes=rng.randrange(5000)))
        for i in range(400)
    ]
    rights = [
        (rng.randrange(8), _ts("2024-01-01T00:00:00") + dt.timedelta(minutes=rng.randrange(5000)), v)
        for v in range(150)
    ]
    left = spark.createDataFrame(lefts, "event_id long, k long, ts timestamp")
    right = spark.createDataFrame(rights, "k long, rts timestamp, val long")
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts", value_col="val")
    got = {r["event_id"]: r["asof_value"] for r in out.collect()}

    def oracle(k, ts):
        cand = [(rts, v) for (rk, rts, v) in rights if rk == k and rts <= ts]
        return max(cand)[1] if cand else None

    assert got == {eid: oracle(k, ts) for (eid, k, ts) in lefts}


def test_range_join_binned_property(spark):
    """Property: for random intervals/points and ANY bin width, the binned
    join equals the naive cross-join filter."""
    import random

    rng = random.Random(11)
    points = [(i, rng.randrange(0, 1000)) for i in range(120)]
    intervals = []
    for i in range(40):
        lo = rng.randrange(0, 1000)
        intervals.append((i, lo, lo + rng.randrange(0, 120)))
    pdf = spark.createDataFrame(points, "pid long, p long")
    idf = spark.createDataFrame(intervals, "iid long, lo long, hi long")
    naive = sorted(
        (iid, pid) for (pid, p) in points for (iid, lo, hi) in intervals if lo <= p <= hi
    )
    for width in (1, 7, 64, 1000, 5000):
        out = range_join_binned(pdf, idf, "p", "lo", "hi", bin_width=width)
        got = sorted((r["iid"], r["pid"]) for r in out.collect())
        assert got == naive, f"width={width}"


# ---------------------------------------------------------------------------
# distributed exact percentiles (operators/quantiles.py)
# ---------------------------------------------------------------------------


def test_exact_percentiles_matches_builtin(spark, sf_dir):
    """Rank-selection percentiles must be bit-identical to F.percentile
    for interpolated, exact-hit, and extreme ranks."""
    from pyspark.sql import functions as F

    from arcane_stream_microsoft_synapse_link_spark.catalog import Tables
    from arcane_stream_microsoft_synapse_link_spark.operators.quantiles import exact_percentiles

    t = Tables(spark, sf_dir)
    ps = [0.0, 0.25, 0.5, 0.9, 1.0]
    mine = {r.p: r.value for r in exact_percentiles(t.lineitem, "l_extendedprice", ps).collect()}
    ref = t.lineitem.agg(F.percentile("l_extendedprice", F.lit(ps)).alias("v")).collect()[0].v
    assert [mine[p] for p in ps] == list(ref)


def test_exact_percentiles_edges(spark):
    from arcane_stream_microsoft_synapse_link_spark.operators.quantiles import exact_percentiles

    # nulls excluded; single row; empty input
    df = spark.createDataFrame([(None,), (10.0,), (20.0,), (None,)], "x double")
    got = {r.p: r.value for r in exact_percentiles(df, "x", [0.5]).collect()}
    assert got == {0.5: 15.0}
    one = spark.createDataFrame([(7.0,)], "x double")
    assert exact_percentiles(one, "x", [0.0, 0.5, 1.0]).collect() == [
        (0.0, 7.0), (0.5, 7.0), (1.0, 7.0)]
    empty = spark.createDataFrame([], "x double")
    assert exact_percentiles(empty, "x", [0.5]).collect() == []


def test_blocked_hamming_join_recovers_planted_corruptions(spark):
    """Pigeonhole completeness: every pair within max_mismatches
    substitutions is recovered, distances are exact, and candidates come
    from an equi-join (no nested loop)."""
    import hashlib
    import io
    import random
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from arcane_stream_microsoft_synapse_link_spark.operators.joins import (
        blocked_hamming_join,
    )

    rng = random.Random(7)
    code_len, k, n = 12, 2, 300
    codes = [hashlib.md5(f"b{i}".encode()).hexdigest()[:code_len] for i in range(n)]
    base = spark.createDataFrame(
        [(i, c) for i, c in enumerate(codes)], "base_id long, code string"
    )
    probes, expected = [], {}
    for i, c in enumerate(codes):
        m = rng.randint(0, k)  # up to k substitutions, sometimes zero
        pos = rng.sample(range(code_len), m)
        pc = list(c)
        for p in pos:
            pc[p] = rng.choice("uvwxyz")  # outside hex → guaranteed change
        probes.append((i, "".join(pc)))
        expected[i] = m
    probe = spark.createDataFrame(probes, "probe_id long, pcode string")

    out = blocked_hamming_join(
        probe, base, "pcode", "code", code_len, max_mismatches=k,
        extra_left=["probe_id"], extra_right=["base_id"],
    )
    got = {(r.probe_id, r.base_id): r.dist for r in out.collect()}
    for i, m in expected.items():
        assert got.get((i, i)) == m, (i, m, got.get((i, i)))
    # false positives are allowed candidates but must all be within k
    assert all(d <= k for d in got.values())

    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_qgram_levenshtein_join_recovers_planted_indels(spark):
    """Count-filter completeness: every pair within max_edits edits
    (including insertions/deletions) is recovered, distances exact, no
    nested loop."""
    import hashlib
    import io
    import random
    from contextlib import redirect_stdout

    from arcane_stream_microsoft_synapse_link_spark.operators.joins import (
        qgram_levenshtein_join,
    )

    rng = random.Random(11)
    code_len, n = 14, 250
    codes = [hashlib.md5(f"q{i}".encode()).hexdigest()[:code_len] for i in range(n)]
    base = spark.createDataFrame(
        [(i, c) for i, c in enumerate(codes)], "base_id long, code string"
    )
    probes, expected = [], {}
    for i, c in enumerate(codes):
        kind = rng.choice(["none", "del", "ins", "sub"])
        pc = list(c)
        if kind == "del":
            del pc[rng.randrange(len(pc))]
        elif kind == "ins":
            pc.insert(rng.randrange(len(pc) + 1), rng.choice("uvwxyz"))
        elif kind == "sub":
            pc[rng.randrange(len(pc))] = rng.choice("uvwxyz")
        probes.append((i, "".join(pc)))
        expected[i] = 0 if kind == "none" else 1
    probe = spark.createDataFrame(probes, "probe_id long, pcode string")

    out = qgram_levenshtein_join(
        probe, base, "pcode", "code", max_edits=1, q=3,
        extra_left=["probe_id"], extra_right=["base_id"],
    )
    got = {(r.probe_id, r.base_id): r.dist for r in out.collect()}
    for i, d in expected.items():
        assert got.get((i, i)) == d, (i, d, got.get((i, i)))
    assert all(d <= 1 for d in got.values())

    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_blocked_hamming_join_k3_and_qgram_two_edits(spark):
    """Deeper pigeonhole/count-filter coverage: k=3 substitutions for the
    Hamming operator, two mixed edits for the q-gram operator."""
    import hashlib
    import random

    from arcane_stream_microsoft_synapse_link_spark.operators.joins import (
        blocked_hamming_join,
        qgram_levenshtein_join,
    )

    rng = random.Random(23)
    code_len, n = 16, 150
    codes = [hashlib.md5(f"d{i}".encode()).hexdigest()[:code_len] for i in range(n)]
    base = spark.createDataFrame(
        [(i, c) for i, c in enumerate(codes)], "base_id long, code string"
    )

    # k=3 substitutions, 4-part pigeonhole
    probes, expected = [], {}
    for i, c in enumerate(codes):
        m = rng.randint(0, 3)
        pc = list(c)
        for p in rng.sample(range(code_len), m):
            pc[p] = rng.choice("uvwxyz")
        probes.append((i, "".join(pc)))
        expected[i] = m
    probe = spark.createDataFrame(probes, "probe_id long, pcode string")
    got = {
        (r.probe_id, r.base_id): r.dist
        for r in blocked_hamming_join(
            probe, base, "pcode", "code", code_len, max_mismatches=3,
            extra_left=["probe_id"], extra_right=["base_id"],
        ).collect()
    }
    for i, m in expected.items():
        assert got.get((i, i)) == m, (i, m, got.get((i, i)))

    # two mixed edits (sub/ins/del in any combination), q=4 count filter
    probes2, expected2 = [], {}
    for i, c in enumerate(codes):
        m = rng.randint(0, 2)
        pc = list(c)
        for _ in range(m):
            kind = rng.choice(["del", "ins", "sub"])
            if kind == "del" and len(pc) > 1:
                del pc[rng.randrange(len(pc))]
            elif kind == "ins":
                pc.insert(rng.randrange(len(pc) + 1), rng.choice("uvwxyz"))
            else:
                pc[rng.randrange(len(pc))] = rng.choice("uvwxyz")
        probes2.append((i, "".join(pc)))
        expected2[i] = m
    probe2 = spark.createDataFrame(probes2, "probe_id long, pcode string")
    got2 = {
        (r.probe_id, r.base_id): r.dist
        for r in qgram_levenshtein_join(
            probe2, base, "pcode", "code", max_edits=2, q=4,
            extra_left=["probe_id"], extra_right=["base_id"],
        ).collect()
    }
    for i, m in expected2.items():
        # edits can cancel (insert then delete): distance is AT MOST m
        d = got2.get((i, i))
        assert d is not None and d <= m or (m == 0 and d == 0), (i, m, d)


@pytest.mark.slow
def test_qgram_join_equals_bruteforce_across_q_k_and_short_strings(spark):
    """Property sweep (round-4 brief item 5): randomized mixed-length
    corpora — including strings shorter than q and shorter than the
    q·(k+1)−1 vacuous-bound threshold — must produce EXACTLY the
    brute-force levenshtein join's pair set at k=3..5. Completeness of
    the count bound + short×short fallback, not just planted recovery."""
    import random

    from arcane_stream_microsoft_synapse_link_spark.operators.joins import (
        qgram_levenshtein_join,
    )

    for seed, q, k in [(101, 3, 4), (102, 3, 5), (103, 4, 5), (104, 2, 3)]:
        rng = random.Random(seed)
        # small alphabet + mixed lengths 1..20 → dense near-pair structure
        # straddling the short/long threshold q*(k+1)-1
        def mk(n, tag):
            rows = []
            for i in range(n):
                ln = rng.choice([1, 2, 3, 4, 6, 8, 10, 14, 17, 20])
                rows.append((i, "".join(rng.choice("abc") for _ in range(ln))))
            return spark.createDataFrame(rows, f"{tag}_id long, {tag}_code string")

        left, right = mk(70, "l"), mk(70, "r")
        got = {
            (r.l_id, r.r_id, r.dist)
            for r in qgram_levenshtein_join(
                left, right, "l_code", "r_code", max_edits=k, q=q,
                extra_left=["l_id"], extra_right=["r_id"],
            ).collect()
        }
        oracle = {
            (r.l_id, r.r_id, r.dist)
            for r in left.crossJoin(right)
            .withColumn("dist", F.levenshtein("l_code", "r_code").cast("bigint"))
            .where(F.col("dist") <= k)
            .collect()
        }
        missed = oracle - got
        spurious = got - oracle
        assert not missed, (q, k, "missed", sorted(missed)[:10])
        assert not spurious, (q, k, "spurious", sorted(spurious)[:10])


def test_blocked_hamming_join_rejects_mismatched_code_len(spark):
    """A code whose length differs from code_len fails the job loudly
    (assert_true) instead of silently dropping the row."""
    import pytest as _pytest

    from arcane_stream_microsoft_synapse_link_spark.operators.joins import (
        blocked_hamming_join,
    )

    left = spark.createDataFrame([(1, "abcd")], "l_id long, code string")
    right = spark.createDataFrame([(2, "abcde")], "r_id long, rcode string")
    out = blocked_hamming_join(
        left, right, "code", "rcode", code_len=4, max_mismatches=1,
        extra_left=["l_id"], extra_right=["r_id"],
    )
    with _pytest.raises(Exception, match="code_len"):
        out.collect()


def test_fuzzy_join_multiplicity_with_row_ids(spark):
    """Duplicate codes with distinct row ids keep per-row multiplicity
    (the documented extra_* contract): 2 identical left rows × 1 right
    row → 2 output pairs in both operators."""
    from arcane_stream_microsoft_synapse_link_spark.operators.joins import (
        blocked_hamming_join,
        qgram_levenshtein_join,
    )

    left = spark.createDataFrame(
        [(1, "abcdef"), (2, "abcdef")], "l_id long, code string"
    )
    right = spark.createDataFrame([(9, "abcdxf")], "r_id long, rcode string")

    h = blocked_hamming_join(
        left, right, "code", "rcode", code_len=6, max_mismatches=1,
        extra_left=["l_id"], extra_right=["r_id"],
    ).collect()
    assert {(r.l_id, r.r_id) for r in h} == {(1, 9), (2, 9)}

    g = qgram_levenshtein_join(
        left, right, "code", "rcode", max_edits=1, q=3,
        extra_left=["l_id"], extra_right=["r_id"],
    ).collect()
    assert {(r.l_id, r.r_id) for r in g} == {(1, 9), (2, 9)}


def test_qgram_assume_min_len_skips_short_path_and_enforces(spark):
    """assume_min_len above the threshold removes the short×short branch
    (one less Union/Exchange) AND enforces the claim: a shorter code
    fails the job instead of silently losing completeness."""
    import io
    from contextlib import redirect_stdout

    import pytest as _pytest

    from arcane_stream_microsoft_synapse_link_spark.operators.joins import (
        qgram_levenshtein_join,
    )

    left = spark.createDataFrame(
        [(1, "abcdefghijkl")], "l_id long, code string"
    )
    right = spark.createDataFrame(
        [(2, "abcdefghijxl")], "r_id long, rcode string"
    )
    fast = qgram_levenshtein_join(
        left, right, "code", "rcode", max_edits=1, q=4,
        extra_left=["l_id"], extra_right=["r_id"], assume_min_len=11,
    )
    assert [(r.l_id, r.r_id, r.dist) for r in fast.collect()] == [(1, 2, 1)]
    buf = io.StringIO()
    with redirect_stdout(buf):
        fast.explain("formatted")
    assert "Union" not in buf.getvalue()

    # a violating row fails loudly
    short_left = spark.createDataFrame([(3, "abc")], "l_id long, code string")
    bad = qgram_levenshtein_join(
        short_left, right, "code", "rcode", max_edits=1, q=4,
        extra_left=["l_id"], extra_right=["r_id"], assume_min_len=11,
    )
    with _pytest.raises(Exception, match="assume_min_len"):
        bad.collect()


def test_ntile_exact_matches_window_under_heavy_ties(spark):
    """Tie-pinning contract: with a TOTAL order (value, unique id),
    ntile_exact is bit-identical to the window ntile even when the value
    column is massively tied (here only 7 distinct values over 5,000
    rows, so every bucket boundary falls inside a tie run and only the
    id tie-break decides membership).  Also pins the NTILE size rule on
    n not divisible by k."""
    from pyspark.sql.window import Window as W

    from arcane_stream_microsoft_synapse_link_spark.operators.quantiles import ntile_exact

    rows = [((i * 31) % 7, i) for i in range(5_003)]  # 5003 % 10 = 3
    df = spark.createDataFrame(rows, "v long, id long").repartition(16)
    got = {
        (r.v, r.id): r.bucket
        for r in ntile_exact(df, 10, ["v", "id"]).collect()
    }
    want = {
        (r.v, r.id): r.b
        for r in df.select(
            "v", "id", F.ntile(10).over(W.orderBy("v", "id")).alias("b")
        ).collect()
    }
    assert got == want
    # NTILE size rule: first n%k buckets get one extra row
    from collections import Counter

    sizes = Counter(got.values())
    assert sorted(sizes.values(), reverse=True) == [501] * 3 + [500] * 7


def test_ntile_exact_fewer_rows_than_buckets(spark):
    from arcane_stream_microsoft_synapse_link_spark.operators.quantiles import ntile_exact

    df = spark.createDataFrame([(3, 1), (1, 2), (2, 3)], "v long, id long")
    got = sorted((r.v, r.bucket) for r in ntile_exact(df, 10, ["v", "id"]).collect())
    assert got == [(1, 1), (2, 2), (3, 3)]
    empty = spark.createDataFrame([], "v long, id long")
    assert ntile_exact(empty, 4, ["v", "id"]).collect() == []


def test_running_total_matches_window_form(spark):
    """Distributed prefix scan == the single-partition window form,
    inclusive and exclusive, on shuffled input with duplicate values
    (order made total by id)."""
    import random

    from pyspark.sql.window import Window as W

    from arcane_stream_microsoft_synapse_link_spark.operators.prefix import running_total

    rng = random.Random(23)
    rows = [(i, rng.randrange(100)) for i in range(4_000)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "id long, x long").repartition(16)
    for exclusive in (False, True):
        got = {
            r.id: r.running_total
            for r in running_total(df, "x", ["id"], exclusive=exclusive).collect()
        }
        w = W.orderBy("id").rowsBetween(W.unboundedPreceding, -1 if exclusive else 0)
        want = {
            r.id: r.rt or 0
            for r in df.select("id", F.sum("x").over(w).alias("rt")).collect()
        }
        assert got == want
    assert running_total(
        spark.createDataFrame([], "id long, x long"), "x", ["id"]
    ).collect() == []
