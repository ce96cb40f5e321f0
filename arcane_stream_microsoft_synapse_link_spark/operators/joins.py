"""Scale-path join operators Spark lacks as built-ins: as-of join and
binned range join.

The reference exposes as-of semantics only as a correlated-subquery query
shape (SURVEY.md §2.D Q22); a correlated subquery re-aggregates the right
side per left row. These operators re-express the same semantics as
single-shuffle compositions of built-in DataFrame ops, which is the form
that survives 100 TB:

- ``asof_join``: union both sides, one window sort per key, carry the last
  right-side value forward (``last_value IGNORE NULLS``). Cost = one
  shuffle on the key + one sort — identical asymptotics to a sort-merge
  join, no per-row re-aggregation, no nested-loop.
- ``range_join_binned``: an interval/point join with NO equi-key is a
  BroadcastNestedLoopJoin (or cartesian) in vanilla Spark. Binning rewrites
  it as an equi-join on a bin id: intervals explode into the bins they
  overlap, points map to exactly one bin, the join shuffles on the bin id,
  and the exact range predicate filters residual false pairs inside each
  bin. Shuffle volume = |points| + Σ interval spans / bin_width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
    out_name: str = "asof_value",
) -> DataFrame:
    """For each left row, the ``value_col`` of the latest right row with
    ``right_ts <= left_ts`` and the same ``on`` key (null when none).

    Ties on ``right_ts`` are resolved by the largest ``value_col`` (make
    ``value_col`` unique per (key, ts) — or equal under ties — for a
    deterministic result).

    Implementation: tag + union both sides, then per key one ascending
    sort on (ts, side, value) where right rows order before left rows at
    equal timestamps (<= semantics), and ``last_value`` with ignorenulls
    carries the most recent right value into every left row.
    """
    lcols = left.columns
    ts_type = left.schema[left_ts].dataType.simpleString()

    l_part = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left rows sort after right rows at equal ts
        F.lit(None).cast(right.schema[value_col].dataType).alias("_v"),
        *[F.col(c) for c in lcols],
    )
    r_part = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).cast(ts_type).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(value_col).alias("_v"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )

    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l_part.unionByName(r_part)
        .withColumn(out_name, F.last("_v", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
        .select(*lcols, out_name)
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
) -> DataFrame:
    """Equi-join rewrite of ``intervals.lo <= points.p <= intervals.hi``
    (inclusive ends; numeric columns — callers convert timestamps to epoch
    units first).

    Each interval is exploded into ``floor(lo/w)..floor(hi/w)`` bin ids
    (`F.sequence` — no Python), each point maps to its single bin, and the
    pair set comes from an equi-join on the bin id followed by the exact
    range filter. Pick ``bin_width`` near the typical interval span so the
    explode factor stays ~O(1) per interval.
    """
    w = F.lit(bin_width).cast("long")
    binned_iv = intervals.withColumn(
        "_bin", F.explode(F.sequence(F.floor(F.col(lo_col) / w), F.floor(F.col(hi_col) / w)))
    )
    binned_pt = points.withColumn("_bin", F.floor(F.col(point_col) / w))
    return (
        binned_pt.join(binned_iv, "_bin")
        .where(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("_bin")
    )


def blocked_hamming_join(
    left: DataFrame,
    right: DataFrame,
    left_code: str,
    right_code: str,
    code_len: int,
    max_mismatches: int = 1,
    extra_left: list[str] | None = None,
    extra_right: list[str] | None = None,
) -> DataFrame:
    """Similarity join on fixed-length codes within ``max_mismatches``
    substitutions, WITHOUT a cross join — the entity-resolution /
    fingerprint-reconciliation primitive.

    Blocking is the substitution pigeonhole: split each code into
    ``max_mismatches + 1`` contiguous parts; k substitutions can corrupt
    at most k parts, so every within-distance pair agrees EXACTLY on at
    least one (part_index, part_value) — the same guarantee the SimHash
    16-bit bands use (functions/dedup.py), generalized to any alphabet.
    Candidates come from ONE equi-join on the exploded part key; the
    exact Hamming check runs on candidates only.

    Scale shape: one shuffle join on (part_idx, part_val); candidate
    volume = true matches + part-key collisions, which high-entropy codes
    keep near zero. Low-entropy codes (shared prefixes) make one part
    value degenerate — the LSH bucket-cap story (functions/dedup.py
    ``max_bucket``) applies and exact-dedup-first removes the worst case.
    Output: one row per candidate pair within distance, with ``dist`` and
    any ``extra_*`` carried columns.

    Substitution-only by design (Hamming, not Levenshtein): an indel
    shifts every later position, breaking part equality — indel-tolerant
    blocking needs q-gram blocking instead; levenshtein verification over
    these candidates is still exact FOR substitution-corrupted data (each
    substitution is one edit), which is what the declared ops_fuzzy_join
    asserts against DuckDB.

    Row identity: the part explode requires a ``.distinct()`` to collapse
    pairs matched through several parts, so ``extra_left`` /
    ``extra_right`` MUST together identify input rows uniquely (an id
    column) if the inputs can contain duplicate codes whose multiplicity
    matters — otherwise duplicate rows collapse to one output pair.  When
    either is omitted the output is the DISTINCT pair set by code value,
    which is the semantics the declared queries want.

    Codes are validated against ``code_len`` in-plan (``assert_true``):
    a row whose code length differs would silently produce a null
    distance from ``zip_with`` and vanish — misuse now fails the job
    loudly instead.
    """
    n_parts = max_mismatches + 1
    bounds = [(i * code_len) // n_parts for i in range(n_parts + 1)]

    def parts(code_col: str, side: str) -> F.Column:
        return F.array(
            *[
                F.struct(
                    F.lit(i).alias("part_idx"),
                    F.substring(
                        code_col, bounds[i] + 1, bounds[i + 1] - bounds[i]
                    ).alias("part_val"),
                )
                for i in range(n_parts)
            ]
        )

    def checked(code: str) -> F.Column:
        # fail loudly on a mis-sized code instead of dropping it silently
        return F.when(
            F.assert_true(
                F.length(code) == code_len,
                f"blocked_hamming_join: length({code}) != code_len={code_len}",
            ).isNull(),
            F.col(code),
        )

    lcols = [checked(left_code).alias("_lcode")] + [
        F.col(c) for c in (extra_left or [])
    ]
    rcols = [checked(right_code).alias("_rcode")] + [
        F.col(c) for c in (extra_right or [])
    ]
    lp = left.select(*lcols, F.explode(parts(left_code, "l")).alias("_p"))
    rp = right.select(*rcols, F.explode(parts(right_code, "r")).alias("_p"))
    cand = (
        lp.join(rp, lp["_p"] == rp["_p"])
        .drop("_p")
        .distinct()
    )
    # exact Hamming distance over the aligned codes: count differing
    # positions via one zip of the two char arrays (codegen, no UDF)
    dist = F.aggregate(
        F.zip_with(
            F.split(F.col("_lcode"), "(?!^)"),
            F.split(F.col("_rcode"), "(?!^)"),
            lambda a, b: (a != b).cast("int"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        cand.withColumn("dist", dist)
        .where(F.col("dist") <= max_mismatches)
        .withColumnRenamed("_lcode", "left_code")
        .withColumnRenamed("_rcode", "right_code")
    )


def qgram_levenshtein_join(
    left: DataFrame,
    right: DataFrame,
    left_code: str,
    right_code: str,
    max_edits: int = 1,
    q: int = 3,
    extra_left: list[str] | None = None,
    extra_right: list[str] | None = None,
    assume_min_len: int | None = None,
) -> DataFrame:
    """Edit-distance join tolerant of INSERTIONS/DELETIONS — the indel
    complement to ``blocked_hamming_join`` (whose part blocking breaks the
    moment an indel shifts positions).

    Candidate filter is q-gram count filtering (Gravano et al., VLDB'01):
    one edit destroys at most ``q`` of a string's overlapping q-grams, so
    any pair within ``max_edits`` shares at least
    ``max(len_l, len_r) − q + 1 − max_edits·q`` q-grams AS A MULTISET.
    The multiset intersection is computed exactly by numbering each
    gram's occurrences within its string and equi-joining on
    (gram, occurrence) — no cross join anywhere; exact ``levenshtein``
    runs only on pairs passing the count bound.

    Scale shape: gram explode is corpus-linear (≈len rows per string);
    the candidate join shuffles on the gram value — selective for
    high-entropy codes; for natural-language keys pick a larger ``q`` or
    add the LSH bucket cap (functions/dedup.py) for stop-gram skew. The
    occurrence numbers are computed IN-ARRAY before the explode (one
    codegen'd higher-order expression, zero shuffle) — a
    row_number-over-(id, gram) window does the same job but costs a full
    shuffle into per-string micro-partitions, measured 3× slower on the
    declared query. In-array numbering is O(len²/q) per string: the right
    trade for identifier/code joins; revisit for multi-KB strings.

    Validity envelope (len, q, k): the count bound is a REAL filter only
    when it is positive, i.e. ``max(len_l, len_r) > q·(k+1) − 1``.  Any
    within-distance pair where BOTH strings have
    ``length ≤ q·(k+1) − 1`` (q=3, k=2 → 8; q=4, k=2 → 11; q=3, k=5 → 17)
    can share zero q-grams, so the gram path alone would silently miss
    it; strings shorter than ``q`` have no grams at all.  Such pairs are
    handled by a supplemental SHORT×SHORT path: both sides filtered to
    ``length ≤ q·(k+1) − 1``, candidates blocked on a ±k length window
    (an equi-join after a 2k+1 length explode — no cross join), exact
    ``levenshtein`` verify, distinct-unioned with the gram candidates.
    A pair of one short and one long string always has
    ``max(len) > q·(k+1) − 1`` (since lengths differ by ≤ k), so the
    gram bound covers it — the decomposition is complete for every
    length combination (property-tested against a brute-force
    levenshtein join at k=1..5, tests/test_joins.py).  The short
    population is strings of bounded length (≤ 17 even at q=3, k=5), so
    the length-window fan-out stays tiny; like the main path, multiset
    multiplicity of output pairs requires ``extra_*`` to carry a unique
    row id (the candidate union is ``distinct`` over ids+codes).

    ``assume_min_len``: callers with a KNOWN minimum code length
    > q·(k+1) − 1 (fixed-length identifiers, hashes) pass it to skip the
    short path entirely — the claim is ENFORCED in-plan (``assert_true``
    on every code), so a violating row fails the job rather than
    silently losing completeness.
    """
    def grams(df: DataFrame, code: str, id_cols: list[str], side: str) -> DataFrame:
        # clamp: strings shorter than q have NO grams (an unclamped
        # sequence(1, len-q+1) is DESCENDING for len < q and substr with
        # position ≤ 0 fabricates end-anchored garbage grams)
        ga = F.expr(
            f"IF(length(_{side}code) >= {q},"
            f" transform(sequence(1, length(_{side}code) - {q - 1}),"
            f" i -> substr(_{side}code, CAST(i AS INT), {q})),"
            f" CAST(array() AS array<string>))"
        )
        # occ of position i = 1 + occurrences of the same gram before i —
        # pure array expression, so the gram stage never shuffles
        pairs = F.expr(
            "transform(sequence(1, size(_ga)), i -> struct("
            " element_at(_ga, i) AS g,"
            " size(filter(slice(_ga, 1, i), x -> x = element_at(_ga, i))) AS occ))"
        )
        return (
            df.select(*id_cols, F.col(code).alias(f"_{side}code"))
            .withColumn("_ga", ga)
            .where(F.size("_ga") > 0)  # gram-less rows: short path only
            .select(*id_cols, f"_{side}code", F.explode(pairs).alias("_p"))
            .select(
                *id_cols,
                f"_{side}code",
                F.col("_p.g").alias("_g"),
                F.col("_p.occ").alias("_occ"),
            )
        )

    lids = extra_left or []
    rids = extra_right or []
    short_len = q * (max_edits + 1) - 1
    skip_short = assume_min_len is not None and assume_min_len > short_len
    if skip_short:
        # enforce the caller's length claim in-plan: a violating row would
        # re-open the vacuous-bound hole, so it fails the job loudly
        def enforced(df: DataFrame, code: str) -> DataFrame:
            # assert_true returns null on pass — the when() wrapper keeps
            # the column value while forcing the assertion's evaluation
            # (a bare tautological filter could be simplified away)
            chk = F.assert_true(
                F.length(code) >= assume_min_len,
                f"qgram_levenshtein_join: length({code}) < assume_min_len="
                f"{assume_min_len}",
            )
            return df.withColumn(code, F.when(chk.isNull(), F.col(code)))

        left = enforced(left, left_code)
        right = enforced(right, right_code)
    lg = grams(left, left_code, lids, "l")
    rg = grams(right, right_code, rids, "r")
    bound = (
        F.greatest(F.length("_lcode"), F.length("_rcode"))
        - F.lit(q - 1)
        - F.lit(max_edits * q)
    )
    gram_cand = (
        lg.join(rg, ["_g", "_occ"])
        .groupBy(*lids, *rids, "_lcode", "_rcode")
        .agg(F.count(F.lit(1)).alias("_shared"))
        .where(F.col("_shared") >= bound)
    )

    pair_cols = [*lids, *rids, "_lcode", "_rcode"]
    if skip_short:
        # every string is provably long enough for the count bound to be
        # ≥ 1; gram_cand is already distinct by its groupBy keys
        all_pairs = gram_cand.select(*pair_cols)
    else:
        # supplemental short×short path: the length regime where the count
        # bound is vacuous (docstring envelope) — length-window blocking,
        # bounded fan-out of 2k+1 per row, never a cross join
        ls = left.select(*lids, F.col(left_code).alias("_lcode")).where(
            F.length("_lcode") <= short_len
        )
        rs = (
            right.select(*rids, F.col(right_code).alias("_rcode"))
            .where(F.length("_rcode") <= short_len)
            .withColumn(
                "_lb",
                F.explode(
                    F.sequence(
                        F.length("_rcode") - max_edits, F.length("_rcode") + max_edits
                    )
                ),
            )
        )
        short_cand = ls.join(rs, F.length(ls["_lcode"]) == rs["_lb"]).drop("_lb")
        all_pairs = (
            gram_cand.select(*pair_cols)
            .unionByName(short_cand.select(*pair_cols))
            .distinct()
        )
    return (
        all_pairs.withColumn("dist", F.levenshtein("_lcode", "_rcode").cast("bigint"))
        .where(F.col("dist") <= max_edits)
        .withColumnRenamed("_lcode", "left_code")
        .withColumnRenamed("_rcode", "right_code")
    )
