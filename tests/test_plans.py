"""Physical-plan regression tests: lock in the plans SCALE.md argues from.

These assert optimizer *behavior*, not exact plan text: filters/projection
reach the scan, dimension joins broadcast, CDC dedup gets the partial
top-k (WindowGroupLimit) before the shuffle, and salted aggregation keeps
exactly its two exchanges.
"""

from __future__ import annotations

import contextlib
import io

from arcane_stream_microsoft_synapse_link_spark.plans import QUERIES

from .conftest import SF_SMOKE


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_scan_pushdown_q1(spark):
    plan = plan_of(QUERIES["q1_scan_filter_sort"](spark, SF_SMOKE))
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)" in plan
    # column pruning: 3-column read schema, not the 16-column table
    assert "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>" in plan


def test_dimension_joins_broadcast_q4(spark):
    plan = plan_of(QUERIES["q4_multiway_join"](spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 3  # no fact-table shuffle joins
    assert "SortMergeJoin" not in plan


def test_cdc_dedup_partial_topk_q21(spark):
    """The B8 dedup primitive must reduce per-key rows map-side before the
    exchange — the 100 TB difference between shuffling the batch and
    shuffling ~|keys|."""
    plan = plan_of(QUERIES["q21_cdc_dedup_latest"](spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan
    first_wgl = plan.index("WindowGroupLimit")
    assert "Exchange" in plan[first_wgl:], "expected a partial WindowGroupLimit before the shuffle"


def test_salted_distinct_two_exchanges(spark):
    plan = plan_of(QUERIES["ops_salted_distinct"](spark, SF_SMOKE))
    # the skew-splitting shuffle actually partitions by the value salt …
    assert "_vsalt" in plan
    # … and the path stays pure hash-agg: no Expand blowup, ≤4 exchanges
    # (distinct pre-agg on keys+salt+value, phase-1, phase-2, final sort)
    assert plan.count("Exchange (") <= 4
    assert "Expand" not in plan


def test_sessionize_single_window_shuffle(spark):
    plan = plan_of(QUERIES["ops_sessionize"](spark, SF_SMOKE))
    # window partitioning (user) is reused by the groupBy(user, sid) agg:
    # expect exchanges only for the window and the final orderBy range sort
    assert plan.count("hashpartitioning(user_id") <= 1

def test_range_join_binned_no_nested_loop(spark):
    """The keyless interval join must be the bin-id equi-join, never a
    nested-loop/cartesian over the corpus."""
    plan = plan_of(QUERIES["ops_range_join_binned"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stratified_sample_partial_topk(spark):
    """Per-stratum top-k must reduce map-side (WindowGroupLimit before the
    exchange) — the shuffle carries O(strata*k), not the corpus."""
    plan = plan_of(QUERIES["ops_stratified_sample"](spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan
    assert "Exchange" in plan[plan.index("WindowGroupLimit"):]


def test_asof_union_single_key_shuffle(spark):
    """The as-of join is one shuffle on the key (window sort), not a
    per-row re-aggregation of the right side."""
    plan = plan_of(QUERIES["ops_asof_union"](spark, SF_SMOKE))
    assert plan.count("hashpartitioning(_k") <= 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_decontaminate_broadcasts_benchmark(spark):
    """The corpus side must never shuffle: benchmark grams and hit ids
    arrive via broadcast joins (semi + anti)."""
    plan = plan_of(QUERIES["ops_decontaminate"](spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_repetition_filter_two_agg_exchanges(spark):
    """One scan + the two partial-agg shuffles + the final sort — nothing
    else (no join back to the corpus, no extra exchange)."""
    plan = plan_of(QUERIES["ops_repetition_filter"](spark, SF_SMOKE))
    assert plan.count("Exchange (") <= 3
    assert "Join" not in plan


def test_no_rows_only_entries_remain(spark):
    """r7 (VERDICT r6 item 2): every declared entry is oracle-backed —
    the last three engine-specific estimators (HLL sketch, HLL++
    approx-distinct, percentile_approx) now declare their CONTRACT (exact
    value + within_bound boolean), which DuckDB can hash-verify.  The
    within_bound column must actually come back TRUE (the estimator holds
    its bound) — a red here means the estimate drifted past the declared
    tolerance, which the driver gate would surface as a hash mismatch."""
    from arcane_stream_microsoft_synapse_link_spark.plans import ORACLE

    rows_only = [n for n in QUERIES if n not in ORACLE]
    assert rows_only == [], rows_only
    for name in ("ops_hll_sketch", "ops_approx_distinct", "ops_percentile"):
        rows = QUERIES[name](spark, SF_SMOKE).collect()
        assert rows and all(r["within_bound"] for r in rows), name


def test_boilerplate_spans_no_cartesian(spark):
    """Gram explosion is corpus-linear and scanned once: instances reduce
    to (gram, doc) counts BEFORE the doc-frequency window, so the window
    runs over the reduced pairs — never a cross product, never a second
    explode/join of raw gram instances."""
    plan = plan_of(QUERIES["ops_boilerplate_spans"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    i = plan.index("Window")
    j = plan.index("Generate", i)  # the gram explode below it
    # between the window and the gram-instance Generate sits the
    # (gram, doc) aggregate: the window input is reduced pairs
    assert "HashAggregate" in plan[i:j], plan[i:j]
    # single scan: exactly one Generate node (gram explode) in the tree
    assert plan.count("Generate (") == 1


def test_token_rarity_window_is_vocab_sized(spark):
    """The only window (the rank) runs AFTER the vocab aggregation — over
    word/cnt, never over per-instance corpus rows."""
    plan = plan_of(QUERIES["ops_token_rarity"](spark, SF_SMOKE))
    i = plan.index("Window")
    j = plan.index("Generate", i)  # the token explode below it
    # between the window and the raw-token Generate sits the vocab aggregate:
    # the window's direct input is (word, cnt), never per-instance rows
    assert "HashAggregate" in plan[i:j], plan[i:j]
    assert "CartesianProduct" not in plan


def test_hash_split_single_agg_shuffle(spark):
    """Content-keyed split: one scan, one partial-agg exchange on
    (source, split), the sort — no join, no window."""
    plan = plan_of(QUERIES["ops_hash_split"](spark, SF_SMOKE))
    assert plan.count("Exchange (") <= 2  # agg shuffle + final sort range
    assert "Join" not in plan and "Window" not in plan


def test_substring_dedup_no_inlined_winnowing(spark):
    """Regression guard for the InferFiltersFromGenerate trap: the gram
    array must stay a bound column reference inside the window-minima
    slices — an optimized plan containing ``slice(transform(`` means the
    whole gram computation was inlined per window (observed ~180×
    slowdown). explode_outer + the post-Generate null filter keep the
    rule away."""
    from arcane_stream_microsoft_synapse_link_spark.catalog import Tables
    from arcane_stream_microsoft_synapse_link_spark.functions.dedup import (
        substring_span_stats,
    )

    docs = Tables(spark, SF_SMOKE).documents
    df = substring_span_stats(docs, materialize=False)  # lazy: full tree visible
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "slice(transform(" not in plan
    assert "explode" in plan.lower()


def test_winsorize_single_scan(spark):
    plan = plan_of(QUERIES["ops_winsorize"](spark, SF_SMOKE))
    # tree form "Scan parquet  (N" appears once per physical scan (the
    # formatted details section repeats it as "(N) Scan parquet")
    assert plan.count("Scan parquet  (") == 1  # bounds via window, no rescan+join


def test_weighted_sample_global_topk_no_full_sort(spark):
    plan = plan_of(QUERIES["ops_weighted_sample"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan  # partial top-k, not a total sort


def test_semantic_dedup_one_shuffle_gemm(spark):
    plan = plan_of(QUERIES["ops_semantic_dedup"](spark, SF_SMOKE))
    # per-cluster GEMM via grouped pandas, keyed on the centroid shuffle
    assert "FlatMapGroupsInPandas" in plan


def test_bpe_merge_vocab_first(spark):
    """The word-frequency aggregate must run BEFORE pair explosion (pair
    work is O(vocab), not O(corpus)): the explode generator consumes the
    aggregated word column, so exactly one explode sits above the word
    count aggregate in the plan, and two hash aggregates exist (words,
    pairs)."""
    plan = plan_of(QUERIES["ops_bpe_merge_step"](spark, SF_SMOKE))
    assert plan.count("HashAggregate") >= 4  # 2 aggs × partial+final
    gen = plan.index("Generate")
    # the regexp token explode feeds the word agg; the pair explode is a
    # second Generate — both present
    assert plan.count("Generate") >= 2, plan[gen : gen + 200]


def test_hard_negatives_broadcast_queries(spark):
    plan = plan_of(QUERIES["ops_hard_negatives"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan  # map-side top-k pruning


def test_distribution_drift_single_corpus_scan(spark):
    """The per-language totals must come from a window over the reduced
    (lang, decile) rows, not a groupBy+join that re-derives the aggregate
    lineage — the join spelling plans a SECOND full corpus scan."""
    plan = plan_of(QUERIES["ops_distribution_drift"](spark, SF_SMOKE))
    assert plan.count("Scan parquet  (") == 1


def test_span_corruption_single_scan_one_explode(spark):
    plan = plan_of(QUERIES["ops_span_corruption"](spark, SF_SMOKE))
    assert plan.count("Scan parquet  (") == 1
    assert plan.count("Generate (") == 1  # one position explode, no rescan


def test_fuzzy_join_no_nested_loop(spark):
    """Both candidate-generation joins must be equi-joins on the half
    keys — never a cartesian/nested-loop similarity scan."""
    plan = plan_of(QUERIES["ops_fuzzy_join"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_join_indel_no_nested_loop(spark):
    plan = plan_of(QUERIES["ops_fuzzy_join_indel"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bigram_lm_two_corpus_scans(spark):
    """Train-then-score floor: exactly two physical corpus scans (model
    build + scoring re-join) — the prefix totals come from a window over
    the vocab²-sized model, never a third corpus aggregation."""
    plan = plan_of(QUERIES["ops_bigram_lm"](spark, SF_SMOKE))
    assert plan.count("Scan parquet  (") == 2, plan.count("Scan parquet  (")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_charset_gini_single_scan(spark):
    """Char histogram: one scan, map-side combine on (doc_id, ch), one
    moment agg — no join, no window."""
    plan = plan_of(QUERIES["ops_charset_gini"](spark, SF_SMOKE))
    assert plan.count("Scan parquet  (") == 1
    assert "Join" not in plan and "Window" not in plan


def test_bpe_encode_word_key_join_no_cartesian(spark):
    """bpe_encode: the per-doc totals come from ONE equi-join of the
    exploded corpus against the (tiny) encoded vocab — never a cartesian;
    the Python stage (word segmentation) runs over DISTINCT words only,
    behind an aggregate, so its input is vocab-sized."""
    plan = plan_of(QUERIES["ops_bpe_encode"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # the mapInPandas segmentation stage sits above a HashAggregate
    # (the distinct-words reduction), not above the raw exploded corpus
    i = plan.index("MapInPandas")
    assert "HashAggregate" in plan[i:], "segmentation must consume the distinct-word aggregate"


def test_image_near_dup_banded_no_cartesian(spark):
    """image_near_duplicates: candidates come from the banded equi-join
    on (band, chunk) — never an all-pairs product over the media table."""
    plan = plan_of(QUERIES["ops_image_near_dup"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_knn_index_probe_cell_pruning(spark):
    """The persisted-index probe reads only probed cells: the codes scan
    carries a centroid_id IN (...) filter below the ADC Python stage."""
    plan = plan_of(QUERIES["ops_knn_index_probe"](spark, SF_SMOKE))
    assert "centroid_id" in plan
    assert "INSET" in plan or "IN (" in plan.replace("IN(", "IN (")
    assert "CartesianProduct" not in plan


def test_audio_video_near_dup_banded_no_cartesian(spark):
    """The audio and video near-dup entries must get their candidates
    from banded equi-joins — never an all-pairs product."""
    for name in ("ops_audio_near_dup", "ops_video_near_dup"):
        plan = plan_of(QUERIES[name](spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_bpe_pack_window_over_doc_totals(spark):
    """ops_bpe_pack's running window runs over DOC-LEVEL token totals
    (one row per doc), never per-token corpus rows: the window's input
    side contains the per-doc aggregate."""
    plan = plan_of(QUERIES["ops_bpe_pack"](spark, SF_SMOKE))
    i = plan.index("Window")
    assert "HashAggregate" in plan[i:], "window must sit above the per-doc aggregate"
    assert "CartesianProduct" not in plan


def test_token_budget_window_is_boundary_bucket_sized(spark):
    """The selection must NOT globally sort the corpus: its only cumsum
    Window runs over the FILTERED boundary bucket (a `/ 1000` bucket
    equality sits below it), never the whole input."""
    plan = plan_of(QUERIES["ops_token_budget_select"](spark, SF_SMOKE))
    assert plan.count("Window (") == 1, plan.count("Window (")
    i = plan.index("Window (")
    below = plan[i:]
    assert "Filter" in below
    assert "/ 1000" in below, "cumsum window must sit above the bucket-equality filter"


def test_importance_weights_single_scoring_explode(spark):
    """The λ table is a collected-vocab LocalRelation (the corpus bigram
    aggregate ran ONCE during construction, not once per consumer); the
    returned scoring plan contains exactly the one score-pass explode
    joined against it."""
    plan = plan_of(QUERIES["ops_importance_weights"](spark, SF_SMOKE))
    assert plan.count("Generate (") == 1, plan.count("Generate (")
    assert "LocalTableScan" in plan  # the λ table
    assert "CartesianProduct" not in plan


def test_importance_weights_vocab_cut_is_takeordered(spark):
    """The vocabulary cut inside dsir_lambda_table must be TakeOrdered —
    never a full sort of the bigram count table."""
    from arcane_stream_microsoft_synapse_link_spark.functions.curation import (
        doc_bigrams,
    )
    from arcane_stream_microsoft_synapse_link_spark.catalog import Tables
    from pyspark.sql import functions as F

    t = Tables(spark, SF_SMOKE)
    counts = doc_bigrams(t.documents).groupBy("bigram").agg(F.count("*").alias("raw_cnt"))
    plan = plan_of(counts.orderBy(F.desc("raw_cnt"), F.asc("bigram")).limit(512))
    assert "TakeOrderedAndProject" in plan


def test_hybrid_retrieval_no_duplicated_corpus_subtrees(spark):
    """The postings table (tf) and the seed-term table are materialized
    once and fanned out — the returned plan re-reads the bounded
    checkpoints (ExistingRDD scans) instead of re-running corpus
    explodes per consumer; no cartesian blowup anywhere."""
    plan = plan_of(QUERIES["ops_hybrid_retrieval"](spark, SF_SMOKE))
    assert plan.count("Generate (") == 0, plan.count("Generate (")
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_quality_classifier_scoring_is_jvm_only(spark):
    """Training happens during plan construction (bounded partial-sum
    collects); the RETURNED scoring plan must be pure JVM — no Python
    evaluation node in the hot path."""
    plan = plan_of(QUERIES["ops_quality_classifier"](spark, SF_SMOKE))
    for marker in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan, marker


def test_leakage_safe_split_corpus_never_shuffle_joined(spark):
    """Cluster map and representative buckets are pair-graph-sized
    broadcasts: the corpus-side joins must all be broadcast, never
    sort-merge (a corpus shuffle), and no cartesian product."""
    plan = plan_of(QUERIES["ops_leakage_safe_split"](spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
