"""Training-data pipeline operators exposed as declared queries.

Every entry carries a DuckDB oracle (hash-checked by the driver):
SQL-expressible operators as direct SQL, graph-shaped ones (LSH pipelines,
ANN, mapInPandas plumbing) as literal-VALUES mirrors from independent
sequential references (plans/values_oracle.py), and the engine-specific
estimators (HLL, approx-percentile) as exact-value + ``within_bound``
contracts — with exact/recall pytest coverage in tests/test_functions.py
on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..functions import dedup as D
from ..functions import multimodal as M
from ..functions import similarity as S
from ..functions import text as X
from .oracle import ORACLE
from .queries import QUERIES, query
from ..session import local_df
from ..functions.web import CANON_URL_SQL as WB_CANON_URL_SQL
from ..functions.web import SYNTH_URL_SQL as WB_SYNTH_URL_SQL


# ---------------------------------------------------------------------------
# oracle-checked (deterministic, SQL-expressible)
# ---------------------------------------------------------------------------


@query("ops_exact_dedup")
def ops_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy (one shuffle on md5, not raw text)."""
    t = Tables(spark, sf_dir)
    return D.exact_dedup_groups(t.documents).orderBy("keeper_id")


ORACLE["ops_exact_dedup"] = """
    SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text) ORDER BY keeper_id
"""


@query("ops_text_stats")
def ops_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    txt = F.col("text")
    return (
        t.documents.select(
            "doc_id",
            X.token_count(txt).alias("n_tokens"),
            X.char_count(txt).alias("n_chars2"),
            X.punct_count(txt).alias("n_punct"),
            X.stopword_count(txt).alias("n_stop"),
        )
        .orderBy("doc_id")
    )


ORACLE["ops_text_stats"] = r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\S+')) AS n_tokens,
           length(text) AS n_chars2,
           len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
           len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS n_stop
    FROM documents ORDER BY doc_id
"""


@query("ops_lang_id")
def ops_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.documents.select("doc_id", X.lang_id(F.col("text")).alias("lang_pred")).orderBy("doc_id")


ORACLE["ops_lang_id"] = """
    SELECT doc_id,
           CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
                WHEN regexp_matches(text, '[Ѐ-ӿ]') THEN 'ru'
                WHEN regexp_matches(text, '[äöüß]') THEN 'de'
                WHEN regexp_matches(text, '[áéíóúñ¿¡]') THEN 'es'
                WHEN regexp_matches(text, '[àâçèêëîïôùûœ]') THEN 'fr'
                ELSE 'en' END AS lang_pred
    FROM documents ORDER BY doc_id
"""


@query("ops_fingerprint")
def ops_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.documents.select("doc_id", X.fingerprint_md5(F.col("text")).alias("fp")).orderBy("doc_id")


ORACLE["ops_fingerprint"] = "SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id"


@query("ops_word_jaccard_adjacent")
def ops_word_jaccard_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-set Jaccard between consecutive doc ids (bounded pair
    set; the LSH pipeline handles the unbounded case)."""
    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id", F.array_distinct(D.words(F.col("text"))).alias("w"))
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("w").alias("wa"))
    b = docs.select((F.col("doc_id") - 1).alias("id_a"), F.col("w").alias("wb"))
    # ppm quantization via FLOOR(j*1e6 + 0.5): the ratio is the same IEEE
    # division in both engines (identical int inputs), and floor of the
    # identical double is deterministic — unlike ROUND, whose tie policy
    # (and Spark's round-the-string-repr behavior) diverges across engines
    j = F.size(F.array_intersect("wa", "wb")) / F.greatest(
        F.size(F.array_union("wa", "wb")), F.lit(1)
    )
    return (
        a.join(b, "id_a")
        .select("id_a", F.floor(j * 1e6 + F.lit(0.5)).cast("bigint").alias("jaccard_w_ppm"))
        .orderBy("id_a")
    )


ORACLE["ops_word_jaccard_adjacent"] = """
    WITH w AS (SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS wl
               FROM documents)
    SELECT a.doc_id AS id_a,
           CAST(FLOOR(len(list_intersect(a.wl, b.wl)) /
                GREATEST(len(list_distinct(list_concat(a.wl, b.wl))), 1) * 1e6 + 0.5) AS BIGINT) AS jaccard_w_ppm
    FROM w a JOIN w b ON b.doc_id = a.doc_id + 1
    ORDER BY id_a
"""


@query("ops_tfidf_top_terms")
def ops_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (explode → tf/df aggs → broadcast
    join → per-doc window top-k), ppm-quantized for the hash compare."""
    t = Tables(spark, sf_dir)
    return X.tfidf_top_terms(t.documents, k=3).orderBy("doc_id", "rn")


ORACLE["ops_tfidf_top_terms"] = r"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               CAST(FLOOR(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df) * 1e6) AS BIGINT) AS tfidf_ppm
        FROM tf JOIN df USING (term) CROSS JOIN n)
    SELECT doc_id, term, tfidf_ppm,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf_ppm DESC, term) AS rn
    FROM scored
    QUALIFY rn <= 3
    ORDER BY doc_id, rn
"""


@query("ops_salted_distinct")
def ops_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe exact COUNT(DISTINCT): value-salted two-phase combine
    (operators/skew.py) — must equal the plain distinct count."""
    from ..operators.skew import salted_count_distinct

    t = Tables(spark, sf_dir)
    return salted_count_distinct(
        t.lineitem, ["l_returnflag"], "l_partkey", num_salts=16, out_name="dpart"
    ).orderBy("l_returnflag")


ORACLE["ops_salted_distinct"] = """
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS dpart
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query("ops_sessionize")
def ops_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-sessionization of events (4h idle gap), built-ins only —
    lag → running-sum session ids → hash agg, oracle-checked against the
    same rewrite in DuckDB. The custom-operator twins (mapInPandas batch,
    applyInPandasWithState streaming) are covered by tests/test_stateful.py."""
    from ..streaming.stateful import sessionize_sql

    from .queries import _cents100, _fixed_money

    t = Tables(spark, sf_dir)
    # value is an exact 2-decimal double: sum in bigint-cents fixed point
    # so accumulation is associative (exact integer addition) instead of
    # order-dependent double addition — the session agg's per-partition
    # order is not deterministic across engines (the former decimal(18,2)
    # cast paid a BigDecimal.setScale per row for the same rational value)
    events = t.events.withColumn("value", _cents100("value"))
    s = sessionize_sql(events, gap_s=14400)
    return s.select(
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        _fixed_money(F.col("total_value"), 2, round2=False).alias("total_value"),
    ).orderBy("user_id", "session_start")


ORACLE["ops_sessionize"] = """
    WITH m AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 14400 SECOND THEN 1 ELSE 0 END AS brk
        FROM events),
    g AS (
        SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM m)
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM g GROUP BY user_id, sid
    ORDER BY user_id, session_start
"""


@query("ops_token_bpe")
def ops_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenizer counts vs whitespace counts per document."""
    t = Tables(spark, sf_dir)
    txt = F.col("text")
    return t.documents.select(
        "doc_id",
        X.token_count(txt).alias("n_ws_tokens"),
        X.token_count_bpe(txt).alias("n_bpe_tokens"),
    ).orderBy("doc_id")


ORACLE["ops_token_bpe"] = r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
           len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+')) AS n_bpe_tokens
    FROM documents ORDER BY doc_id
"""


@query("ops_quality_score")
def ops_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/punct/stopword quality heuristic, quantized to parts-per-
    million via floor (no round-half tie policy → engine-stable hashes)."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.floor(X.quality_score(F.col("text")) * 1e6).cast("bigint").alias("quality_ppm"),
    ).orderBy("doc_id")


ORACLE["ops_quality_score"] = r"""
    WITH s AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS toks,
               CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS DOUBLE) AS stops,
               CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) AS punct,
               CAST(length(text) AS DOUBLE) AS chars
        FROM documents)
    SELECT doc_id,
           CAST(FLOOR((0.5 * LEAST(toks / 64.0, 1.0)
                     + 0.3 * LEAST(stops / GREATEST(toks, 1.0) * 5.0, 1.0)
                     + 0.2 * (1.0 - LEAST(punct / GREATEST(chars, 1.0) * 10.0, 1.0))) * 1e6)
                AS BIGINT) AS quality_ppm
    FROM s ORDER BY doc_id
"""


@query("ops_asof_union")
def ops_asof_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, scale path (operators/joins.py): per event the latest
    order date <= event ts for the same user, via union + one window sort
    per key — one shuffle total, vs Q22's per-row correlated aggregate."""
    from ..operators.joins import asof_join

    t = Tables(spark, sf_dir)
    events = t.events.select("event_id", "user_id", "ts")
    orders = t.orders.select(
        F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("odate")
    )
    out = asof_join(
        events, orders, on="user_id", left_ts="ts", right_ts="odate",
        value_col="odate", out_name="last_order_date",
    )
    return out.select(
        "event_id", F.col("last_order_date").cast("date").alias("last_order_date")
    ).orderBy("event_id")


# o_orderdate is a midnight-only timestamp in the test corpus; CAST to DATE
# on the aggregate keeps both engines day-granular.
ORACLE["ops_asof_union"] = """
    SELECT e.event_id,
           CAST((SELECT MAX(o.o_orderdate) FROM orders o
                 WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS DATE)
               AS last_order_date
    FROM events e ORDER BY e.event_id
"""


@query("ops_range_join_binned")
def ops_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/point join with no equi-key — 2-hour "activity windows"
    anchored at the top-100 purchase events (by value), counting ALL
    events inside each window — rewritten as a bin-id equi-join
    (operators/joins.py). The vanilla spelling is a nested-loop join; the
    binned form shuffles on bin id and scales to arbitrarily many
    intervals. Epochs in microseconds so the residual filter is exact
    against the oracle's full-precision timestamp BETWEEN."""
    from ..operators.joins import range_join_binned

    t = Tables(spark, sf_dir)
    span_us = 7200 * 1_000_000
    intervals = (
        t.events.where(F.col("event_type") == "purchase")
        .orderBy(F.desc("value"), "event_id")
        .limit(100)
        .select(
            F.col("event_id").alias("anchor_id"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("lo_us"),
            (F.unix_micros(F.col("ts").cast("timestamp")) + span_us).alias("hi_us"),
        )
    )
    points = t.events.select(F.unix_micros(F.col("ts").cast("timestamp")).alias("ev_us"))
    pairs = range_join_binned(points, intervals, "ev_us", "lo_us", "hi_us", bin_width=span_us)
    return (
        pairs.groupBy("anchor_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy("anchor_id")
    )


ORACLE["ops_range_join_binned"] = """
    WITH iv AS (
        SELECT event_id AS anchor_id, ts AS lo
        FROM events WHERE event_type = 'purchase'
        ORDER BY value DESC, event_id LIMIT 100)
    SELECT iv.anchor_id, COUNT(*) AS n_events
    FROM iv JOIN events e ON e.ts BETWEEN iv.lo AND iv.lo + INTERVAL 7200 SECOND
    GROUP BY iv.anchor_id ORDER BY iv.anchor_id
"""


@query("ops_stratified_sample")
def ops_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for training-data curation:
    md5(text) as the per-stratum pseudo-random order, top-50 docs per
    language. WindowGroupLimit reduces each map partition to its per-lang
    top-50 BEFORE the shuffle, so at 100 TB the exchange carries
    O(strata * k) rows, not the corpus."""
    t = Tables(spark, sf_dir)
    from pyspark.sql import Window as W

    w = W.partitionBy("lang").orderBy(F.md5("text"), "doc_id")
    return (
        t.documents.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 50)
        .select("lang", "doc_id", "rn")
        .orderBy("lang", "rn")
    )


ORACLE["ops_stratified_sample"] = """
    SELECT lang, doc_id,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rn
    FROM documents
    QUALIFY rn <= 50
    ORDER BY lang, rn
"""


@query("ops_curation_pipeline")
def ops_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation, oracle-checked: quality filter
    (floor-ppm >= 0.3) → exact dedup (keep min doc_id per content hash) →
    per-language deterministic sample (md5 order, top 100) → per-language
    doc + token budget. Every stage is the scale-path form: hash-key
    shuffle for dedup, WindowGroupLimit for the sample, map-side partial
    agg for the budget."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    good = t.documents.where(
        F.floor(X.quality_score(F.col("text")) * 1e6) >= 300_000
    )
    unique = D.drop_exact_duplicates(good)
    w = W.partitionBy("lang").orderBy(F.md5("text"), "doc_id")
    sampled = unique.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 100)
    return (
        sampled.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(X.token_count(F.col("text"))).cast("bigint").alias("total_tokens"),
        )
        .orderBy("lang")
    )


ORACLE["ops_curation_pipeline"] = r"""
    WITH q AS (
        SELECT doc_id, lang, text,
               CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS toks,
               CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS DOUBLE) AS stops,
               CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) AS punct,
               CAST(length(text) AS DOUBLE) AS chars
        FROM documents),
    good AS (
        SELECT doc_id, lang, text, toks FROM q
        WHERE FLOOR((0.5 * LEAST(toks / 64.0, 1.0)
                   + 0.3 * LEAST(stops / GREATEST(toks, 1.0) * 5.0, 1.0)
                   + 0.2 * (1.0 - LEAST(punct / GREATEST(chars, 1.0) * 10.0, 1.0))) * 1e6)
              >= 300000),
    uniq AS (
        SELECT * FROM good
        QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
    sampled AS (
        SELECT * FROM uniq
        QUALIFY ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) <= 100)
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS total_tokens
    FROM sampled GROUP BY lang ORDER BY lang
"""


@query("ops_repetition_filter")
def ops_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters: per-doc duplicate-word and
    top-bigram fractions as exact ppm integers (functions/text.py:
    repetition_metrics — one scan + two partial-agg shuffles)."""
    t = Tables(spark, sf_dir)
    return X.repetition_metrics(t.documents).orderBy("doc_id")


ORACLE["ops_repetition_filter"] = r"""
    WITH w AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS words
        FROM documents),
    base AS (
        SELECT doc_id,
               CAST(len(words) AS BIGINT) AS total_w,
               CAST(len(list_distinct(words)) AS BIGINT) AS dist_w,
               list_transform(range(1, len(words)),
                              i -> words[i] || ' ' || words[i + 1]) AS gl
        FROM w),
    pg AS (
        SELECT doc_id, gram, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(gl) AS gram FROM base)
        GROUP BY doc_id, gram),
    mx AS (SELECT doc_id, MAX(c) AS max_c FROM pg GROUP BY doc_id)
    SELECT b.doc_id, b.total_w,
           CASE WHEN b.total_w > 0
                THEN ((b.total_w - b.dist_w) * 1000000) // b.total_w
                ELSE CAST(0 AS BIGINT) END AS dup_word_ppm,
           CASE WHEN len(b.gl) > 0
                THEN (mx.max_c * 1000000) // CAST(len(b.gl) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS top_bigram_ppm
    FROM base b LEFT JOIN mx USING (doc_id)
    ORDER BY doc_id
"""


@query("ops_decontaminate")
def ops_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: drop corpus docs sharing any word 8-gram
    with the benchmark set (source 'src0' stands in for an eval suite).
    Broadcast semi-join on exploded grams — no corpus shuffle
    (functions/dedup.py:decontaminate)."""
    t = Tables(spark, sf_dir)
    bench = t.documents.where(F.col("source") == "src0")
    corpus = t.documents.where(F.col("source") != "src0")
    return D.decontaminate(corpus, bench, n=8).select("doc_id").orderBy("doc_id")


ORACLE["ops_decontaminate"] = r"""
    WITH w AS (
        SELECT doc_id, source,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS words
        FROM documents),
    g AS (
        SELECT doc_id, source,
               unnest(list_transform(range(1, len(words) - 6),
                      i -> array_to_string(list_slice(words, i, i + 7), ' '))) AS gram
        FROM w),
    bad AS (
        SELECT DISTINCT doc_id FROM g
        WHERE source <> 'src0'
          AND gram IN (SELECT gram FROM g WHERE source = 'src0'))
    SELECT doc_id FROM documents
    WHERE source <> 'src0' AND doc_id NOT IN (SELECT doc_id FROM bad)
    ORDER BY doc_id
"""


@query("ops_shuffle_shard")
def ops_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded shuffle-shard for training export: shard and
    in-shard position are pure functions of (doc_id, seed) — reproducible
    across runs and engines (functions/export.py; the write path is
    write_training_shards, one shuffle, partitioned parquet)."""
    from ..functions import export as E

    t = Tables(spark, sf_dir)
    out = E.seeded_shuffle_shards(t.documents.select("doc_id"), num_shards=8, seed=7)
    return out.select("doc_id", "shard", "pos").orderBy("shard", "pos")


ORACLE["ops_shuffle_shard"] = """
    -- the engine's 31-bit xorshift-multiply mix, seed 7:
    -- x0 = pmod(id + 7*507111937 mod 2^31, 2^31); two rounds of
    -- x = (x*73244475) mod 2^31; x ^= x >> 16   (double-mod = pmod)
    WITH h0 AS (
        SELECT doc_id,
               ((doc_id + 1402299911) % 2147483648 + 2147483648) % 2147483648 AS x
        FROM documents),
    h1 AS (SELECT doc_id, xor((x * 73244475) % 2147483648,
                              ((x * 73244475) % 2147483648) >> 16) AS x FROM h0),
    h2 AS (SELECT doc_id, xor((x * 73244475) % 2147483648,
                              ((x * 73244475) % 2147483648) >> 16) AS _h FROM h1),
    s AS (
        SELECT doc_id, _h, CAST(_h % 8 AS BIGINT) AS shard FROM h2)
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY _h, doc_id) AS BIGINT) AS pos
    FROM s ORDER BY shard, pos
"""


@query("ops_exact_percentiles_dist")
def ops_exact_percentiles_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles via distributed rank selection — the 100 TB path
    for what q30 computes with the single-reducer ``percentile`` aggregate
    (operators/quantiles.py: one range shuffle, offsets as driver
    metadata, interpolation bit-identical to the builtin)."""
    from ..operators.quantiles import exact_percentiles

    t = Tables(spark, sf_dir)
    # interpolation="cont" mirrors quantile_cont's float expression
    # (v_lo + (h-lo)·(v_hi-v_lo)) — the resulting doubles are
    # BIT-IDENTICAL to DuckDB's (verified), so no rounding is needed
    # (and Spark's ROUND-on-double would break the match anyway: it
    # rounds the shortest string repr, DuckDB rounds the binary value)
    out = exact_percentiles(t.events, "value", [0.25, 0.5, 0.75, 0.95], interpolation="cont")
    # the label is emitted as integer percent (25/50/75/95): a DECIMAL
    # column — even a constant one — never hash-matches the driver's hasher
    return out.select(
        F.round(F.col("p") * 100).cast("bigint").alias("p_pct"), "value"
    ).orderBy("p_pct")


ORACLE["ops_exact_percentiles_dist"] = """
    SELECT 25 AS p_pct, quantile_cont(value, 0.25) AS value FROM events
    UNION ALL
    SELECT 50, quantile_cont(value, 0.50) FROM events
    UNION ALL
    SELECT 75, quantile_cont(value, 0.75) FROM events
    UNION ALL
    SELECT 95, quantile_cont(value, 0.95) FROM events
    ORDER BY p_pct
"""


@query("ops_source_overlap")
def ops_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health: per source pair, how many documents share an
    identical 80-char opening (boilerplate/mirror detection — the cheap
    proxy that feeds crawl/source dedup priorities). Shuffle is on the md5
    prefix digest — one hash-join keyed by digest, never on raw text;
    source pairs are emitted distinct per (hash, pair) then counted."""
    t = Tables(spark, sf_dir)
    h = t.documents.select(F.md5(F.substring("text", 1, 80)).alias("h"), "source")
    a = h.select("h", F.col("source").alias("src_a"))
    b = h.select("h", F.col("source").alias("src_b"))
    pairs = (
        a.join(b, "h")
        .where(F.col("src_a") < F.col("src_b"))
        .select("h", "src_a", "src_b")
        .distinct()
    )
    return (
        pairs.groupBy("src_a", "src_b")
        .agg(F.count("*").cast("bigint").alias("shared_docs"))
        .orderBy(F.desc("shared_docs"), "src_a", "src_b")
    )


ORACLE["ops_source_overlap"] = """
    WITH h AS (SELECT md5(substr(text, 1, 80)) AS h, source FROM documents),
    pairs AS (
        SELECT DISTINCT a.h, a.source AS src_a, b.source AS src_b
        FROM h a JOIN h b ON a.h = b.h AND a.source < b.source)
    SELECT src_a, src_b, COUNT(*) AS shared_docs
    FROM pairs GROUP BY src_a, src_b
    ORDER BY shared_docs DESC, src_a, src_b
"""


@query("ops_pii_scrub")
def ops_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails/phones/IPv4): chained regexp built-ins, one
    codegen'd projection, no shuffle (functions/text.py:scrub_pii). The
    scrubbed text is md5-fingerprinted so the declared result stays small;
    planted-PII behavior is unit-tested."""
    t = Tables(spark, sf_dir)
    out = X.scrub_pii(t.documents)
    return out.select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ip",
        F.md5("text_scrubbed").alias("scrub_md5"),
    ).orderBy("doc_id")


ORACLE["ops_pii_scrub"] = r"""
    WITH s1 AS (
        SELECT doc_id, text,
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
        FROM documents),
    s2 AS (
        SELECT *, regexp_replace(t1, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS t2
        FROM s1)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t1, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ip,
           CAST(len(regexp_extract_all(t2, '\+?[0-9][0-9()\s.-]{7,}[0-9]')) AS BIGINT) AS n_phone,
           md5(regexp_replace(t2, '\+?[0-9][0-9()\s.-]{7,}[0-9]', '<PHONE>', 'g')) AS scrub_md5
    FROM s2 ORDER BY doc_id
"""


@query("ops_text_chunking")
def ops_text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping word-window chunking (64-word chunks, 16-word overlap)
    — LLM context preprocessing as one codegen'd projection+generate, no
    shuffle (functions/text.py:chunk_documents)."""
    t = Tables(spark, sf_dir)
    return X.chunk_documents(t.documents).orderBy("doc_id", "chunk_id")


ORACLE["ops_text_chunking"] = r"""
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        FROM documents WHERE length(trim(text)) > 0),
    n AS (
        SELECT doc_id, ws,
               GREATEST(CAST(CEIL((len(ws) - 16.0) / 48.0) AS BIGINT), 1) AS nc
        FROM w),
    e AS (SELECT doc_id, ws, unnest(range(0, nc)) AS chunk_id FROM n)
    SELECT doc_id, chunk_id,
           array_to_string(ws[chunk_id*48+1 : chunk_id*48+64], ' ') AS chunk
    FROM e ORDER BY doc_id, chunk_id
"""


_BM25_TERMS = ["spark", "data", "merge"]


@query("ops_bm25")
def ops_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance vs a fixed query-term set (k1=1.2, b=0.75),
    integer-ppm deterministic (functions/text.py:bm25_scores)."""
    t = Tables(spark, sf_dir)
    return X.bm25_scores(t.documents, _BM25_TERMS).orderBy("doc_id")


ORACLE["ops_bm25"] = """
    WITH d AS (
        SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS dl
        FROM documents),
    toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks
        WHERE term IN ('spark', 'data', 'merge') GROUP BY doc_id, term),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM d),
    scored AS (
        SELECT tf.doc_id,
               LN((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                 * (tf * 2.2)
                 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / (CAST(sum_dl AS DOUBLE) / n_docs))))
                 AS score
        FROM tf JOIN dfreq USING (term) JOIN d USING (doc_id) CROSS JOIN stats)
    SELECT doc_id, CAST(SUM(FLOOR(score * 1e6)) AS BIGINT) AS bm25_ppm
    FROM scored GROUP BY doc_id ORDER BY doc_id
"""


@query("ops_token_packing")
def ops_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM training: concatenate documents per
    language in doc_id order and chop into 4096-token training windows
    (doc's window = floor(tokens-before-it / budget) — the
    concat-and-chop rule). One window sort per stratum; at 100 TB,
    sub-shard the stratum key for parallelism and pack per shard."""
    from pyspark.sql import Window as W

    budget = 4096
    t = Tables(spark, sf_dir)
    toks = t.documents.select(
        "doc_id", "lang", X.token_count(F.col("text")).alias("n_tok")
    )
    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    packed = toks.withColumn(
        "seq_id", F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / budget).cast("bigint")
    )
    return (
        packed.groupBy("lang", "seq_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("seq_tokens"),
        )
        .orderBy("lang", "seq_id")
    )


ORACLE["ops_token_packing"] = r"""
    WITH toks AS (
        SELECT doc_id, lang, len(regexp_extract_all(text, '\S+')) AS n_tok
        FROM documents),
    packed AS (
        SELECT lang, n_tok,
               CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - n_tok) / 4096.0) AS BIGINT) AS seq_id
        FROM toks)
    SELECT lang, seq_id, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS seq_tokens
    FROM packed GROUP BY lang, seq_id ORDER BY lang, seq_id
"""


@query("ops_hll_sketch")
def ops_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL (Apache DataSketches) cardinality per group — the
    100 TB distinct-count path: per-partition sketches combine
    associatively, so the shuffle carries fixed-size sketch buffers, never
    value sets.

    Oracle-backed since r7 (VERDICT r6 item 2): an engine-specific
    estimate can never hash-match another engine, so the DECLARED form is
    the estimator's CONTRACT — the exact per-group count plus a
    ``within_bound`` boolean asserting the in-engine sketch estimate is
    within 2% of it (lgK=14 → rsd ≈ 0.81%, so 2% is a hard determinism
    bound, not a flaky tolerance).  DuckDB oracles the exact column and
    ``TRUE``; an estimator regression flips ``within_bound`` and goes
    hash-red at the gate.  tests/test_functions.py additionally checks
    sketch merge-equality."""
    t = Tables(spark, sf_dir)
    # spread the 3-split scan: the per-row sketch update + distinct expand
    # is CPU-bound (r14 measured 1.8 s in 3 tasks; no-op at scale)
    base = D.spread_small_scan(t.lineitem.select("l_returnflag", "l_partkey"))
    return (
        base.groupBy("l_returnflag")
        .agg(
            F.count_distinct(F.col("l_partkey")).cast("bigint").alias("exact_parts"),
            F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey", F.lit(14)))
            .cast("bigint")
            .alias("_apx"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("_apx") - F.col("exact_parts")) * 1000000
                <= F.lit(20000) * F.col("exact_parts")
            ).alias("within_bound"),
        )
        .orderBy("l_returnflag")
    )


ORACLE["ops_hll_sketch"] = """
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_bound
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# rows-only declared queries (non-SQL-expressible pipelines)
# ---------------------------------------------------------------------------


@query("ops_minhash_near_dup")
def ops_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed since r6: LSH candidates + exact Jaccard verify in
    EXACT-INTEGER form (intersection/union sizes, rational threshold
    inter/union ≥ 1/2 by cross-multiplication) — hash-compared against a
    sequential MinHash reference (plans/values_oracle.py:
    ref_minhash_near_dup, pinned to sf0.01)."""
    t = Tables(spark, sf_dir)
    cands = D.lsh_candidate_pairs(t.documents)
    out = D.verify_jaccard_counts(
        t.documents, cands, threshold_num=1, threshold_den=2
    )
    return out.orderBy("id_a", "id_b")


@query("ops_simhash_near_dup")
def ops_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed since r6 (VERDICT r5 item 2b): the pair set is a
    pure function of the corpus, so the driver hash-compares it against
    an independent sequential SimHash reference rendered as literal
    VALUES (plans/values_oracle.py:ref_simhash_near_dup, pinned to the
    gate's sf0.01 compare scale via ORACLE_SF)."""
    t = Tables(spark, sf_dir)
    out = D.simhash_near_duplicates(t.documents, max_hamming=8)
    return out.select(
        "id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming")
    ).orderBy("id_a", "id_b")


@query("ops_fingerprint_rolling")
def ops_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed since r6: order-sensitive blake2b gram fold is
    deterministic per document, hash-compared against the sequential
    reference (plans/values_oracle.py:ref_fingerprint_rolling)."""
    t = Tables(spark, sf_dir)
    return X.rolling_fingerprints_np(t.documents).orderBy("doc_id")


@query("ops_dedup_pipeline")
def ops_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup: exact (hash) → MinHash near-dup pairs → connected
    components → keep one representative per cluster.  Oracle-backed
    since r6: the kept-id set is a pure function of the corpus, so the
    driver hash-compares it against a sequential exact-dedup + LSH +
    union-find reference (plans/values_oracle.py:ref_dedup_pipeline,
    pinned to sf0.01); the iterative component resolution itself stays
    adaptive (driver union-find under the size probe, distributed
    min-label propagation above it)."""
    t = Tables(spark, sf_dir)
    # exact-dedup output feeds three branches (signatures, Jaccard verify,
    # final anti-join) — materialize once instead of recomputing the
    # hash-groupBy per branch
    exact = D.drop_exact_duplicates(t.documents).localCheckpoint(eager=False)
    pairs = D.minhash_near_duplicates(exact, threshold=0.5)
    kept = D.drop_near_duplicates(exact, pairs)
    return kept.select("doc_id").orderBy("doc_id")


@query("ops_embedding_near_dup")
def ops_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: sign-LSH buckets → exact cosine verify.

    Parameters are tuned to the declared corpus (VERDICT r5 item 3: at
    threshold 0.9 the synthetic near-uniform embeddings contain NO
    qualifying pairs at any sf, so the gate entry pinned nothing):
    cosine ≥ 0.4 with 8-bit LSH bands yields 15/9/185 pairs at
    sf0.001/0.01/0.1.  Oracle-backed since r6: cosine emitted as ×1e6
    fixed point and hash-compared against a sequential sign-LSH +
    exact-cosine reference that mirrors the JVM's float32-product fold
    over the raw float arrays (plans/values_oracle.py:
    ref_embedding_near_dup, pinned to sf0.01) — the corpus stays float,
    no per-row double-cast transform in the hot path.  Planted-pair
    recall coverage lives in tests/test_functions.py."""
    t = Tables(spark, sf_dir)
    pairs = S.embedding_near_duplicates(
        t.embeddings, threshold=0.4, max_hamming=28, band_bits=8
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.floor(F.col("cos_sim") * 1e6).cast("bigint").alias("cos_ppm"),
    ).orderBy("id_a", "id_b")


@query("ops_knn_bruteforce")
def ops_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for the first 8 vectors as queries."""
    t = Tables(spark, sf_dir)
    queries_df = t.embeddings.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = S.brute_force_topk(t.embeddings, queries_df, k=10)
    return out.select(
        "query_id", "vec_id", "rank", F.round("cos_sim", 4).cast("double").alias("cos_sim")
    )


ORACLE["ops_knn_bruteforce"] = """
    -- CAST to DOUBLE[]: DuckDB's list_cosine_similarity on FLOAT[] computes
    -- and returns float32; the engine side computes in float64
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS embedding
               FROM embeddings WHERE vec_id < 8),
         c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings)
    SELECT q.query_id, c.vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY list_cosine_similarity(c.embedding, q.embedding) DESC,
                                       c.vec_id) AS rank,
           CAST(ROUND(list_cosine_similarity(c.embedding, q.embedding), 4) AS DOUBLE) AS cos_sim
    FROM c, q
    QUALIFY rank <= 10
    ORDER BY q.query_id, rank
"""


@query("ops_knn_ivf")
def ops_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 for the first 8 vectors: kmeans++ spherical training
    with the probe width sized for THIS corpus's declared recall contract.

    The shipped embeddings are near-uniform, the documented worst case
    where recall tracks the probed fraction for any cell structure — so
    this entry probes 28/32 cells (measured recall: 0.975 at sf0.01, 1.0
    at sf0.1 vs brute force; nprobe=24 sits exactly at the 0.95 bound with
    no margin). The library default (25% of cells) meets the same ≥0.95
    bound on clustered embeddings; see SURVEY §2.D and
    tests/test_functions.py::test_ops_knn_ivf_meets_declared_recall."""
    t = Tables(spark, sf_dir)
    emb = t.embeddings
    cents = S.ivf_train(emb, 32, iters=1)
    assigned = S.ivf_assign(emb, cents)
    queries_df = emb.where(F.col("vec_id") < 8).select(F.col("vec_id").alias("query_id"), "embedding")
    # Oracle-backed since r6: cosine emitted as ×1e6 fixed point and the
    # whole train→assign→probe→scan sequence hash-compared against a
    # sequential mirror (plans/values_oracle.py:ref_knn_ivf, pinned to
    # sf0.01 — the single-batch scale where the arithmetic is exactly
    # reproducible step for step).
    out = S.ivf_topk(assigned, cents, queries_df, k=10, nprobe=28).select(
        "query_id",
        "vec_id",
        "rank",
        F.floor(F.col("cos_sim") * 1e6).cast("bigint").alias("cos_ppm"),
    )
    return out.orderBy("query_id", "rank")


@query("ops_vocab_coverage")
def ops_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-training primitive: top-200
    corpus terms with the cumulative fraction of all token occurrences they
    cover (ppm, exact integer arithmetic — no float rounding policy).

    Scale shape: term counting is the distributed explode+groupBy (corpus
    scale); the ordering window runs only over the top-200 slice (vocab
    scale), so the single-partition window is bounded by the requested k,
    never the corpus."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    counts = (
        t.documents.select(
            F.explode(F.regexp_extract_all(F.lower("text"), F.lit(X.WORD_RE), 0)).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("t"))
    top = counts.orderBy(F.desc("cnt"), "word").limit(200)
    w = W.orderBy(F.desc("cnt"), "word").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        top.withColumn("cum", F.sum("cnt").over(w))
        .join(F.broadcast(total))
        # integer DIV: both engines truncate identically on positives
        .select("word", "cnt", F.expr("CAST((cum * 1000000) DIV t AS BIGINT)").alias("cum_ppm"))
        .orderBy(F.desc("cnt"), "word")
    )


ORACLE["ops_vocab_coverage"] = """
    WITH c AS (
        SELECT word, COUNT(*) AS cnt FROM (
            SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
            FROM documents)
        GROUP BY word),
    tot AS (SELECT SUM(cnt) AS t FROM c),
    top AS (SELECT word, cnt FROM c ORDER BY cnt DESC, word LIMIT 200)
    SELECT word, cnt,
           CAST(SUM(cnt) OVER (ORDER BY cnt DESC, word ROWS UNBOUNDED PRECEDING)
                * 1000000 // t AS BIGINT) AS cum_ppm
    FROM top, tot ORDER BY cnt DESC, word
"""


@query("ops_boilerplate_spans")
def ops_boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection — the repeated-span curation primitive: a
    5-word gram occurring in ≥3 distinct documents is boilerplate; each
    doc reports its gram count and the ppm fraction of gram instances
    that are boilerplate (exact integer DIV — no float policy).

    Scale shape: gram explosion is corpus-linear (one instance per token
    position) and is scanned ONCE — instances reduce immediately to
    (gram, doc_id, n_inst) with map-side combine, doc-frequency is a
    window count over the already-reduced pairs (no second explode, no
    dfreq self-join; measured 10.7 s → 1.9 s cold at sf0.1 vs the
    explode-twice + left-join shape), and the final doc rollup shuffles
    only the distinct pairs. No window over the corpus, no cross
    product; the gram window partitions on a high-cardinality key."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    w = F.regexp_extract_all(F.lower("text"), F.lit(X.WORD_RE), 0)
    grams = (
        t.documents.select("doc_id", w.alias("w"))
        .where(F.size("w") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 4),
                    lambda i: F.concat_ws(" ", F.slice("w", i, 5)),
                )
            ).alias("gram"),
        )
    )
    inst = grams.groupBy("gram", "doc_id").agg(F.count(F.lit(1)).alias("n_inst"))
    flagged = inst.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("gram")))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.sum("n_inst").alias("n_grams"),
            F.sum(F.when(F.col("df") >= 3, F.col("n_inst")).otherwise(F.lit(0))).alias(
                "n_boiler"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            F.expr("CAST((n_boiler * 1000000) DIV n_grams AS BIGINT)").alias("boiler_ppm"),
        )
        .orderBy("doc_id")
    )


ORACLE["ops_boilerplate_spans"] = """
    WITH g AS (
        SELECT doc_id, array_to_string(w[i:i+4], ' ') AS gram
        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS i
              FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                    FROM documents)
              WHERE len(w) >= 5)),
    df AS (SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gram),
    common AS (SELECT gram FROM df WHERE df >= 3)
    SELECT g.doc_id,
           COUNT(*) AS n_grams,
           CAST(COUNT(c.gram) * 1000000 // COUNT(*) AS BIGINT) AS boiler_ppm
    FROM g LEFT JOIN common c USING (gram)
    GROUP BY g.doc_id ORDER BY g.doc_id
"""


@query("ops_mixture_weights")
def ops_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing weights — per-source repeat factor to equalize the
    token budget across sources (the training-mixture primitive): with
    target = total_tokens DIV n_sources, weight_ppm = target·1e6 DIV
    source_tokens (>1e6 ⇒ upsample, <1e6 ⇒ downsample). Exact integer
    arithmetic end-to-end. One partial-agg shuffle on source + a 1-row
    broadcast of the totals."""
    t = Tables(spark, sf_dir)
    per_src = t.documents.groupBy("source").agg(
        F.sum(X.token_count(F.col("text"))).alias("src_tokens")
    )
    totals = per_src.agg(
        F.sum("src_tokens").alias("_total"), F.count(F.lit(1)).alias("_nsrc")
    )
    return (
        per_src.join(F.broadcast(totals))
        .select(
            "source",
            "src_tokens",
            F.expr(
                "CAST(((_total DIV _nsrc) * 1000000) DIV src_tokens AS BIGINT)"
            ).alias("weight_ppm"),
        )
        .orderBy("source")
    )


ORACLE["ops_mixture_weights"] = r"""
    WITH s AS (
        -- CAST: bare SUM(BIGINT) is HUGEINT (int128) in DuckDB; the driver's
        -- value hash is type-sensitive, so output columns must be BIGINT
        SELECT source, CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS src_tokens
        FROM documents GROUP BY source),
    tot AS (SELECT SUM(src_tokens) AS total, COUNT(*) AS nsrc FROM s)
    SELECT source, src_tokens,
           CAST(((total // nsrc) * 1000000) // src_tokens AS BIGINT) AS weight_ppm
    FROM s, tot ORDER BY source
"""


@query("ops_token_rarity")
def ops_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-rarity score — mean global frequency rank of the
    doc's tokens (rank 1 = most common), in exact integer arithmetic:
    rarity = sum(rank)·1e6 DIV n_tokens. A log-free, hash-stable stand-in
    for unigram-LM scoring (ln() differs by ulps across engines; ranks
    don't).

    Scale shape: the ranking window runs over the VOCABULARY (≪ corpus),
    the per-doc mean is a hash aggregate after a vocab join that AQE
    broadcasts when the vocab is small."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    toks = t.documents.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower("text"), F.lit(X.WORD_RE), 0)).alias("word"),
    )
    vocab = toks.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = vocab.withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("cnt"), "word")).cast("bigint")
    )
    return (
        toks.join(ranked.select("word", "rank"), "word")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("rank").alias("_sr"))
        .select(
            "doc_id",
            "n_tokens",
            F.expr("CAST((_sr * 1000000) DIV n_tokens AS BIGINT)").alias("rarity_ppm"),
        )
        .orderBy("doc_id")
    )


ORACLE["ops_token_rarity"] = """
    WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
        FROM documents),
    vocab AS (SELECT word, COUNT(*) AS cnt FROM toks GROUP BY word),
    ranked AS (SELECT word, ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rank FROM vocab)
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(rank) * 1000000 // COUNT(*) AS BIGINT) AS rarity_ppm
    FROM toks JOIN ranked USING (word)
    GROUP BY doc_id ORDER BY doc_id
"""


@query("ops_dedup_accounting")
def ops_dedup_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-dedup accounting — docs, unique bodies, and the
    duplicate fraction (ppm) within each source: the visibility primitive
    a curation run reports before/after dedup. One shuffle on
    (source, md5) with map-side combine, then a per-source rollup."""
    t = Tables(spark, sf_dir)
    per_hash = t.documents.groupBy("source", F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        per_hash.groupBy("source")
        .agg(F.sum("n").alias("n_docs"), F.count(F.lit(1)).alias("n_unique"))
        .select(
            "source",
            "n_docs",
            "n_unique",
            F.expr("CAST(((n_docs - n_unique) * 1000000) DIV n_docs AS BIGINT)").alias(
                "dup_ppm"
            ),
        )
        .orderBy("source")
    )


ORACLE["ops_dedup_accounting"] = """
    WITH h AS (SELECT source, md5(text) AS h, COUNT(*) AS n
               FROM documents GROUP BY source, md5(text))
    SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs, COUNT(*) AS n_unique,
           CAST((SUM(n) - COUNT(*)) * 1000000 // SUM(n) AS BIGINT) AS dup_ppm
    FROM h GROUP BY source ORDER BY source
"""


@query("ops_hash_split")
def ops_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment — the reproducible-split
    primitive: split = md5(content)-prefix mod 100 bucketed 90/5/5, so the
    assignment is stable across engines, runs, and partitionings (content-
    keyed, not position-keyed — a re-shuffled corpus keeps its split).
    md5 is the cross-engine-stable hash (Spark xxhash64 has no DuckDB
    twin); the mod arrives via conv(hex prefix), verified bit-identical.
    One partial-agg shuffle on (source, split)."""
    t = Tables(spark, sf_dir)
    bucket = F.expr("CAST(conv(substr(md5(text), 1, 8), 16, 10) AS BIGINT) % 100")
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        t.documents.select(split.alias("split"), "source", X.token_count(F.col("text")).alias("_tok"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("_tok").alias("n_tokens"))
        .orderBy("source", "split")
    )


ORACLE["ops_hash_split"] = r"""
    WITH d AS (
        SELECT source,
               CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 AS b,
               len(regexp_extract_all(text, '\S+')) AS tok
        FROM documents)
    SELECT source,
           CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
           COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS n_tokens
    FROM d GROUP BY 1, 2 ORDER BY source, split
"""


@query("ops_ngram_novelty")
def ops_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty — the incremental-crawl curation metric: the
    ppm fraction of a doc's 5-gram instances whose gram is first seen in
    THIS doc (gram's minimum doc_id == doc_id; corpus order = doc_id
    order). A doc full of previously-seen grams scores ~0. Exact integers.

    Scale shape: gram instances are scanned ONCE and reduce immediately to
    (gram, doc_id, n_inst) with map-side combine; first-seen is a window
    min over the reduced pairs (no second explode, no join back — the same
    single-scan rewrite as ops_boilerplate_spans)."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    w = F.regexp_extract_all(F.lower("text"), F.lit(X.WORD_RE), 0)
    grams = (
        t.documents.select("doc_id", w.alias("w"))
        .where(F.size("w") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 4),
                    lambda i: F.concat_ws(" ", F.slice("w", i, 5)),
                )
            ).alias("gram"),
        )
    )
    inst = grams.groupBy("gram", "doc_id").agg(F.count(F.lit(1)).alias("n_inst"))
    flagged = inst.withColumn("first_doc", F.min("doc_id").over(W.partitionBy("gram")))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.sum("n_inst").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), F.col("n_inst")).otherwise(
                    F.lit(0)
                )
            ).alias("_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.expr("CAST((_novel * 1000000) DIV n_grams AS BIGINT)").alias("novel_ppm"),
        )
        .orderBy("doc_id")
    )


ORACLE["ops_ngram_novelty"] = """
    WITH g AS (
        SELECT doc_id, array_to_string(w[i:i+4], ' ') AS gram
        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS i
              FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                    FROM documents)
              WHERE len(w) >= 5)),
    fs AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram)
    SELECT doc_id, COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS novel_ppm
    FROM g JOIN fs USING (gram)
    GROUP BY doc_id ORDER BY doc_id
"""


@query("ops_cube_agg")
def ops_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation — the one grouping variant q13 (ROLLUP) / q14
    (GROUPING SETS) don't cover: all 2^k subtotal combinations. Money sum
    exact, emitted as DOUBLE (gate hash contract).

    r14: the sum runs in bigint-cents fixed point (the pass-1 TPC-H
    convention, plans/queries.py:_cents100/_fixed_money) — the former
    ``sum(cast(qty as decimal(18,2)))`` accumulates into decimal(28,2),
    a java.math.BigDecimal add on EVERY (row × grouping-set) replica of
    the CUBE expand; same exact rational value, long arithmetic per row.
    The scan is spread first: CUBE's 4× expand+agg is CPU-bound and ran
    on the 3 input splits (2.5 s in 3 tasks; no-op at scale)."""
    from ..functions.dedup import spread_small_scan
    from .queries import _cents100, _fixed_money

    t = Tables(spark, sf_dir)
    base = spread_small_scan(
        t.lineitem.select("l_returnflag", "l_linestatus", "l_quantity")
    )
    return (
        base.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            # exact: pure-long cents sum (quantity ≤ 1e4 cents/row keeps a
            # bigint accumulator safe past 1e14 rows/group) → one decimal
            # lift + exact /100 per GROUP → double
            _fixed_money(F.sum(_cents100("l_quantity")), 2, round2=False).alias(
                "sum_qty"
            ),
        )
        .orderBy(
            F.asc_nulls_last("l_returnflag"), F.asc_nulls_last("l_linestatus")
        )
    )


ORACLE["ops_cube_agg"] = """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
"""


@query("ops_embedding_cluster")
def ops_embedding_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed spherical k-means over the embedding corpus (the
    cluster-balanced-sampling primitive for training-data curation):
    kmeans++ sample init + map-side partial-sum Lloyd (zero corpus
    shuffle per iteration, functions/similarity.py ivf_train), then one
    assignment pass. Emits per-cluster size + cohesion — deterministic
    under the seeded init.  Oracle-backed since r6: hash-compared against
    a sequential training/assignment/aggregation mirror
    (plans/values_oracle.py:ref_embedding_cluster, pinned to sf0.01)."""
    t = Tables(spark, sf_dir)
    emb = t.embeddings
    cents = S.ivf_train(emb, 16, iters=1)
    assigned = S.ivf_assign(emb, cents)
    # cohesion: mean cosine of members to their centroid — one broadcast
    # join (centroids are tiny) + the existing single agg shuffle
    return (
        assigned.join(F.broadcast(cents), "centroid_id")
        .groupBy(F.col("centroid_id").alias("cluster_id"))
        .agg(
            F.count("*").alias("n_members"),
            F.floor(F.avg(S.cosine(F.col("embedding"), F.col("centroid"))) * 1e6)
            .cast("bigint")
            .alias("cohesion_ppm"),
        )
        .orderBy("cluster_id")
    )


@query("ops_media_features")
def ops_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction over RAW payloads — REAL math since
    r5 (functions/multimodal.py decode_raw/extract_features_raw): byte
    reinterpretation decode, exact-integer intensity mean + edge energy +
    histogram via Arrow mapInPandas. Compressed formats keep the honest
    stub (decode_stub); numpy-reference equality in tests/test_functions.py."""
    media = M.raw_media_df(spark, n=64)
    out = M.extract_features_raw(media, bins=8)
    # repartition(1)+sort, not orderBy: range-partition sampling would run
    # the Python decode stage a second time; the projected result is tiny.
    # Oracle-backed since r6: exact-integer outputs vs an independent numpy
    # reference (plans/values_oracle.py:ref_media_features) — the fixture
    # is generated in-query, so the literals hold at every sf.
    return (
        out.select(
            "media_id",
            "media_type",
            "n_values",
            "mean_milli",
            "edge_milli",
            F.element_at("hist", 1).alias("h0"),
        )
        .repartition(1)
        .sortWithinPartitions("media_id")
    )


@query("ops_media_resize")
def ops_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal image resize over RAW grayscale bitmaps — REAL bilinear
    resampling since r5 (functions/multimodal.py bilinear_resize), output
    payload is the actual resized bitmap; hand-computed-case and
    invariance tests in tests/test_functions.py."""
    media = M.raw_media_df(spark, n=64)
    out = M.resize_images_raw(media, 32, 32)
    # Oracle-backed since r6: the resized bitmap is pinned by exact-integer
    # projections a numpy reference can reproduce (byte sum + corner
    # pixels), replacing the engine-only xxhash64 fingerprint — see
    # plans/values_oracle.py:ref_media_resize (independent scalar bilinear).
    hexp = F.hex("payload")
    byte_sum = F.aggregate(
        F.expr("regexp_extract_all(hex(payload), '..', 0)"),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + F.conv(x, 16, 10).cast("bigint"),
    )
    return (
        out.select(
            "media_id",
            "width",
            "height",
            F.length("payload").cast("bigint").alias("n_bytes"),
            byte_sum.alias("byte_sum"),
            F.conv(F.substring(hexp, 1, 2), 16, 10).cast("bigint").alias("px_first"),
            F.conv(F.substring(hexp, -2, 2), 16, 10).cast("bigint").alias("px_last"),
        )
        .repartition(1)
        .sortWithinPartitions("media_id")
    )


@query("ops_media_frames")
def ops_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling over RAW video payloads — REAL frame
    slices since r5 (each output frame is the actual width*height bitmap
    at its index); fan-out stays inside mapInPandas, no shuffle."""
    media = M.raw_media_df(spark, n=64)
    out = M.sample_frames_raw(media, every_ms=500, frame_ms=500)
    # Oracle-backed since r6: frame bytes pinned by an exact-integer byte
    # sum the reference reproduces (plans/values_oracle.py:ref_media_frames).
    byte_sum = F.aggregate(
        F.expr("regexp_extract_all(hex(frame), '..', 0)"),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + F.conv(x, 16, 10).cast("bigint"),
    )
    return (
        out.select(
            "media_id",
            "frame_idx",
            "frame_ts_ms",
            F.length("frame").cast("bigint").alias("n_bytes"),
            byte_sum.alias("byte_sum"),
        )
        .repartition(1)
        .sortWithinPartitions("media_id", "frame_idx")
    )


@query("ops_image_near_dup")
def ops_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal dedup (VERDICT r5 item 7): perceptual dHash over raw
    bitmaps → banded Hamming matching — composes the r5 raw-media decode
    path (functions/multimodal.py:perceptual_hashes) with the shared
    64-bit banding machinery (similarity.band_pairs_64).  The fixture
    plants 8 pixel-perturbed image variants; every planted pair must
    surface (pigeonhole recall ≤7 bits, asserted in tests).  Oracle:
    independent sequential dHash reference as literal VALUES
    (plans/values_oracle.py:ref_image_near_dup) — the fixture is
    generated in-query, so the literals hold at every sf."""
    media = M.raw_media_with_variants(spark, n=64, n_variants=8, noise=2)
    out = M.image_near_duplicates(media, max_hamming=6)
    return out.select(
        "id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming")
    ).orderBy("id_a", "id_b")


@query("ops_audio_near_dup")
def ops_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup via energy-contour fingerprints — the dHash idea on
    the time axis (functions/multimodal.py:audio_fingerprints), matched
    through the shared 64-bit banding machinery.  The fixture plants 8
    sample-jittered PCM variants (every byte differs; the energy contour
    survives).  Oracle: independent all-integer sequential reference as
    literal VALUES (plans/values_oracle.py:ref_audio_near_dup) — the
    fixture is generated in-query, so the literals hold at every sf."""
    media = M.raw_audio_with_variants(spark, n=64, n_variants=8)
    out = M.audio_near_duplicates(media, max_hamming=6)
    return out.select(
        "id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming")
    ).orderBy("id_a", "id_b")


@query("ops_video_near_dup")
def ops_video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup via aligned per-frame dHash matching
    (functions/multimodal.py:video_near_duplicates) — completes the
    multimodal dedup family (text/image/audio/video).  The fixture
    plants 8 per-pixel-jittered video variants; every planted pair must
    survive with all frames matched.  Oracle: independent sequential
    reference as literal VALUES (plans/values_oracle.py:
    ref_video_near_dup; fixture generated in-query, holds at any sf)."""
    media = M.raw_video_with_variants(spark, n=64, n_variants=8)
    out = M.video_near_duplicates(media, max_hamming=6, min_matching_frames=2)
    return out.orderBy("id_a", "id_b")


@query("ops_approx_distinct")
def ops_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approx distinct, declared as its CONTRACT (oracle-backed
    since r7, VERDICT r6 item 2): exact counts plus a ``within_bound``
    boolean asserting both in-engine estimates sit within 5% of exact —
    hash-checkable by DuckDB (exact columns + ``TRUE``) even though the
    estimates themselves are engine-specific.

    rsd=0.02, not 0.01: HLL++ partial-buffer size is inverse-quadratic in
    rsd (0.01 → 64K registers per partition per agg), and the measured agg
    cost at sf0.1 is 0.94 s at rsd 0.01 vs 0.28 s at 0.02 for an answer
    that differs by <1% here. Sub-1% requirements belong to the mergeable
    DataSketches path (ops_hll_sketch) or exact salted counting
    (ops_salted_distinct).

    Exact and approx run as SEPARATE aggregations cross-joined at one
    row each — never in one agg: Catalyst plans mixed
    count_distinct + approx_count_distinct as Expand → HashAggregate
    keyed on (key, gid) with the partial HLL buffers attached to EVERY
    expanded group, so the shuffled state becomes |distinct keys| ×
    KB-sized HLL buffers — measured 27× for 10× data on the sf1 corpus
    (the one flag of the round-10 SCALE_OPS_D2 sweep) vs 2.7× split.
    Split, the exact side shuffles bare distinct keys and the approx
    side carries exactly two map-side-mergeable buffers total."""
    t = Tables(spark, sf_dir)
    exact = t.lineitem.agg(
        F.count_distinct(F.col("l_partkey")).cast("bigint").alias("exact_part"),
        F.count_distinct(F.col("l_suppkey")).cast("bigint").alias("exact_supp"),
    )
    apx = t.lineitem.agg(
        F.approx_count_distinct("l_partkey", 0.02).cast("bigint").alias("_ap"),
        F.approx_count_distinct("l_suppkey", 0.02).cast("bigint").alias("_as"),
    )
    return exact.crossJoin(apx).select(
        "exact_part",
        "exact_supp",
        (
            (F.abs(F.col("_ap") - F.col("exact_part")) * 1000000
             <= F.lit(50000) * F.col("exact_part"))
            & (F.abs(F.col("_as") - F.col("exact_supp")) * 1000000
               <= F.lit(50000) * F.col("exact_supp"))
        ).alias("within_bound"),
    )


ORACLE["ops_approx_distinct"] = """
    SELECT COUNT(DISTINCT l_partkey) AS exact_part,
           COUNT(DISTINCT l_suppkey) AS exact_supp,
           TRUE AS within_bound
    FROM lineitem
"""


@query("ops_percentile")
def ops_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (GK sketch), declared as its CONTRACT
    (oracle-backed since r7, VERDICT r6 item 2): the EXACT interpolated
    percentile from the distributed rank-selection operator
    (operators/quantiles.py — bit-identical to DuckDB quantile_cont)
    plus ``within_bound`` asserting the in-engine GK estimate is within
    1% relative of exact (accuracy=10000 → rank error ≤ n/10⁴, far
    inside 1% of value on this distribution — a determinism bound)."""
    from ..operators.quantiles import exact_percentiles

    t = Tables(spark, sf_dir)
    exact = exact_percentiles(
        t.lineitem, "l_extendedprice", [0.5, 0.95], interpolation="cont"
    ).select(F.round(F.col("p") * 100).cast("bigint").alias("p_pct"), "value")
    apx = t.lineitem.agg(
        F.percentile_approx(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(10000)
        ).alias("_apx")
    )
    return (
        exact.join(F.broadcast(apx))
        .select(
            "p_pct",
            "value",
            (
                F.abs(
                    F.element_at(
                        "_apx", F.when(F.col("p_pct") == 50, 1).otherwise(2)
                    )
                    - F.col("value")
                )
                <= 0.01 * F.col("value")
            ).alias("within_bound"),
        )
        .orderBy("p_pct")
    )


ORACLE["ops_percentile"] = """
    WITH e AS (
        SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS v50,
               quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) AS v95
        FROM lineitem)
    SELECT 50 AS p_pct, v50 AS value, TRUE AS within_bound FROM e
    UNION ALL
    SELECT 95, v95, TRUE FROM e
    ORDER BY p_pct
"""


@query("ops_substring_dedup")
def ops_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-substring fraction per doc via winnowing fingerprints
    (MOSS; content-anchored, so shifted copies are caught — see
    functions/dedup.py:substring_span_stats for the algorithm and plan
    shape: in-array winnowing → fingerprint agg → co-partitioned join,
    no all-pairs)."""
    t = Tables(spark, sf_dir)
    return D.substring_span_stats(t.documents, k=20, window=10).orderBy("doc_id")


ORACLE["ops_substring_dedup"] = """
    WITH hashed AS (
        SELECT doc_id,
               list_transform(generate_series(1, length(text) - 19),
                              i -> md5(substr(text, CAST(i AS INT), 20))) AS hs
        FROM documents WHERE length(text) >= 29
    ),
    fps AS (
        SELECT doc_id,
               unnest(list_distinct(
                   list_transform(generate_series(1, len(hs) - 9),
                                  i -> list_aggregate(list_slice(hs, CAST(i AS INT),
                                                                 CAST(i AS INT) + 9),
                                                      'min')))) AS fp
        FROM hashed WHERE len(hs) >= 10
    ),
    dup_kinds AS (
        SELECT fp FROM fps GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    per_doc AS (
        SELECT s.doc_id,
               COUNT(*) AS n_fps,
               SUM(CASE WHEN d.fp IS NOT NULL THEN 1 ELSE 0 END) AS n_dup_fps
        FROM fps s LEFT JOIN dup_kinds d USING (fp)
        GROUP BY s.doc_id
    )
    SELECT doc.doc_id,
           CAST(COALESCE(p.n_fps, 0) AS BIGINT) AS n_fps,
           CAST(COALESCE(p.n_dup_fps, 0) AS BIGINT) AS n_dup_fps,
           CASE WHEN COALESCE(p.n_fps, 0) = 0 THEN 0.0
                ELSE CAST(p.n_dup_fps AS DOUBLE) / CAST(p.n_fps AS DOUBLE)
           END AS dup_frac
    FROM documents doc LEFT JOIN per_doc p USING (doc_id)
    ORDER BY doc.doc_id
"""


@query("ops_embedding_outliers")
def ops_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality outlier filter: cosine of every vector to the
    corpus centroid, flagging far-from-centroid vectors — the standard
    embedding-space junk screen before clustering/semantic dedup.

    Contract-stable across engines by the q31 recipe: inputs quantized to
    exact integers (``floor(x*1e6 + 0.5)`` of the SAME double → identical
    in both engines), all sums exact integer/DECIMAL arithmetic
    (order-independent — the ``1/n`` of the centroid mean cancels out of
    the cosine, so only integer per-dim SUMS appear), then one identical
    chain of correctly-rounded double ops (cast → sqrt → mul → div) —
    bit-equal output with NO rounding policy anywhere.

    Plan shape: one posexplode scan with map-side partial aggregation for
    the 64 per-dim sums (shuffle carries dims × partitions rows), the
    tiny sum-vector broadcast back, and a single map-side projection for
    the per-vector cosine — scales to any corpus size."""
    t = Tables(spark, sf_dir)
    qx = F.transform(
        F.col("embedding"),
        lambda v: F.floor(v.cast("double") * 1000000 + F.lit(0.5)).cast("bigint"),
    )
    emb = t.embeddings.select("vec_id", qx.alias("q"))
    sums = (
        emb.select(F.posexplode("q").alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("s"))
        .agg(F.array_sort(F.collect_list(F.struct("i", "s"))).alias("ss"))
        .select(
            F.transform("ss", lambda e: e["s"]).alias("svec"),
            F.aggregate(
                F.transform(
                    "ss",
                    lambda e: (
                        e["s"].cast("decimal(19,0)") * e["s"].cast("decimal(19,0)")
                    ).cast("decimal(38,0)"),
                ),
                F.lit(0).cast("decimal(38,0)"),
                lambda acc, v: acc + v,
            ).alias("nc"),
        )
    )
    dec = lambda c: c.cast("decimal(18,0)")  # noqa: E731
    out = (
        emb.crossJoin(F.broadcast(sums))
        .select(
            "vec_id",
            F.aggregate(
                F.zip_with(
                    "q", "svec", lambda a, b: (dec(a) * b.cast("decimal(20,0)")).cast("decimal(38,0)")
                ),
                F.lit(0).cast("decimal(38,0)"),
                lambda acc, v: acc + v,
            ).alias("dot"),
            F.aggregate(
                F.transform("q", lambda a: (dec(a) * a.cast("decimal(20,0)")).cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
                lambda acc, v: acc + v,
            ).alias("nx"),
            F.col("nc"),
        )
        .select(
            "vec_id",
            (
                F.col("dot").cast("double")
                / (F.sqrt(F.col("nx").cast("double")) * F.sqrt(F.col("nc").cast("double")))
            ).alias("cos_centroid"),
        )
        .withColumn("is_outlier", F.col("cos_centroid") < F.lit(-0.15))
        .orderBy("vec_id")
    )
    return out


ORACLE["ops_embedding_outliers"] = """
    WITH xq AS (
        SELECT vec_id, CAST(i AS INT) AS i,
               CAST(FLOOR(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT) AS q
        FROM (SELECT vec_id, embedding,
                     unnest(generate_series(1, len(embedding))) AS i
              FROM embeddings)
    ),
    cent AS (SELECT i, CAST(SUM(q) AS BIGINT) AS s FROM xq GROUP BY i),
    nc AS (
        SELECT SUM(CAST(CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0))
                        AS DECIMAL(38,0))) AS n2
        FROM cent
    ),
    dots AS (
        SELECT x.vec_id,
               SUM(CAST(CAST(x.q AS DECIMAL(18,0)) * CAST(c.s AS DECIMAL(20,0))
                        AS DECIMAL(38,0))) AS dot,
               SUM(CAST(CAST(x.q AS DECIMAL(18,0)) * CAST(x.q AS DECIMAL(20,0))
                        AS DECIMAL(38,0))) AS nx
        FROM xq x JOIN cent c USING (i) GROUP BY x.vec_id
    )
    SELECT vec_id,
           CAST(dot AS DOUBLE)
             / (sqrt(CAST(nx AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) AS cos_centroid,
           (CAST(dot AS DOUBLE)
             / (sqrt(CAST(nx AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE)))) < -0.15 AS is_outlier
    FROM dots, nc ORDER BY vec_id
"""


@query("ops_length_histogram")
def ops_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-length histogram per source with cumulative share — the
    length-distribution profile behind truncation/filter threshold
    choices.  Counts are exact integers; the cumulative fraction is
    ``floor(1e6 * cum/total + 0.5)`` of integer ratios — two
    correctly-rounded double ops on identical integers, bit-equal across
    engines."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    bucket = F.floor(F.col("n_chars").cast("double") / F.lit(100.0)).cast("int")
    hist = (
        t.documents.groupBy(F.col("source"), bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )
    w = W.partitionBy("source").orderBy("bucket")
    wall = W.partitionBy("source")
    return (
        hist.withColumn(
            "cum_frac_fp",
            F.floor(
                F.lit(1000000.0)
                * (
                    F.sum("n_docs").over(w).cast("double")
                    / F.sum("n_docs").over(wall).cast("double")
                )
                + F.lit(0.5)
            ).cast("bigint"),
        )
        .orderBy("source", "bucket")
    )


ORACLE["ops_length_histogram"] = """
    WITH hist AS (
        SELECT source,
               CAST(FLOOR(CAST(n_chars AS DOUBLE) / 100.0) AS INT) AS bucket,
               COUNT(*) AS n_docs,
               MIN(n_chars) AS min_chars,
               MAX(n_chars) AS max_chars
        FROM documents GROUP BY 1, 2
    )
    SELECT source, bucket, n_docs, min_chars, max_chars,
           CAST(FLOOR(1000000.0 * (
                  CAST(SUM(n_docs) OVER (PARTITION BY source ORDER BY bucket) AS DOUBLE)
                  / CAST(SUM(n_docs) OVER (PARTITION BY source) AS DOUBLE)
                ) + 0.5) AS BIGINT) AS cum_frac_fp
    FROM hist ORDER BY source, bucket
"""


@query("ops_semantic_dedup")
def ops_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup keep/drop decisions (cluster + within-cluster cosine
    prune; functions/similarity.py:semantic_dedup).  Seeded and
    deterministic; oracle-backed since r6 — the keep/cluster decisions
    are hash-compared against a sequential clustering + id-ordered GEMM
    mirror (plans/values_oracle.py:ref_semantic_dedup, pinned to
    sf0.01); planted-duplicate recall verified in
    tests/test_functions.py."""
    t = Tables(spark, sf_dir)
    return S.semantic_dedup(t.embeddings, n_clusters=10, threshold=0.5).orderBy("vec_id")


@query("ops_weighted_sample")
def ops_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis weighted sample without replacement (k=100,
    weight = n_chars): one scan → global top-k by the seeded-md5 E-S key
    (functions/export.py:weighted_sample_topk). The emitted columns are
    exact integers; the continuous sort key stays internal (ln is ~1-ulp
    per engine — fine for ordering continuous keys, not for hashing)."""
    t = Tables(spark, sf_dir)
    from ..functions.export import weighted_sample_topk

    return (
        weighted_sample_topk(t.documents, F.col("n_chars"), k=100, seed=7)
        .select("doc_id", "w")
        .orderBy("doc_id")
    )


ORACLE["ops_weighted_sample"] = """
    SELECT doc_id, CAST(n_chars AS BIGINT) AS w
    FROM documents
    ORDER BY ln(('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT::DOUBLE
               / 1152921504606846976.0) / CAST(n_chars AS DOUBLE) DESC,
             doc_id ASC
    LIMIT 100
"""
# re-sort for the gate's hash compare (the driver sorts rows anyway, but a
# total ORDER BY doc_id keeps row order deterministic for eyeballing)
_ws_inner = ORACLE["ops_weighted_sample"]
ORACLE["ops_weighted_sample"] = f"SELECT * FROM ({_ws_inner}) ORDER BY doc_id"


@query("ops_text_normalize")
def ops_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-dedup text normalization (the step before any fingerprinting in
    a real pipeline): lowercase, strip control chars, collapse whitespace
    runs, trim — chained regexp built-ins, zero shuffle — emitted as the
    normalized md5 + length so the oracle pins the exact bytes."""
    t = Tables(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[\\x00-\\x1f]", " "),
            "\\s+",
            " ",
        )
    )
    return t.documents.select(
        "doc_id",
        F.md5(norm).alias("norm_fp"),
        F.length(norm).cast("bigint").alias("norm_len"),
    ).orderBy("doc_id")


ORACLE["ops_text_normalize"] = r"""
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[\x00-\x1f]', ' ', 'g'),
                                   '\s+', ' ', 'g'))) AS norm_fp,
           CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[\x00-\x1f]', ' ', 'g'),
                                           '\s+', ' ', 'g'))) AS BIGINT) AS norm_len
    FROM documents ORDER BY doc_id
"""


@query("ops_knn_pq")
def ops_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): seeded codebooks on a
    constant-size sample, map-side 8-byte encoding, ADC scan over codes
    with per-partition top-R, exact rerank of the candidates
    (functions/similarity.py:pq_topk). Oracle-backed since r6: the full
    train→encode→scan→rerank sequence is hash-compared against a
    sequential mirror (plans/values_oracle.py:ref_knn_pq, xxh64-ordered
    sample and all, pinned to sf0.01); recall >= 0.9 vs brute force and
    determinism asserted in tests/test_functions.py."""
    t = Tables(spark, sf_dir)
    queries_df = t.embeddings.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = S.pq_topk(
        t.embeddings, queries_df, k=10, m=8, codes=64, rerank=100, seed=11
    ).select("query_id", "vec_id", "rank")
    return out.orderBy("query_id", "rank")


@query("ops_incremental_dedup")
def ops_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-N+1 dedup: treat the second half of the documents table as a
    new batch arriving against a band index built from the first half —
    only the new batch is signed; candidates come from the stored index
    and are exact-Jaccard verified (functions/dedup.py:
    incremental_near_duplicates). Oracle-backed since r6: hash-compared
    against a sequential split/index/cap/verify mirror
    (plans/values_oracle.py:ref_incremental_dedup, pinned to sf0.01);
    planted-match recall in tests/test_functions.py.

    The corpus-half split point uses the distributed rank-selection
    operator (one bounded-memory range shuffle), not the ``percentile``
    builtin whose merge buffers every doc_id on one reducer."""
    from ..operators.quantiles import exact_percentiles

    t = Tables(spark, sf_dir)
    mid = exact_percentiles(
        t.documents.select(F.col("doc_id").cast("double").alias("doc_id")),
        "doc_id",
        [0.5],
        interpolation="cont",
    ).first()["value"]
    corpus = t.documents.where(F.col("doc_id") <= mid)
    new_batch = t.documents.where(F.col("doc_id") > mid)
    index = D.minhash_band_index(corpus)
    hits = D.incremental_near_duplicates(new_batch, index, corpus, threshold=0.5)
    return hits.select("id_a", "id_b").orderBy("id_a", "id_b")


@query("ops_winsorize")
def ops_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clipped) per-group aggregation — the robust-statistics
    step that stops a few spam documents from dominating a mixture
    weight.  Clip bounds are RANK-BASED order statistics (the value at
    row ceil(p·n) in (value, id) order), not interpolated percentiles:
    interpolation formulas differ in double shape per engine
    ((1−f)·a + f·b vs a + (b−a)·f — different roundings), while an
    actual data element at an exactly-computable rank is an integer both
    engines agree on bit-for-bit.  One window pass shares a single
    (group, value, id) sort; everything downstream is exact integer
    arithmetic."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    vq = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    w = W.partitionBy("event_type").orderBy("vq", "event_id")
    wall = W.partitionBy("event_type")
    q = t.events.select("event_type", "event_id", vq.alias("vq")).select(
        "event_type",
        "vq",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    lo_rn = F.ceil(F.lit(0.05) * F.col("n")).cast("bigint")
    hi_rn = F.ceil(F.lit(0.95) * F.col("n")).cast("bigint")
    # bounds as a second (unordered) window over the SAME partitioning —
    # one scan and one (event_type)-shuffle total; no re-scan + join back
    q2 = q.select(
        "event_type",
        "vq",
        "n",
        F.max(F.when(F.col("rn") == lo_rn, F.col("vq"))).over(wall).alias("lo"),
        F.max(F.when(F.col("rn") == hi_rn, F.col("vq"))).over(wall).alias("hi"),
    )
    return (
        q2.groupBy("event_type", "n", "lo", "hi")
        .agg(
            F.sum(
                F.least(F.greatest(F.col("vq"), F.col("lo")), F.col("hi"))
            ).alias("clipped_sum_fp")
        )
        .orderBy("event_type")
    )


ORACLE["ops_winsorize"] = """
    WITH ev AS (
        SELECT event_type, event_id,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vq
        FROM events
    ),
    q AS (
        SELECT event_type, vq,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY vq, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM ev
    ),
    b AS (
        SELECT event_type,
               MAX(CASE WHEN rn = CAST(CEIL(0.05 * n) AS BIGINT) THEN vq END) AS lo,
               MAX(CASE WHEN rn = CAST(CEIL(0.95 * n) AS BIGINT) THEN vq END) AS hi,
               MAX(n) AS n
        FROM q GROUP BY event_type
    )
    SELECT ev.event_type, b.n, b.lo, b.hi,
           CAST(SUM(LEAST(GREATEST(ev.vq, b.lo), b.hi)) AS BIGINT) AS clipped_sum_fp
    FROM ev JOIN b USING (event_type)
    GROUP BY ev.event_type, b.n, b.lo, b.hi
    ORDER BY ev.event_type
"""


@query("ops_data_quality")
def ops_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations-style data-quality audit of the orders table — the
    validation gate a pipeline runs before promoting a snapshot: per
    column, null count, distinct count, and a declared-constraint verdict
    (key uniqueness, value-domain membership, non-negativity).  One
    unpivoted single-pass aggregate (every metric is an algebraic agg
    with map-side partials); exact integers only."""
    t = Tables(spark, sf_dir)
    o = t.orders
    checks = o.agg(
        F.count(F.lit(1)).alias("row_cnt"),
        F.count_distinct("o_orderkey").alias("key_distinct"),
        F.sum(F.col("o_custkey").isNull().cast("bigint")).alias("custkey_nulls"),
        F.sum(F.col("o_totalprice").isNull().cast("bigint")).alias("price_nulls"),
        F.sum((F.col("o_totalprice") < 0).cast("bigint")).alias("price_negative"),
        F.sum(
            (~F.col("o_orderstatus").isin("O", "F", "P")).cast("bigint")
        ).alias("status_out_of_domain"),
        F.count_distinct("o_orderpriority").alias("priority_distinct"),
    )
    return checks.select(
        "row_cnt",
        "key_distinct",
        (F.col("key_distinct") == F.col("row_cnt")).alias("key_unique"),
        "custkey_nulls",
        "price_nulls",
        "price_negative",
        "status_out_of_domain",
        "priority_distinct",
    )


ORACLE["ops_data_quality"] = """
    WITH checks AS (
        SELECT COUNT(*) AS row_cnt,
               COUNT(DISTINCT o_orderkey) AS key_distinct,
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS custkey_nulls,
               CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS price_nulls,
               CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS price_negative,
               CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT)
                   AS status_out_of_domain,
               COUNT(DISTINCT o_orderpriority) AS priority_distinct
        FROM orders
    )
    SELECT row_cnt, key_distinct, key_distinct = row_cnt AS key_unique,
           custkey_nulls, price_nulls, price_negative, status_out_of_domain,
           priority_distinct
    FROM checks
"""


@query("ops_hard_negatives")
def ops_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for retrieval training: per query vector, the
    top-5 most similar corpus vectors with a DIFFERENT label (near misses
    make the best contrastive negatives).  Plan: broadcast the (small)
    query set, label filter BEFORE ranking (so negatives can't be crowded
    out), JVM zip_with/aggregate cosines, per-query ranking window with
    WindowGroupLimit map-side pruning — one corpus scan, no corpus
    shuffle beyond ≤ k·partitions candidate rows per query."""
    t = Tables(spark, sf_dir)
    from pyspark.sql import Window as W

    xd = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    q = (
        t.embeddings.where(F.col("vec_id") < 4)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("q_label"),
            xd.alias("q_vec"),
        )
    )
    c = t.embeddings.select("vec_id", "label", xd.alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("label") != F.col("q_label"))
        .select(
            "query_id",
            "vec_id",
            S.cosine(F.col("c_vec"), F.col("q_vec")).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 5)
        .select(
            "query_id",
            "vec_id",
            "rank",
            F.round("cos", 4).cast("double").alias("cos_sim"),
        )
        .orderBy("query_id", "rank")
    )


ORACLE["ops_hard_negatives"] = """
    WITH q AS (SELECT vec_id AS query_id, label AS q_label,
                      CAST(embedding AS DOUBLE[]) AS q_vec
               FROM embeddings WHERE vec_id < 4),
         c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS c_vec
               FROM embeddings)
    SELECT q.query_id, c.vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY list_cosine_similarity(c.c_vec, q.q_vec) DESC,
                                       c.vec_id) AS rank,
           CAST(ROUND(list_cosine_similarity(c.c_vec, q.q_vec), 4) AS DOUBLE) AS cos_sim
    FROM c JOIN q ON c.label <> q.q_label
    QUALIFY rank <= 5
    ORDER BY q.query_id, rank
"""


@query("ops_bpe_merge_step")
def ops_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One true BPE training iteration (Sennrich et al. 2016): count
    adjacent character-pair frequencies over the corpus vocabulary
    weighted by word frequency, and emit the top-20 merge candidates —
    the inner loop a distributed tokenizer trainer runs per merge.

    Plan shape: word-frequency aggregate FIRST (the vocab is tiny next
    to the corpus — at 100 TB this is the compression step that makes
    per-word char work O(vocab), not O(corpus)), then per-word pair
    explosion via substr positions (no split('') edge semantics), and a
    weighted pair aggregate.  Exact integers everywhere."""
    t = Tables(spark, sf_dir)
    words = (
        t.documents.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wcnt"))
        .where(F.length("w") >= 2)
    )
    pairs = words.select(
        "wcnt",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.concat(
                    F.substring(F.col("w"), i, 1),
                    F.lit(" "),
                    F.substring(F.col("w"), i + 1, 1),
                ),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wcnt").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(20)
    )


ORACLE["ops_bpe_merge_step"] = """
    WITH words AS (
        SELECT w, COUNT(*) AS wcnt
        FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
              FROM documents)
        GROUP BY w HAVING length(w) >= 2
    ),
    pairs AS (
        SELECT wcnt,
               substr(w, CAST(i AS INT), 1) || ' ' || substr(w, CAST(i AS INT) + 1, 1) AS pair
        FROM (SELECT w, wcnt, unnest(generate_series(1, length(w) - 1)) AS i FROM words)
    )
    SELECT pair, CAST(SUM(wcnt) AS BIGINT) AS pair_count
    FROM pairs GROUP BY pair
    ORDER BY pair_count DESC, pair ASC
    LIMIT 20
"""


@query("ops_corpus_card")
def ops_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus data card — the summary sheet a dataset release
    ships (docs, token/char volume, language spread, exact-duplicate
    exposure).  Exact integers only; the duplicate column comes from one
    md5-group pass joined back by hash, everything else is algebraic
    aggregation with map-side partials."""
    t = Tables(spark, sf_dir)
    # ONE text pass (r15): the duplicate-hash aggregate and the per-source
    # rollup both consume the same (source, lang, n_chars, tokens, h)
    # projection — formerly the md5 ran twice and the token split ran on
    # the second full scan.  Pinned lazily (guide §1.2).
    base = t.documents.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split(F.trim("text"), "\\s+")).alias("_toks"),
        F.md5("text").alias("h"),
    ).localCheckpoint(eager=False)
    dup_hashes = (
        base.groupBy("h")
        .agg(F.count(F.lit(1)).alias("copies"))
        .where(F.col("copies") > 1)
        .select("h")
        .withColumn("dup", F.lit(1))
    )
    docs = base.join(dup_hashes, "h", "left")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("_toks").alias("total_tokens"),
            F.count_distinct("lang").alias("n_langs"),
            F.sum(F.when(F.col("dup").isNotNull(), 1).otherwise(0)).alias(
                "n_dup_docs"
            ),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("source")
    )


ORACLE["ops_corpus_card"] = r"""
    WITH dup_hashes AS (
        SELECT md5(text) AS h FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT lang) AS n_langs,
           CAST(SUM(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents LEFT JOIN dup_hashes d ON md5(text) = d.h
    GROUP BY source ORDER BY source
"""


@query("ops_cms_heavy_hitters")
def ops_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accelerated EXACT top-25 corpus tokens: constant-size
    count-min partials (no shuffle) prune the candidate set, the exact
    aggregate runs over survivors only, and a post-hoc soundness check
    (threshold <= k-th candidate count, with CMS never underestimating)
    proves the answer is the true top-k — see
    functions/text.py:cms_heavy_hitters."""
    t = Tables(spark, sf_dir)
    return X.cms_heavy_hitters(t.documents, k=25)


ORACLE["ops_cms_heavy_hitters"] = r"""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
          FROM documents)
    GROUP BY token
    ORDER BY cnt DESC, token ASC
    LIMIT 25
"""


@query("ops_embedding_pca")
def ops_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed exact PCA (the whitening step before PQ/ANN): moment
    partials per partition (zero corpus shuffle, constant-size payload),
    driver eigendecomposition with a deterministic combine order and
    sign-fixed basis, map-side projection.  Rows-only (eigendecomposition
    has no SQL twin); numpy equivalence in tests/test_functions.py; the
    fixed-point leading coordinates are pinned by the self-check."""
    t = Tables(spark, sf_dir)
    emb = t.embeddings.select(
        "vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("embedding")
    )
    mean, comps, _ = S.pca_train(emb, n_components=4)
    proj = S.pca_project(emb, mean, comps)
    # Oracle-backed since r6: fixed-point projections hash-compared against
    # a single-node moment-form PCA reference (plans/values_oracle.py:
    # ref_embedding_pca, pinned to the gate's sf0.01 scale).
    return proj.select(
        "vec_id",
        F.floor(F.element_at("proj", 1) * 1000 + F.lit(0.5)).cast("bigint").alias("pc1_fp"),
        F.floor(F.element_at("proj", 2) * 1000 + F.lit(0.5)).cast("bigint").alias("pc2_fp"),
    ).orderBy("vec_id")


@query("ops_pmi_collocations")
def ops_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 collocations by PMI rank — the phrase-mining primitive: score
    every directional token pair within a 4-token forward window by
    c_ab DIV (c_a · c_b), which orders identically to pointwise mutual
    information (the n_tok²/n_pairs normalizer is a global constant), in
    exact integer arithmetic (×1e9 fixed point, min count 5).

    Scale shape: pair fan-out is corpus-linear (≤4 per token position,
    one JVM HOF pass — no self-join); pair counts and unigram counts are
    partial-agg shuffles; marginals attach via two joins on the word key
    (AQE broadcasts the vocab side when small); top-50 is
    TakeOrderedAndProject, never a global sort.

    r14: ONE corpus scan and ONE aggregation — the unigram counts ride
    the pair aggregation as ``(word, NULL)`` rows emitted from the same
    explode (the corpus was previously scanned and regexp-tokenized
    twice, once per branch), and both count frames are filters over the
    same lazily-checkpointed ``(w1, w2)`` aggregate.  The checkpoint is
    load-bearing: without it Catalyst pushes each branch's
    ``w2 IS [NOT] NULL`` through the aggregate (group-key predicates
    push down), the two exchange subtrees stop being identical, and the
    runtime re-scans parquet per branch — observed in the executed plan
    before the pin."""
    t = Tables(spark, sf_dir)
    w = F.regexp_extract_all(F.lower("text"), F.lit(X.WORD_RE), 0)
    pair_t = "array<struct<w1:string,w2:string>>"
    pairs_arr = F.when(
        F.size("w") >= 2,
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 1),
                lambda i: F.transform(
                    F.slice("w", i + 1, F.least(F.lit(4), F.size("w") - i)),
                    lambda nxt: F.struct(
                        F.element_at("w", i.cast("int")).alias("w1"), nxt.alias("w2")
                    ),
                ),
            )
        ),
    ).otherwise(F.array().cast(pair_t))
    uni_arr = F.transform(
        "w", lambda tok: F.struct(tok.alias("w1"), F.lit(None).cast("string").alias("w2"))
    )
    ex = (
        t.documents.select(w.alias("w"))
        .select(F.explode(F.concat(pairs_arr, uni_arr)).alias("p"))
        .select("p.w1", "p.w2")
    )
    counts = (
        ex.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .localCheckpoint(eager=False)
    )
    pair_cnt = counts.where(F.col("w2").isNotNull())
    uni = counts.where(F.col("w2").isNull()).select(
        F.col("w1").alias("word"), F.col("c_ab").alias("c")
    )
    return (
        pair_cnt.where(F.col("c_ab") >= 5)
        .join(uni.select(F.col("word").alias("w1"), F.col("c").alias("c_a")), "w1")
        .join(uni.select(F.col("word").alias("w2"), F.col("c").alias("c_b")), "w2")
        .select(
            "w1",
            "w2",
            "c_ab",
            F.expr("CAST((c_ab * 1000000000) DIV (c_a * c_b) AS BIGINT)").alias(
                "pmi_rank_ppb"
            ),
        )
        .orderBy(F.desc("pmi_rank_ppb"), "w1", "w2")
        .limit(50)
    )


ORACLE["ops_pmi_collocations"] = """
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        FROM documents),
    pairs AS (
        SELECT w[i] AS w1, w[i + j] AS w2
        FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
              FROM toks WHERE len(w) >= 2),
             (SELECT unnest(generate_series(1, 4)) AS j)
        WHERE i + j <= len(w)),
    pair_cnt AS (
        SELECT w1, w2, COUNT(*) AS c_ab FROM pairs GROUP BY w1, w2),
    uni AS (
        SELECT unnest(w) AS word FROM toks),
    uni_cnt AS (SELECT word, COUNT(*) AS c FROM uni GROUP BY word)
    SELECT w1, w2, c_ab,
           CAST(c_ab * 1000000000 // (a.c * b.c) AS BIGINT) AS pmi_rank_ppb
    FROM pair_cnt
    JOIN uni_cnt a ON w1 = a.word
    JOIN uni_cnt b ON w2 = b.word
    WHERE c_ab >= 5
    ORDER BY pmi_rank_ppb DESC, w1, w2 LIMIT 50
"""


@query("ops_embedding_quantize")
def ops_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the
    storage/serving compression step: per-vector scale = 127/max|x|,
    code_i = floor(x_i·scale + 0.5). Every step (abs-max, IEEE divide,
    multiply, floor) is correctly rounded and order-independent, so the
    codes are bit-identical across engines with no rounding policy.
    Pure map-side HOFs over one scan — zero shuffle at any corpus size.

    HOF lambdas run interpreted (no whole-stage codegen), with no
    loop-invariant hoisting: an abs-max nested inside the code transform
    re-evaluates per ELEMENT, and a multi-referenced codes expression
    re-evaluates per aggregate — so ``_mx`` and ``_codes`` are pinned as
    their own projections (multi-referenced non-cheap columns stay
    materialized through CollapseProject), and the single-split local scan
    is spread across cores (interpreted HOFs cost ~0.4 ms/row). Measured
    3.0 s → 0.8 s steady at sf0.1 on local[8] for the same arithmetic."""
    t = Tables(spark, sf_dir)
    withmax = D.spread_small_scan(t.embeddings.where(F.size("embedding") > 0)).select(
        "vec_id",
        "embedding",
        F.array_max(F.transform("embedding", lambda v: F.abs(v.cast("double")))).alias("_mx"),
    )
    # "_mx" appears TWICE here (passthrough + inside the lambda): a
    # single-referenced column would be inlined back into the lambda by
    # CollapseProject and the abs-max would re-run per element again.
    # _mx > 0 guard: an all-zero vector would give scale 127/0 = Inf and
    # NaN codes — Spark casts NaN→0 while DuckDB errors, so the degenerate
    # row is excluded identically in both engines.
    coded = withmax.where(F.col("_mx") > 0).select(
        "vec_id",
        "_mx",
        F.size("embedding").cast("bigint").alias("n_dims"),
        F.transform(
            "embedding",
            lambda v: F.floor(v.cast("double") * (F.lit(127.0) / F.col("_mx")) + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("_codes"),
    )
    return (
        coded.select(
            "vec_id",
            "n_dims",
            F.array_min("_codes").alias("code_min"),
            F.array_max("_codes").alias("code_max"),
            F.aggregate("_codes", F.lit(0).cast("long"), lambda a, v: a + v).alias("code_sum"),
            F.aggregate("_codes", F.lit(0).cast("long"), lambda a, v: a + F.abs(v)).alias(
                "code_l1"
            ),
        )
        .orderBy("vec_id")
    )


ORACLE["ops_embedding_quantize"] = """
    WITH q AS (
        SELECT vec_id,
               len(embedding) AS n_dims,
               list_transform(
                   embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE)
                        * (127.0 / list_max(list_transform(embedding, y -> ABS(CAST(y AS DOUBLE)))))
                        + 0.5) AS BIGINT)) AS codes
        FROM embeddings
        WHERE len(embedding) > 0
          AND list_max(list_transform(embedding, y -> ABS(CAST(y AS DOUBLE)))) > 0)
    SELECT vec_id,
           CAST(n_dims AS BIGINT) AS n_dims,
           list_min(codes) AS code_min,
           list_max(codes) AS code_max,
           CAST(list_sum(codes) AS BIGINT) AS code_sum,
           CAST(list_sum(list_transform(codes, c -> ABS(c))) AS BIGINT) AS code_l1
    FROM q ORDER BY vec_id
"""


@query("ops_ccnet_buckets")
def ops_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail bucketing: per-language quality
    terciles (NTILE(3) over quality desc, ties by doc_id) with per-bucket
    rollups — the curation step that routes each language's best third to
    training.

    Scale note: NTILE over a per-language partition is a per-language
    sort; at 100 TB the same routing is done by computing the two tercile
    thresholds with operators/quantiles.exact_percentiles (one range
    shuffle, bounded memory) and bucketing map-side — this declared query
    keeps the window form, the library exposes both."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    scored = t.documents.select(
        "doc_id",
        "lang",
        "n_chars",
        F.floor(X.quality_score(F.col("text")) * 1e6).cast("bigint").alias("quality_ppm"),
    )
    w = W.partitionBy("lang").orderBy(F.desc("quality_ppm"), "doc_id")
    return (
        scored.withColumn("bucket", F.ntile(3).over(w).cast("bigint"))
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("quality_ppm").alias("min_quality_ppm"),
            F.max("quality_ppm").alias("max_quality_ppm"),
        )
        .orderBy("lang", "bucket")
    )


ORACLE["ops_ccnet_buckets"] = r"""
    WITH s AS (
        SELECT doc_id, lang, n_chars,
               CAST(FLOOR((0.5 * LEAST(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) / 64.0, 1.0)
                         + 0.3 * LEAST(CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS DOUBLE)
                                       / GREATEST(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0) * 5.0, 1.0)
                         + 0.2 * (1.0 - LEAST(CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
                                              / GREATEST(CAST(length(text) AS DOUBLE), 1.0) * 10.0, 1.0))) * 1e6)
                    AS BIGINT) AS quality_ppm
        FROM documents),
    b AS (
        SELECT lang, n_chars, quality_ppm,
               NTILE(3) OVER (PARTITION BY lang ORDER BY quality_ppm DESC, doc_id) AS bucket
        FROM s)
    SELECT lang, CAST(bucket AS BIGINT) AS bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(quality_ppm) AS min_quality_ppm,
           MAX(quality_ppm) AS max_quality_ppm
    FROM b GROUP BY lang, bucket ORDER BY lang, bucket
"""


@query("ops_distribution_drift")
def ops_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor — total variation distance between the
    first and second corpus half's quality-decile distributions, per
    language (the retrain/alert primitive a production curation pipeline
    runs per crawl). TVD = ½·Σ|p_i − q_i| computed cross-multiplied in
    exact integers: Σ|o_i·N_q − q_i·N_o|·1e6 DIV (2·N_o·N_q) — no float
    division until never (log-free, unlike PSI/KL, so it hash-matches).

    Scale shape: ONE corpus scan scores quality (codegen projection) plus
    a doc_id-only pre-pass for the split point — computed by the
    distributed rank-selection operator (operators/quantiles.py: one
    balanced range shuffle, bounded memory everywhere), NOT the
    ``percentile`` builtin whose merge buffers every value on one reducer;
    deciles are exact integer buckets of the ppm score (width 1e5); counts
    are one partial-agg shuffle on (lang, half, decile); the per-language
    totals come from a window over the ≤ langs×10 reduced rows (a
    groupBy+join spelling re-derives the aggregate lineage → the optimizer
    plans a SECOND corpus scan, measured via plan_of — the window keeps
    one)."""
    from pyspark.sql import Window as W

    from ..operators.quantiles import exact_percentiles

    t = Tables(spark, sf_dir)
    mid = exact_percentiles(
        t.documents.select(F.col("doc_id").cast("double").alias("doc_id")),
        "doc_id",
        [0.5],
        interpolation="cont",
    ).first()["value"]
    scored = t.documents.select(
        "lang",
        (F.col("doc_id") > F.lit(mid)).cast("int").alias("half"),
        F.least(
            F.lit(9),
            (F.floor(X.quality_score(F.col("text")) * 1e6).cast("bigint") / F.lit(100000))
            .cast("bigint"),
        ).alias("decile"),
    )
    counts = scored.groupBy("lang", "half", "decile").agg(F.count(F.lit(1)).alias("n"))
    per_half = counts.groupBy("lang", "decile").agg(
        F.sum(F.when(F.col("half") == 0, F.col("n")).otherwise(F.lit(0))).alias("n0"),
        F.sum(F.when(F.col("half") == 1, F.col("n")).otherwise(F.lit(0))).alias("n1"),
    )
    wl = W.partitionBy("lang")
    with_tot = per_half.select(
        "lang",
        "n0",
        "n1",
        F.sum("n0").over(wl).alias("t0"),
        F.sum("n1").over(wl).alias("t1"),
    )
    return (
        with_tot.groupBy("lang")
        .agg(
            F.max("t0").alias("n_first"),
            F.max("t1").alias("n_second"),
            F.sum(F.abs(F.col("n0") * F.col("t1") - F.col("n1") * F.col("t0"))).alias("_num"),
        )
        .select(
            "lang",
            "n_first",
            "n_second",
            F.expr("CAST((_num * 1000000) DIV (2 * n_first * n_second) AS BIGINT)").alias(
                "tvd_ppm"
            ),
        )
        .orderBy("lang")
    )


ORACLE["ops_distribution_drift"] = r"""
    WITH mid AS (SELECT quantile_cont(doc_id, 0.5) AS m FROM documents),
    s AS (
        SELECT lang,
               CASE WHEN doc_id > (SELECT m FROM mid) THEN 1 ELSE 0 END AS half,
               LEAST(9, CAST(FLOOR((0.5 * LEAST(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) / 64.0, 1.0)
                         + 0.3 * LEAST(CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS DOUBLE)
                                       / GREATEST(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0) * 5.0, 1.0)
                         + 0.2 * (1.0 - LEAST(CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
                                              / GREATEST(CAST(length(text) AS DOUBLE), 1.0) * 10.0, 1.0))) * 1e6)
                    AS BIGINT) // 100000) AS decile
        FROM documents),
    c AS (SELECT lang, half, decile, COUNT(*) AS n FROM s GROUP BY lang, half, decile),
    ph AS (
        SELECT lang, decile,
               SUM(CASE WHEN half = 0 THEN n ELSE 0 END) AS n0,
               SUM(CASE WHEN half = 1 THEN n ELSE 0 END) AS n1
        FROM c GROUP BY lang, decile),
    tot AS (SELECT lang, SUM(n0) AS t0, SUM(n1) AS t1 FROM ph GROUP BY lang)
    SELECT ph.lang,
           CAST(MAX(t0) AS BIGINT) AS n_first,
           CAST(MAX(t1) AS BIGINT) AS n_second,
           CAST(SUM(ABS(n0 * t1 - n1 * t0)) * 1000000 // (2 * MAX(t0) * MAX(t1)) AS BIGINT) AS tvd_ppm
    FROM ph JOIN tot ON ph.lang = tot.lang
    GROUP BY ph.lang ORDER BY ph.lang
"""


@query("ops_span_corruption")
def ops_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption mask generation — deterministic, seeded,
    engine-portable: token position i of a doc is a mask-span START iff
    the seeded md5 of (doc_id, i) lands under a 15% threshold (md5 is
    bit-identical across engines, so the masks replay exactly in any
    engine or rerun — the property a distributed data-prep step needs;
    same uniform-from-md5 trick as functions/export.py:weighted_sample).

    One scan; positions come from a corpus-linear HOF over the token
    array; the per-doc rollup is one partial-agg shuffle on doc_id."""
    t = Tables(spark, sf_dir)
    w = F.regexp_extract_all(F.lower("text"), F.lit(X.WORD_RE), 0)
    toks = t.documents.select("doc_id", w.alias("w")).where(F.size("w") >= 1)
    pos = toks.select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_tokens"),
        F.explode(F.sequence(F.lit(1), F.size("w"))).alias("i"),
    )
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("7:"), F.col("doc_id").cast("string"), F.lit(":"), F.col("i").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    flagged = pos.select(
        "doc_id", "n_tokens", "i", (F.pmod(u, F.lit(1000)) < 150).cast("long").alias("m")
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.max("n_tokens").alias("n_tokens"),
            F.sum("m").alias("n_mask_starts"),
            F.min(F.when(F.col("m") == 1, F.col("i"))).alias("first_mask_pos"),
        )
        .orderBy("doc_id")
    )


ORACLE["ops_span_corruption"] = """
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        FROM documents),
    pos AS (
        SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
               unnest(generate_series(1, len(w))) AS i
        FROM toks WHERE len(w) >= 1),
    f AS (
        SELECT doc_id, n_tokens, i,
               CASE WHEN CAST(concat('0x', substring(md5('7:' || CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 < 150
                    THEN 1 ELSE 0 END AS m
        FROM pos)
    SELECT doc_id, MAX(n_tokens) AS n_tokens,
           CAST(SUM(m) AS BIGINT) AS n_mask_starts,
           MIN(CASE WHEN m = 1 THEN i END) AS first_mask_pos
    FROM f GROUP BY doc_id ORDER BY doc_id
"""


@query("ops_fuzzy_join")
def ops_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join — entity resolution for dirty identifiers: probe
    records carry a one-character corruption of a 12-char record code and
    must be re-linked to their base records WITHOUT a cross join.

    Blocking is the edit-distance pigeonhole (same principle as the
    SimHash bands in functions/dedup.py): a single substitution corrupts
    exactly one of the code's two 6-char halves, so every distance-1 pair
    agrees EXACTLY on the other half — candidates are the union of two
    equi-joins (on half 1, on half 2), provably complete for 1 edit.
    Levenshtein runs on candidates only.

    Scale shape: the half keys are high-entropy (md5-derived), so blocks
    are selective and the two equi-joins are plain shuffle-hash/broadcast
    joins (plan-asserted: no CartesianProduct / BroadcastNestedLoopJoin);
    candidate count ~ 2·n + half-collisions. Low-entropy keys (shared
    prefixes) would need the LSH bucket cap — the same skew story as
    minhash_near_duplicates, documented there. The corruption itself is
    seeded and engine-portable (md5 position/char), so the declared result
    is hash-exact cross-engine."""
    t = Tables(spark, sf_dir)
    base = t.customer.select(
        F.col("c_custkey").alias("base_id"),
        F.substring(
            F.md5(F.concat(F.lit("id:"), F.col("c_custkey").cast("string"))), 1, 12
        ).alias("code"),
    )
    probe = base.select(F.col("base_id").alias("probe_id"), F.col("code").alias("c0")).select(
        "probe_id",
        F.concat(
            F.expr("substr(c0, 1, CAST(probe_id % 12 AS INT))"),
            F.expr("substr('uvwxyzuvwxyz', CAST(probe_id % 12 AS INT) + 1, 1)"),
            F.expr("substr(c0, CAST(probe_id % 12 AS INT) + 2)"),
        ).alias("pcode"),
    )
    from ..operators.joins import blocked_hamming_join

    # Hamming ≡ Levenshtein here: the codes are equal-length, and lev ≤ 1
    # between equal-length strings is exactly ≤ 1 substitution — so the
    # generic operator (operators/joins.py, property-tested to k edits)
    # reproduces the oracle's levenshtein filter bit-for-bit.
    return (
        blocked_hamming_join(
            probe,
            base,
            "pcode",
            "code",
            code_len=12,
            max_mismatches=1,
            extra_left=["probe_id"],
            extra_right=["base_id"],
        )
        .select("probe_id", "base_id", "dist")
        .orderBy("probe_id", "base_id")
    )


ORACLE["ops_fuzzy_join"] = """
    WITH base AS (
        SELECT c_custkey AS base_id,
               substr(md5('id:' || CAST(c_custkey AS VARCHAR)), 1, 12) AS code
        FROM customer),
    probe AS (
        SELECT base_id AS probe_id,
               substr(code, 1, CAST(base_id % 12 AS INT))
               || substr('uvwxyzuvwxyz', CAST(base_id % 12 AS INT) + 1, 1)
               || substr(code, CAST(base_id % 12 AS INT) + 2) AS pcode
        FROM base),
    pb AS (SELECT probe_id, pcode, substr(pcode,1,6) AS h1, substr(pcode,7,6) AS h2 FROM probe),
    bb AS (SELECT base_id, code, substr(code,1,6) AS h1, substr(code,7,6) AS h2 FROM base),
    cand AS (
        SELECT DISTINCT probe_id, base_id, pcode, code FROM (
            SELECT p.probe_id, b.base_id, p.pcode, b.code FROM pb p JOIN bb b ON p.h1 = b.h1
            UNION
            SELECT p.probe_id, b.base_id, p.pcode, b.code FROM pb p JOIN bb b ON p.h2 = b.h2))
    SELECT probe_id, base_id, CAST(levenshtein(pcode, code) AS BIGINT) AS dist
    FROM cand WHERE levenshtein(pcode, code) <= 1
    ORDER BY probe_id, base_id
"""


@query("ops_fuzzy_join_indel")
def ops_fuzzy_join_indel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indel-tolerant fuzzy join — probes carry a one-character DELETION
    of the 12-char record code (so the substitution pigeonhole of
    ops_fuzzy_join cannot block them: every later position shifts).
    Candidates come from q-gram COUNT FILTERING (operators/joins.py:
    qgram_levenshtein_join — multiset q-gram intersection via a
    (gram, occurrence) equi-join, bound max(len)−q+1−k·q), then exact
    levenshtein on survivors. No cross join (plan-asserted); seeded md5
    construction keeps the result hash-exact cross-engine.

    q=4 because gram selectivity is the scale knob: hex 3-grams have only
    4096 values, so at sf0.1 (~150k gram instances) buckets average ~37
    members and the candidate join goes quadratic-per-bucket (measured
    9 s warm); 4-grams (65k values) keep buckets ~2 members at the same
    volume (measured 2.0 s warm) while the count bound stays satisfiable
    (12−4+1−4 = 5 shared grams of 8-9)."""
    from ..operators.joins import qgram_levenshtein_join

    t = Tables(spark, sf_dir)
    # spread the one-split customer scan before the md5/q-gram fan-out:
    # the gram stages are CPU-bound per row and otherwise run single-task
    # on a small local file (r14; no-op at scale — dedup.spread_small_scan)
    base = D.spread_small_scan(t.customer.select("c_custkey")).select(
        F.col("c_custkey").alias("base_id"),
        F.substring(
            F.md5(F.concat(F.lit("id:"), F.col("c_custkey").cast("string"))), 1, 12
        ).alias("code"),
    )
    probe = base.select(F.col("base_id").alias("probe_id"), F.col("code").alias("c0")).select(
        "probe_id",
        F.concat(
            F.expr("substr(c0, 1, CAST(probe_id % 12 AS INT))"),
            F.expr("substr(c0, CAST(probe_id % 12 AS INT) + 2)"),
        ).alias("pcode"),
    )
    return (
        qgram_levenshtein_join(
            probe,
            base,
            "pcode",
            "code",
            max_edits=1,
            q=4,
            extra_left=["probe_id"],
            extra_right=["base_id"],
            # codes are 11-12 chars, provably above the q·(k+1)−1 = 7
            # vacuous-bound threshold → the short×short supplement is
            # skipped and the claim enforced in-plan (assert_true)
            assume_min_len=11,
        )
        .select("probe_id", "base_id", "dist")
        .orderBy("probe_id", "base_id")
    )


ORACLE["ops_fuzzy_join_indel"] = """
    WITH base AS (
        SELECT c_custkey AS base_id,
               substr(md5('id:' || CAST(c_custkey AS VARCHAR)), 1, 12) AS code
        FROM customer),
    probe AS (
        SELECT base_id AS probe_id,
               substr(code, 1, CAST(base_id % 12 AS INT))
               || substr(code, CAST(base_id % 12 AS INT) + 2) AS pcode
        FROM base),
    pi AS (SELECT probe_id, pcode, unnest(generate_series(1, length(pcode) - 3)) AS i FROM probe),
    pg AS (SELECT probe_id, pcode, substr(pcode, CAST(i AS INT), 4) AS g,
                  ROW_NUMBER() OVER (PARTITION BY probe_id, substr(pcode, CAST(i AS INT), 4) ORDER BY i) AS occ
           FROM pi),
    bi AS (SELECT base_id, code, unnest(generate_series(1, length(code) - 3)) AS i FROM base),
    bg AS (SELECT base_id, code, substr(code, CAST(i AS INT), 4) AS g,
                  ROW_NUMBER() OVER (PARTITION BY base_id, substr(code, CAST(i AS INT), 4) ORDER BY i) AS occ
           FROM bi),
    cand AS (
        SELECT probe_id, base_id, pcode, code, COUNT(*) AS shared
        FROM pg JOIN bg USING (g, occ)
        GROUP BY probe_id, base_id, pcode, code
        HAVING COUNT(*) >= GREATEST(length(pcode), length(code)) - 3 - 4)
    SELECT probe_id, base_id, CAST(levenshtein(pcode, code) AS BIGINT) AS dist
    FROM cand WHERE levenshtein(pcode, code) <= 1
    ORDER BY probe_id, base_id
"""


@query("ops_bigram_lm")
def ops_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM fluency score — the perplexity-filter stand-in (CCNet /
    Gopher quality gate) in exact integer arithmetic: the corpus itself is
    the LM, each bigram scores its transition probability in ppm
    ``c(w1,w2)·1e6 DIV c(w1,·)``, and a document's score is the integer
    mean over its bigrams.  Log-free (ln differs by ulps across engines;
    the mean transition probability ranks documents the same way for a
    filter threshold).

    Plan shape: exactly TWO corpus passes — one builds the model (bigram
    counts), one scores by re-joining the corpus bigrams to it — which is
    the floor for train-then-score without caching the corpus.  The
    prefix totals c(w1,·) come from a window over the MODEL (vocab²-sized,
    tiny next to the corpus), not a third corpus aggregation.  Count
    shuffles are bounded by map-side combine under Zipf skew; the scoring
    join's hot keys are exactly the frequent bigrams, which AQE skew-join
    splits at scale.  (In a resident pipeline, persist the model table and
    scoring becomes a single pass.)"""
    t = Tables(spark, sf_dir)
    bg = (
        t.documents.select(
            "doc_id",
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("ws"),
        )
        .where(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> struct(element_at(ws, i) AS w1,"
                    "             element_at(ws, CAST(i + 1 AS INT)) AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    from pyspark.sql import Window as W

    model = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .withColumn("c1", F.sum("c2").over(W.partitionBy("w1")))
    )
    scored = bg.join(model, ["w1", "w2"]).withColumn(
        "p_ppm", F.expr("CAST((c2 * 1000000) DIV c1 AS BIGINT)")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.expr("CAST(SUM(p_ppm) DIV COUNT(*) AS BIGINT)").alias("mean_p_ppm"),
        )
        .orderBy("doc_id")
    )


ORACLE["ops_bigram_lm"] = """
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        FROM documents),
    flat AS (
        SELECT doc_id, ws[CAST(i AS INT)] AS w1, ws[CAST(i + 1 AS INT)] AS w2
        FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
              FROM toks WHERE len(ws) >= 2)),
    bgc AS (SELECT w1, w2, COUNT(*) AS c2 FROM flat GROUP BY w1, w2),
    ugc AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM bgc GROUP BY w1),
    scored AS (
        SELECT f.doc_id, (c2 * 1000000) // c1 AS p_ppm
        FROM flat f JOIN bgc USING (w1, w2) JOIN ugc USING (w1))
    SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST(SUM(p_ppm) // COUNT(*) AS BIGINT) AS mean_p_ppm
    FROM scored GROUP BY doc_id ORDER BY doc_id
"""


@query("ops_charset_gini")
def ops_charset_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution concentration — the gibberish / encoding-
    junk detector: per-document Gini impurity of the character histogram,
    exact-integer ppm ``(n² − Σc²)·1e6 DIV n²``.  Near-zero impurity =
    one repeated character (padding junk); natural text sits in a stable
    band.  Log-free alternative to character entropy (same ordering for
    a filter threshold, no float divergence).

    Plan shape: char explode → (doc, char) count → per-doc moment agg.
    The explode is corpus-linear in CHARACTERS, the heaviest stage in
    this file — but map-side combine on (doc_id, char) collapses it to
    ≤ |alphabet| rows per doc per partition before the shuffle, so
    shuffle volume is docs·alphabet, not corpus chars."""
    t = Tables(spark, sf_dir)
    cc = (
        t.documents.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
        .where(F.length("ch") > 0)
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        cc.groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_chars"),
            F.count(F.lit(1)).cast("bigint").alias("n_charset"),
            F.expr(
                "CAST(((SUM(c) * SUM(c) - SUM(c * c)) * 1000000)"
                " DIV (SUM(c) * SUM(c)) AS BIGINT)"
            ).alias("gini_ppm"),
        )
        .orderBy("doc_id")
    )


ORACLE["ops_charset_gini"] = """
    WITH ch AS (
        SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
    cc AS (SELECT doc_id, ch, COUNT(*) AS c
           FROM ch WHERE ch <> '' GROUP BY doc_id, ch)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_chars,
           COUNT(*) AS n_charset,
           CAST(((SUM(c) * SUM(c) - SUM(c * c)) * 1000000)
                // (SUM(c) * SUM(c)) AS BIGINT) AS gini_ppm
    FROM cc GROUP BY doc_id ORDER BY doc_id
"""


@query("ops_mixture_temperature")
def ops_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened sampling weights (τ = 0.5, the multilingual /
    multi-source rebalancing rule: w_i ∝ p_i^τ) next to the proportional
    weights — deterministic because the flattening uses the INTEGER floor
    square root: IEEE sqrt is correctly rounded and src_tokens < 2^53, so
    ``FLOOR(SQRT(x))`` is the same integer on every engine, and all
    downstream arithmetic is integer DIV.

    Plan shape: per-source agg (tiny), broadcast total — identical to
    ops_mixture_weights with the isqrt column added."""
    t = Tables(spark, sf_dir)
    per_src = t.documents.groupBy("source").agg(
        F.sum(X.token_count(F.col("text"))).alias("src_tokens")
    )
    with_s = per_src.withColumn(
        "_s", F.expr("CAST(FLOOR(SQRT(CAST(src_tokens AS DOUBLE))) AS BIGINT)")
    )
    totals = with_s.agg(
        F.sum("src_tokens").alias("_tot"), F.sum("_s").alias("_stot")
    )
    return (
        with_s.join(F.broadcast(totals))
        .select(
            "source",
            F.col("src_tokens").cast("bigint").alias("src_tokens"),
            F.expr("CAST((src_tokens * 1000000) DIV _tot AS BIGINT)").alias(
                "prop_ppm"
            ),
            F.expr("CAST((_s * 1000000) DIV _stot AS BIGINT)").alias("temp_ppm"),
        )
        .orderBy("source")
    )


ORACLE["ops_mixture_temperature"] = r"""
    WITH s AS (
        SELECT source,
               CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS src_tokens
        FROM documents GROUP BY source),
    w AS (SELECT source, src_tokens,
                 CAST(FLOOR(SQRT(CAST(src_tokens AS DOUBLE))) AS BIGINT) AS s_
          FROM s),
    tot AS (SELECT CAST(SUM(src_tokens) AS BIGINT) AS t,
                   CAST(SUM(s_) AS BIGINT) AS st FROM w)
    SELECT source, src_tokens,
           CAST((src_tokens * 1000000) // t AS BIGINT) AS prop_ppm,
           CAST((s_ * 1000000) // st AS BIGINT) AS temp_ppm
    FROM w, tot ORDER BY source
"""


# ---------------------------------------------------------------------------
# iterative (rows-only + self-hash; Python-reference equality in pytest)
# ---------------------------------------------------------------------------


@query("ops_bpe_train")
def ops_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full iterative BPE tokenizer training — 10 sequential merges, each
    one distributed pair-count over the frequency-compressed vocabulary
    (functions/text.py:bpe_train).  No direct SQL twin exists (every
    merge depends on the argmax of the previous round, and the merge rule
    needs lookahead regex DuckDB's RE2 lacks) — but the OUTPUT is a pure
    function of the corpus, so since r6 the driver hash-verifies it
    against the sequential reference rendered as literal VALUES."""
    t = Tables(spark, sf_dir)
    merges, vocab = X.bpe_train(t.documents, n_merges=10)
    vocab.unpersist()
    # Oracle-backed since r6: the merge table is hash-compared against the
    # sequential reference BPE (plans/values_oracle.py:ref_bpe_train,
    # pinned to sf0.01 — the same reference tests/test_functions.py
    # asserts exact equality with at the sweep scales).
    df = local_df(
        spark,
        [(r, l, rt, l + rt, c) for (r, l, rt, c) in merges],
        "merge_rank long, left_sym string, right_sym string, merged string, pair_count long",
    )
    return df.orderBy("merge_rank")


@query("ops_bpe_encode")
def ops_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train → ENCODE: apply the trained merge table to the corpus — the
    middle step the tokenizer loop existed for (VERDICT r5 item 5).
    Distinct words are segmented once (vocab compression, functions/
    text.py:bpe_encode) with best-pair-first merging; per-doc totals come
    from one word-key join + agg.  Oracle: independent sequential
    train+encode reference (plans/values_oracle.py:ref_bpe_encode,
    pinned to the gate's sf0.01 scale)."""
    t = Tables(spark, sf_dir)
    merges, vocab = X.bpe_train(t.documents, n_merges=10)
    vocab.unpersist()
    return X.bpe_encode(t.documents, merges).orderBy("doc_id")


@query("ops_bpe_pack")
def ops_bpe_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train → encode → PACK: sequence packing over REAL tokenizer
    counts, closing the full BPE chain — the concat-and-chop rule of
    ``ops_token_packing`` driven by ``bpe_encode`` totals instead of
    whitespace counts.  One window sort per lang stratum over the
    doc-level totals (the corpus never re-shuffles); at 100 TB sub-shard
    the stratum key exactly as ops_token_packing documents.  Oracle:
    independent sequential train+encode+pack reference
    (plans/values_oracle.py:ref_bpe_pack, pinned to sf0.01)."""
    from pyspark.sql import Window as W

    budget = 4096
    t = Tables(spark, sf_dir)
    merges, vocab = X.bpe_train(t.documents, n_merges=10)
    vocab.unpersist()
    toks = X.bpe_encode(t.documents, merges).join(
        t.documents.select("doc_id", "lang"), "doc_id"
    )
    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    packed = toks.withColumn(
        "seq_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / budget).cast("bigint"),
    )
    return (
        packed.groupBy("lang", "seq_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("seq_tokens"),
        )
        .orderBy("lang", "seq_id")
    )


@query("ops_knn_ivfpq")
def ops_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite ANN (functions/similarity.py:ivfpq_topk) — the
    production 100 TB index shape: coarse-quantizer cell pruning decides
    WHICH rows are read, residual PQ codes shrink WHAT is read to m
    bytes/row (ADC scan over codes), exact rerank restores recall.
    Oracle-backed since r6 (plans/values_oracle.py:ref_knn_ivfpq — a
    sequential mirror of the full train→assign→encode→probe→rerank
    sequence, pinned to sf0.01); recall ≥ 0.9 vs brute force,
    determinism, and the residual-beats-flat-PQ property are asserted in
    tests/test_functions.py."""
    t = Tables(spark, sf_dir)
    queries_df = t.embeddings.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # near-uniform fixture corpus → probe widely (same honesty note as
    # ops_knn_ivf) and rerank deep enough to cover the quantization loss:
    # measured 0.988 recall vs brute force at sf0.01 (declared bound 0.95,
    # pinned by tests/test_functions.py::test_ops_knn_ivfpq_meets_declared_recall)
    out = S.ivfpq_topk(
        t.embeddings,
        queries_df,
        k=10,
        n_centroids=16,
        nprobe=14,
        m=8,
        codes=64,
        rerank=200,
        seed=11,
    ).select("query_id", "vec_id", "rank")
    return out.orderBy("query_id", "rank")


@query("ops_knn_index_probe")
def ops_knn_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-index ANN lifecycle (VERDICT r5 item 6): build an IVF-PQ
    index on crawl N (80% of the corpus), fold crawl N+1 in by encoding
    ONLY the new 20% against the frozen centroids/codebooks, then serve
    queries from the composed codes with exact rerank — the historical
    corpus is never re-encoded (functions/similarity.py:ivfpq_build/
    fold_in/probe; save/load round-trip + planted-duplicate recall in
    tests/test_functions.py).  Oracle-backed since r6: hash-compared
    against a sequential mirror of the whole lifecycle
    (plans/values_oracle.py:ref_knn_index_probe, pinned to sf0.01)."""
    t = Tables(spark, sf_dir)
    old = t.embeddings.where(F.col("vec_id") % 5 != 0)
    new = t.embeddings.where(F.col("vec_id") % 5 == 0)
    queries_df = t.embeddings.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = S.ivfpq_build(old, n_centroids=16, m=8, codes=64, seed=11)
    folded = S.ivfpq_fold_in(idx, new)
    # (measured: localCheckpointing the composed codes here does NOT help —
    # the serve plan consumes the codes exactly once, so the eager
    # materialization job is pure overhead)
    out = S.ivfpq_probe(
        folded, queries_df, k=10, nprobe=14, rerank=200, corpus=t.embeddings
    ).select("query_id", "vec_id", "rank")
    return out.orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# round 6: curation selection + hybrid retrieval
# ---------------------------------------------------------------------------


@query("ops_token_budget_select")
def ops_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget corpus selection: best-quality documents first
    until 20% of the corpus token count is spent — the data-mix knapsack
    every pretraining spec runs.  The plan is the NO-GLOBAL-SORT shape
    (functions/curation.py:token_budget_select): a bounded quality-bucket
    aggregate + driver prefix-sum locates the boundary bucket; only that
    bucket (~corpus/1000) is ordered exactly.  Bit-equal to the oracle's
    global window cumsum."""
    from ..functions.curation import token_budget_select

    t = Tables(spark, sf_dir)
    # pinned (r15): this 3-narrow-column frame is consumed FOUR times —
    # the budget total below plus the operator's bucket aggregate and two
    # boundary filters — and every consumer otherwise re-runs the
    # quality_score/token_count regexes over the full text (4 corpus
    # scans -> 1; guide §1.2).  Lazy: the total agg materializes it.
    scored = t.documents.select(
        "doc_id",
        F.floor(X.quality_score(F.col("text")) * 1e6).cast("bigint").alias("quality_ppm"),
        X.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
    ).localCheckpoint(eager=False)
    total = scored.agg(F.sum("n_tokens")).collect()[0][0]
    return token_budget_select(scored, int(total) // 5).orderBy(
        F.desc("quality_ppm"), F.asc("doc_id")
    )


ORACLE["ops_token_budget_select"] = r"""
    WITH s0 AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS toks,
               CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS DOUBLE) AS stops,
               CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) AS punct,
               CAST(length(text) AS DOUBLE) AS chars
        FROM documents),
    s AS (
        SELECT doc_id,
               CAST(FLOOR((0.5 * LEAST(toks / 64.0, 1.0)
                         + 0.3 * LEAST(stops / GREATEST(toks, 1.0) * 5.0, 1.0)
                         + 0.2 * (1.0 - LEAST(punct / GREATEST(chars, 1.0) * 10.0, 1.0))) * 1e6)
                    AS BIGINT) AS quality_ppm,
               CAST(toks AS BIGINT) AS n_tokens
        FROM s0),
    b AS (SELECT CAST(SUM(n_tokens) AS BIGINT) // 5 AS budget FROM s),
    sel AS (
        SELECT *, SUM(n_tokens) OVER (ORDER BY quality_ppm DESC, doc_id
                                      ROWS UNBOUNDED PRECEDING) AS cum
        FROM s)
    SELECT doc_id, quality_ppm, n_tokens FROM sel, b WHERE cum <= budget
    ORDER BY quality_ppm DESC, doc_id
"""


@query("ops_importance_weights")
def ops_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance log-ratios (Xie et al. 2023): score every
    document by how much its bigram distribution resembles the English
    target slice vs the raw corpus, over a learned top-512 bigram
    vocabulary — exact-integer ppm output, one bigram aggregate + one
    broadcast-joined fold (functions/curation.py:importance_weights)."""
    from ..functions.curation import importance_weights

    t = Tables(spark, sf_dir)
    return importance_weights(t.documents, F.col("lang") == "en").orderBy("doc_id")


ORACLE["ops_importance_weights"] = r"""
    WITH w AS (
        SELECT doc_id, lang = 'en' AS tgt,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        FROM documents),
    g AS (
        SELECT doc_id, tgt, ws[i] || ' ' || ws[i+1] AS bigram
        FROM w, unnest(range(1, len(ws))) AS r(i)),
    counts AS (
        SELECT bigram, COUNT(*) AS raw_cnt,
               SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS tgt_cnt
        FROM g GROUP BY bigram),
    vocab AS (SELECT * FROM counts ORDER BY raw_cnt DESC, bigram LIMIT 512),
    tots AS (SELECT SUM(raw_cnt) AS raw_tot, SUM(tgt_cnt) AS tgt_tot,
                    COUNT(*) AS v FROM vocab),
    lam AS (
        SELECT bigram,
               CAST(FLOOR(1e6 * (
                 LN((tgt_cnt + 0.5) / (tgt_tot + 0.5 * v))
                 - LN((raw_cnt + 0.5) / (raw_tot + 0.5 * v)))) AS BIGINT) AS lam_ppm
        FROM vocab CROSS JOIN tots),
    per_doc AS (
        SELECT g.doc_id, COUNT(*) AS n_feat, CAST(SUM(lam_ppm) AS BIGINT) AS dsir_ppm
        FROM g JOIN lam USING (bigram) GROUP BY g.doc_id)
    SELECT d.doc_id, CAST(COALESCE(n_feat, 0) AS BIGINT) AS n_feat,
           CAST(COALESCE(dsir_ppm, 0) AS BIGINT) AS dsir_ppm
    FROM (SELECT doc_id FROM documents) d LEFT JOIN per_doc USING (doc_id)
    ORDER BY d.doc_id
"""


@query("ops_hybrid_retrieval")
def ops_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+dense retrieval with reciprocal-rank fusion: for 4
    query-by-example seeds, a BM25 ranking from the seed's top-8 terms
    (functions/text.py:bm25_multi — ONE corpus pass for all queries) and
    a cosine ranking from the seed's embedding are fused with integer RRF
    (functions/curation.py:rrf_fuse, k=60) — the production RAG serving
    recipe.  Shared id space: documents.doc_id ≡ embeddings.vec_id.
    Everything is declarative; the only non-scan joins are candidate-list
    sized (top-20 per system per query)."""
    from pyspark.sql import Window as W

    from ..functions.curation import rrf_fuse

    t = Tables(spark, sf_dir)
    seed_toks = (
        t.documents.where(F.col("doc_id") < 4)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(X.WORD_RE), F.lit(0))
            ).alias("term"),
        )
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("cnt"), F.asc("term"))
    qterms = (
        seed_toks.groupBy("query_id", "term")
        .agg(F.count("*").alias("cnt"))
        .withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") <= 8)
        .select("query_id", "term")
        # consumed twice inside bm25_multi (vocab + per-query fanout):
        # materialize the 32-row frame instead of re-running the seed
        # explode per consumer (eager=False r15: the first consuming job
        # materializes it — no dedicated driver action)
        .localCheckpoint(eager=False)
    )
    lex = X.bm25_multi(t.documents, qterms)
    wl = W.partitionBy("query_id").orderBy(F.desc("bm25_ppm"), F.asc("doc_id"))
    lexr = (
        lex.withColumn("rank", F.row_number().over(wl))
        .where(F.col("rank") <= 20)
        .select("query_id", "doc_id", "rank")
    )
    xd = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    qv = t.embeddings.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), xd.alias("q_vec")
    )
    c = t.embeddings.select(F.col("vec_id").alias("doc_id"), xd.alias("c_vec"))
    wd = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("doc_id"))
    denr = (
        c.join(F.broadcast(qv))
        .select("query_id", "doc_id", S.cosine(F.col("c_vec"), F.col("q_vec")).alias("cos"))
        .withColumn("rank", F.row_number().over(wd))
        .where(F.col("rank") <= 20)
        .select("query_id", "doc_id", "rank")
    )
    fused = rrf_fuse({"lex": lexr, "dense": denr}, k=60)
    wf = W.partitionBy("query_id").orderBy(F.desc("rrf_ppm"), F.asc("doc_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf).cast("bigint"))
        .where(F.col("fused_rank") <= 10)
        .select(
            "query_id",
            "doc_id",
            F.col("lex_rank").cast("bigint").alias("lex_rank"),
            F.col("dense_rank").cast("bigint").alias("dense_rank"),
            "rrf_ppm",
            "fused_rank",
        )
        .orderBy("query_id", "fused_rank")
    )


ORACLE["ops_hybrid_retrieval"] = r"""
    WITH seed_tc AS (
        SELECT doc_id AS query_id, term, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
              FROM documents WHERE doc_id < 4)
        GROUP BY query_id, term),
    qterms AS (
        SELECT query_id, term FROM (
            SELECT query_id, term,
                   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cnt DESC, term) AS rn
            FROM seed_tc) WHERE rn <= 8),
    d AS (SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS dl
          FROM documents),
    toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
             FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
           WHERE term IN (SELECT DISTINCT term FROM qterms) GROUP BY doc_id, term),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM d),
    scored AS (
        SELECT tf.doc_id, tf.term,
               FLOOR(LN((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                 * (tf * 2.2)
                 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / (CAST(sum_dl AS DOUBLE) / n_docs))))
                 * 1e6) AS score_ppm
        FROM tf JOIN dfreq USING (term) JOIN d USING (doc_id) CROSS JOIN stats),
    lex AS (
        SELECT q.query_id, s.doc_id, CAST(SUM(s.score_ppm) AS BIGINT) AS bm25_ppm
        FROM scored s JOIN qterms q USING (term)
        GROUP BY q.query_id, s.doc_id),
    lexr AS (
        SELECT query_id, doc_id, rank FROM (
            SELECT query_id, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY bm25_ppm DESC, doc_id) AS rank
            FROM lex) WHERE rank <= 20),
    qv AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_vec
           FROM embeddings WHERE vec_id < 4),
    c AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS c_vec FROM embeddings),
    denr AS (
        SELECT query_id, doc_id, rank FROM (
            SELECT q.query_id, c.doc_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                                      ORDER BY list_cosine_similarity(c.c_vec, q.q_vec) DESC,
                                               c.doc_id) AS rank
            FROM c CROSS JOIN qv q) WHERE rank <= 20),
    fused AS (
        SELECT COALESCE(l.query_id, de.query_id) AS query_id,
               COALESCE(l.doc_id, de.doc_id) AS doc_id,
               l.rank AS lex_rank, de.rank AS dense_rank,
               COALESCE(1000000 // (60 + l.rank), 0)
                 + COALESCE(1000000 // (60 + de.rank), 0) AS rrf_ppm
        FROM lexr l FULL OUTER JOIN denr de
          ON l.query_id = de.query_id AND l.doc_id = de.doc_id)
    SELECT query_id, doc_id, CAST(lex_rank AS BIGINT) AS lex_rank,
           CAST(dense_rank AS BIGINT) AS dense_rank,
           CAST(rrf_ppm AS BIGINT) AS rrf_ppm, fused_rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY rrf_ppm DESC, doc_id) AS fused_rank
        FROM fused) WHERE fused_rank <= 10
    ORDER BY query_id, fused_rank
"""


@query("ops_mmr_select")
def ops_mmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diverse top-k via Maximal Marginal Relevance (λ=0.7): retrieve a
    50-candidate cosine pool for the seed query (vec_id 0), then greedily
    select 10 balancing relevance vs redundancy — the diversity re-rank
    between retrieval and a RAG context (functions/similarity.py:
    mmr_select; corpus work distributed + TakeOrdered, greedy loop over
    the bounded pool).  Oracle-backed: hash-compared against the
    sequential mirror plans/values_oracle.py:ref_mmr_select (sf0.01)."""
    t = Tables(spark, sf_dir)
    qv = [
        float(v)
        for v in t.embeddings.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    return S.mmr_select(t.embeddings, qv, k=10, pool=50).orderBy("sel_rank")


@query("ops_quality_classifier")
def ops_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality/domain filter (the GPT-3/CCNet classifier setup):
    distributed IRLS logistic regression separating a seed domain (the
    English slice) from the rest on engineered text ratios, then a pure
    JVM scoring sweep — floor-ppm sigmoid scores
    (functions/classifier.py; per Newton iteration ONE corpus scan
    emitting d²+d partial sums, d×d solve on the driver).  On this
    synthetic corpus the classes are barely separable (train accuracy ≈
    0.58 vs 0.56 base rate) — the declared result verifies the TRAINING
    MACHINERY bit-for-bit, not a pretrained model's skill.  Oracle:
    sequential numpy mirror (plans/values_oracle.py:
    ref_quality_classifier, pinned sf0.01 — single Arrow batch, so every
    GEMM reproduces exactly)."""
    from ..functions.classifier import (
        classifier_scores,
        irls_train,
        text_feature_frame,
    )

    t = Tables(spark, sf_dir)
    feat = text_feature_frame(
        t.documents, keep=((F.col("lang") == "en").cast("int").alias("label"),)
    )
    beta = irls_train(feat)
    # label rides the scoring projection (keep=) — a join-back would
    # re-run the feature regexes for the second feat reference
    return (
        classifier_scores(feat, beta, keep=(F.col("label").cast("bigint").alias("label"),))
        .select("doc_id", "label", "score_ppm")
        .orderBy("doc_id")
    )


@query("ops_leakage_safe_split")
def ops_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicate clusters (LSH +
    exact-Jaccard verified at 1/2, resolved to connected components) move
    as a UNIT into one split, keyed by the representative's content md5 —
    a paraphrase can never sit in test while its twin trains
    (functions/curation.py:leakage_safe_split).  Oracle-backed:
    sequential MinHash + union-find + md5-bucket mirror
    (plans/values_oracle.py:ref_leakage_safe_split, pinned sf0.01)."""
    from ..functions.curation import leakage_safe_split

    t = Tables(spark, sf_dir)
    pairs = D.minhash_near_duplicates(t.documents, threshold=0.5)
    return leakage_safe_split(t.documents, pairs).orderBy("doc_id")


@query("ops_paragraph_dedup")
def ops_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style paragraph-level dedup, the removal step after
    boilerplate DETECTION (ops_boilerplate_spans): segment every document
    into non-overlapping 16-word paragraphs (the corpus has no newline
    structure, so fixed word windows are the paragraph boundary — the
    algorithm is delimiter-agnostic), drop every segment whose content
    hash appears in ≥2 distinct documents, and reassemble the surviving
    text in order.  Output stays compact: per-doc kept/dropped counts +
    the md5 of the cleaned text (value-hash-verifiable without shipping
    the full strings).

    Plan: one chunk explode → (hash → distinct-doc count) aggregate →
    broadcast-scale join back on the duplicated hashes only → ordered
    re-aggregation via sort_array(collect_list(struct)) — order restored
    without a window sort."""
    t = Tables(spark, sf_dir)
    n = 16
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit(X.WORD_RE), F.lit(0))
    w = t.documents.select("doc_id", words.alias("_ws"))
    nchunks = F.greatest(F.ceil(F.size("_ws") / F.lit(n)).cast("int"), F.lit(1))
    chunks = w.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), nchunks),
                lambda i: F.array_join(F.slice(F.col("_ws"), (i - 1) * n + 1, n), " "),
            )
        ).alias("chunk_id", "chunk"),
    )
    dup = (
        chunks.groupBy(F.md5("chunk").alias("h"))
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    # no broadcast hint: the duplicated-hash table is corpus-dependent
    # (CCNet-scale it can be billions of rows) — Catalyst/AQE broadcasts
    # it when it fits and falls back to a shuffled hash join when not,
    # which is the correct plan at every scale
    marked = chunks.join(dup, F.md5(F.col("chunk")) == F.col("h"), "left")
    rebuilt = (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count("h").alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                F.col("h").isNull(),
                                F.struct(F.col("chunk_id"), F.col("chunk")),
                            )
                        )
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("cleaned"),
        )
    )
    return rebuilt.select(
        "doc_id",
        (F.col("n_total") - F.col("n_dropped")).cast("bigint").alias("n_kept"),
        F.col("n_dropped").cast("bigint").alias("n_dropped"),
        F.md5("cleaned").alias("cleaned_md5"),
    ).orderBy("doc_id")


ORACLE["ops_paragraph_dedup"] = r"""
    WITH w AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        FROM documents),
    c AS (
        SELECT doc_id, i AS chunk_id,
               array_to_string(ws[(i-1)*16+1 : (i-1)*16+16], ' ') AS chunk
        FROM w, unnest(range(1, GREATEST(CAST(CEIL(len(ws) / 16.0) AS BIGINT), 1) + 1)) AS r(i)),
    dup AS (
        SELECT md5(chunk) AS h FROM c GROUP BY md5(chunk)
        HAVING COUNT(DISTINCT doc_id) >= 2),
    m AS (
        SELECT c.doc_id, c.chunk_id, c.chunk, dup.h
        FROM c LEFT JOIN dup ON md5(c.chunk) = dup.h),
    r AS (
        SELECT doc_id, COUNT(*) AS n_total, COUNT(h) AS n_dropped,
               array_to_string(
                   list_transform(
                       list_sort(list(CASE WHEN h IS NULL
                                      THEN {'chunk_id': chunk_id, 'chunk': chunk} END)),
                       s -> s.chunk),
                   ' ') AS cleaned
        FROM m GROUP BY doc_id)
    SELECT doc_id, CAST(n_total - n_dropped AS BIGINT) AS n_kept,
           CAST(n_dropped AS BIGINT) AS n_dropped,
           md5(COALESCE(cleaned, '')) AS cleaned_md5
    FROM r ORDER BY doc_id
"""


@query("ops_importance_weights_hashed")
def ops_importance_weights_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR over HASHED bigram features (the published Xie et al. 2023
    form): pmod(xxhash64, 1024) bucket space — no vocabulary to learn or
    ship, unbounded streams score against the same features forever
    (functions/curation.py:importance_weights_hashed; λ computed
    driver-side over exact integer counts).  Oracle-backed: sequential
    mirror sharing the validated pure-Python XXH64 and the same
    math.log calls (plans/values_oracle.py:ref_importance_weights_hashed,
    pinned sf0.01)."""
    from ..functions.curation import importance_weights_hashed

    t = Tables(spark, sf_dir)
    return importance_weights_hashed(t.documents, F.col("lang") == "en").orderBy(
        "doc_id"
    )


@query("ops_contrastive_pairs")
def ops_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPR-style contrastive training-pair mining: per seed query, the
    POSITIVE is the nearest corpus vector by cosine (excluding the seed)
    and the hard NEGATIVES are the top-3 lexically similar documents
    (BM25 on the seed's top-8 terms) that are NOT in the dense top-10 —
    high lexical overlap with low semantic similarity is the classic
    contrastive negative (Karpukhin et al. 2020).  One BM25 corpus pass
    for all queries (bm25_multi), one dense pass; all other joins are
    candidate-list-sized."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    seed_toks = (
        t.documents.where(F.col("doc_id") < 4)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(X.WORD_RE), F.lit(0))
            ).alias("term"),
        )
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("cnt"), F.asc("term"))
    qterms = (
        seed_toks.groupBy("query_id", "term")
        .agg(F.count("*").alias("cnt"))
        .withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") <= 8)
        .select("query_id", "term")
        .localCheckpoint(eager=False)
    )
    xd = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    qv = t.embeddings.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), xd.alias("q_vec")
    )
    c = t.embeddings.select(F.col("vec_id").alias("doc_id"), xd.alias("c_vec"))
    wd = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("doc_id"))
    dense = (
        c.join(F.broadcast(qv))
        .select("query_id", "doc_id", S.cosine(F.col("c_vec"), F.col("q_vec")).alias("cos"))
        .where(F.col("query_id") != F.col("doc_id"))  # exclude the seed itself
        .withColumn("rank", F.row_number().over(wd))
        .where(F.col("rank") <= 10)
        .select("query_id", "doc_id", "rank")
        .localCheckpoint(eager=False)  # consumed twice: positive pick + negative anti-join
    )
    positives = dense.where(F.col("rank") == 1).select(
        "query_id", F.lit("positive").alias("role"), F.lit(1).alias("rank"), "doc_id"
    )
    lex = X.bm25_multi(t.documents, qterms)
    wl = W.partitionBy("query_id").orderBy(F.desc("bm25_ppm"), F.asc("doc_id"))
    negatives = (
        lex.where(F.col("query_id") != F.col("doc_id"))
        .join(dense, ["query_id", "doc_id"], "left_anti")  # lexical, NOT dense-close
        .withColumn("rank", F.row_number().over(wl))
        .where(F.col("rank") <= 3)
        .select("query_id", F.lit("negative").alias("role"), "rank", "doc_id")
    )
    return (
        positives.unionByName(negatives)
        .select(
            "query_id",
            "role",
            F.col("rank").cast("bigint").alias("rank"),
            "doc_id",
        )
        .orderBy("query_id", "role", "rank")
    )


ORACLE["ops_contrastive_pairs"] = r"""
    WITH seed_tc AS (
        SELECT doc_id AS query_id, term, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
              FROM documents WHERE doc_id < 4)
        GROUP BY query_id, term),
    qterms AS (
        SELECT query_id, term FROM (
            SELECT query_id, term,
                   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cnt DESC, term) AS rn
            FROM seed_tc) WHERE rn <= 8),
    qv AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_vec
           FROM embeddings WHERE vec_id < 4),
    c AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS c_vec FROM embeddings),
    dense AS (
        SELECT query_id, doc_id, rank FROM (
            SELECT q.query_id, c.doc_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                                      ORDER BY list_cosine_similarity(c.c_vec, q.q_vec) DESC,
                                               c.doc_id) AS rank
            FROM c CROSS JOIN qv q WHERE c.doc_id <> q.query_id) WHERE rank <= 10),
    positives AS (
        SELECT query_id, 'positive' AS role, CAST(1 AS BIGINT) AS rank, doc_id
        FROM dense WHERE rank = 1),
    d AS (SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS dl
          FROM documents),
    toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
             FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
           WHERE term IN (SELECT DISTINCT term FROM qterms) GROUP BY doc_id, term),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM d),
    scored AS (
        SELECT tf.doc_id, tf.term,
               FLOOR(LN((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                 * (tf * 2.2)
                 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / (CAST(sum_dl AS DOUBLE) / n_docs))))
                 * 1e6) AS score_ppm
        FROM tf JOIN dfreq USING (term) JOIN d USING (doc_id) CROSS JOIN stats),
    lex AS (
        SELECT q.query_id, s.doc_id, CAST(SUM(s.score_ppm) AS BIGINT) AS bm25_ppm
        FROM scored s JOIN qterms q USING (term)
        GROUP BY q.query_id, s.doc_id),
    negatives AS (
        SELECT query_id, 'negative' AS role, CAST(rank AS BIGINT) AS rank, doc_id FROM (
            SELECT l.query_id, l.doc_id,
                   ROW_NUMBER() OVER (PARTITION BY l.query_id
                                      ORDER BY l.bm25_ppm DESC, l.doc_id) AS rank
            FROM lex l
            WHERE l.query_id <> l.doc_id
              AND NOT EXISTS (SELECT 1 FROM dense de
                              WHERE de.query_id = l.query_id AND de.doc_id = l.doc_id))
        WHERE rank <= 3)
    SELECT * FROM (
        SELECT * FROM positives UNION ALL SELECT * FROM negatives
    ) ORDER BY query_id, role, rank
"""


@query("ops_lsh_eval")
def ops_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH quality evaluation — the threshold-tuning QA every dedup
    deployment runs: a bounded 100-doc sample (50 corpus docs + one
    deterministic near-duplicate variant of each, the planted positives
    — the natural corpus sample contains no near-dups, which would make
    the metrics vacuous), exact all-pairs Jaccard as ground truth (the
    cross product is sample², never corpus-shaped — the one place a
    cartesian is the point), and the banded MinHash candidate generator
    scored against it: recall = tp/true pairs (what the bands miss),
    precision = tp/cands (what the verify step must filter).  Exact
    integers + ppm integer division.  Oracle: sequential mirror sharing
    the MinHash machinery (plans/values_oracle.py:ref_lsh_eval,
    pinned sf0.01).

    EVALUATION-ONLY, enforced: the exact-truth arm is intentionally
    all-pairs (sample², the one declared cartesian-by-design), so the
    sample passes through ``dedup.eval_sample_guard`` — pointing this
    harness at more than its guard bound refuses instead of launching a
    corpus² plan.  Production-scale dedup is the banded LSH surface
    (ops_minhash_dedup and friends), which never forms all pairs."""
    t = Tables(spark, sf_dir)
    base = t.documents.where(F.col("doc_id") < 50).select("doc_id", "text")
    variants = base.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" xvariant")).alias("text"),
    )
    guard_stats: dict = {}
    sample = D.eval_sample_guard(base.unionByName(variants), stats=guard_stats)
    ids = sample.select("doc_id")
    all_pairs = (
        ids.select(F.col("doc_id").alias("id_a"))
        .crossJoin(ids.select(F.col("doc_id").alias("id_b")))
        .where(F.col("id_a") < F.col("id_b"))
    )
    counts = D.verify_jaccard_counts(
        sample, all_pairs, threshold_num=0, threshold_den=1
    )
    truth = counts.where(2 * F.col("n_inter") >= F.col("n_union")).select(
        "id_a", "id_b"
    )
    cands = D.lsh_candidate_pairs(sample)
    # r14 collected the scalars driver-side (one literal output row instead
    # of four single-partition agg stages chained by broadcast cross
    # joins).  r15 job-structure pass: truth and cands each had an eager
    # checkpoint plus their own count job plus a shared semi-join count —
    # five driver actions.  Both pair sets are distinct by construction,
    # so ONE outer-merge aggregation computes all three scalars (n_true,
    # n_cand, tp) in a single job, and with a single consumer each the
    # checkpoints go away entirely.  n_pairs = C(n, 2) exactly (ids
    # distinct by construction: doc_id unique, variants offset +10000),
    # with n reused from the guard's own count (eval_sample_guard stats).
    n_ids = guard_stats["n"]
    n_pairs = n_ids * (n_ids - 1) // 2
    merged = (
        cands.select("id_a", "id_b", F.lit(1).alias("_src"))
        .unionByName(truth.select("id_a", "id_b", F.lit(2).alias("_src")))
        .groupBy("id_a", "id_b")
        .agg(
            F.max(F.col("_src") == 1).alias("in_c"),
            F.max(F.col("_src") == 2).alias("in_t"),
        )
        .agg(
            F.sum(F.col("in_c").cast("long")).alias("n_cand"),
            F.sum(F.col("in_t").cast("long")).alias("n_true"),
            F.sum((F.col("in_c") & F.col("in_t")).cast("long")).alias("tp"),
        )
        .first()
    )
    n_true = merged["n_true"] or 0
    n_cand = merged["n_cand"] or 0
    tp = merged["tp"] or 0
    return spark.range(1).select(
        F.lit(n_pairs).cast("bigint").alias("n_pairs"),
        F.lit(n_true).cast("bigint").alias("n_true"),
        F.lit(n_cand).cast("bigint").alias("n_cand"),
        F.lit(tp).cast("bigint").alias("tp"),
        F.lit(1000000 * tp // max(n_true, 1)).cast("bigint").alias("recall_ppm"),
        F.lit(1000000 * tp // max(n_cand, 1)).cast("bigint").alias("precision_ppm"),
    )


@query("ops_mixture_apply")
def ops_mixture_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the data-mixing weights (ops_mixture_weights) — actually
    MATERIALIZE the epoch: each document appears ⌊w⌋ times plus one more
    with probability frac(w), decided by a deterministic content-hash
    coin (md5-prefix mod 1e6 < frac_ppm — reproducible across engines,
    runs, and partitionings; the same stochastic-rounding trick scales
    to any corpus because it needs no global state).  The epoch rows are
    generated by exploding a per-doc copy sequence — the summary is
    aggregated FROM the exploded epoch, so the materialization itself is
    exercised, not just the arithmetic.  Per-source output: input docs,
    epoch rows, epoch tokens (≈ the equalized target per source)."""
    t = Tables(spark, sf_dir)
    # ONE corpus scan (r15): the per-source token totals and the per-doc
    # epoch expansion both consume the same (doc_id, source, n_tok, coin)
    # projection — formerly each re-ran the token_count regex (and the
    # second pass also re-read text for the md5 coin) over the full
    # corpus.  Pinned lazily as a 4-narrow-column frame (guide §1.2);
    # the weights aggregate materializes it.
    coin = F.expr("CAST(conv(substr(md5(text), 1, 8), 16, 10) AS BIGINT) % 1000000")
    base = t.documents.select(
        "doc_id",
        "source",
        X.token_count(F.col("text")).alias("n_tok"),
        coin.alias("_coin"),
    ).localCheckpoint(eager=False)
    per_src = base.groupBy("source").agg(F.sum("n_tok").alias("src_tokens"))
    totals = per_src.agg(
        F.sum("src_tokens").alias("_total"), F.count(F.lit(1)).alias("_nsrc")
    )
    weights = per_src.join(F.broadcast(totals)).select(
        "source",
        F.expr("CAST(((_total DIV _nsrc) * 1000000) DIV src_tokens AS BIGINT)").alias(
            "weight_ppm"
        ),
    )
    docs = (
        base.join(F.broadcast(weights), "source")
        .select(
            "doc_id",
            "source",
            "n_tok",
            (
                F.expr("weight_ppm DIV 1000000")
                + F.when(F.col("_coin") < F.expr("weight_ppm % 1000000"), 1).otherwise(0)
            ).alias("n_copies"),
        )
    )
    # r14: ONE scan and ONE aggregation.  The explode counts 0..n_copies —
    # always an ascending sequence (n_copies >= 0), so no empty-array
    # guard — where _c >= 1 are the epoch copies and the _c = 0 row marks
    # the input doc itself.  The former shape scanned+tokenized documents
    # twice (epoch agg + n_docs agg) and joined the two; here both roll up
    # from the same exploded stream.  The epoch_rows > 0 filter replicates
    # the former INNER join exactly: a source whose docs all drew zero
    # copies had no epoch rows and was dropped there (and is dropped by
    # the unchanged oracle).
    epoch = docs.select(
        "source",
        "n_tok",
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("n_copies").cast("bigint"))).alias("_c"),
    )
    return (
        epoch.groupBy("source")
        .agg(
            F.sum(F.when(F.col("_c") >= 1, 1).otherwise(0)).cast("bigint").alias("epoch_rows"),
            F.sum(F.when(F.col("_c") >= 1, F.col("n_tok")).otherwise(0))
            .cast("bigint")
            .alias("epoch_tokens"),
            F.sum(F.when(F.col("_c") == 0, 1).otherwise(0)).cast("bigint").alias("n_docs_in"),
        )
        .where(F.col("epoch_rows") > 0)
        .select("source", "n_docs_in", "epoch_rows", "epoch_tokens")
        .orderBy("source")
    )


ORACLE["ops_mixture_apply"] = r"""
    WITH s AS (
        SELECT source, CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS src_tokens
        FROM documents GROUP BY source),
    tot AS (SELECT SUM(src_tokens) AS total, COUNT(*) AS nsrc FROM s),
    w AS (SELECT source,
                 CAST(((total // nsrc) * 1000000) // src_tokens AS BIGINT) AS weight_ppm
          FROM s, tot),
    d AS (
        SELECT doc_id, d0.source,
               CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
               (weight_ppm // 1000000)
                 + CASE WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 1000000
                             < weight_ppm % 1000000
                        THEN 1 ELSE 0 END AS n_copies
        FROM documents d0 JOIN w USING (source)),
    epoch AS (
        SELECT source, n_tok FROM d, unnest(range(1, CAST(n_copies AS BIGINT) + 1))),
    agg AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS epoch_rows,
               CAST(SUM(n_tok) AS BIGINT) AS epoch_tokens
        FROM epoch GROUP BY source),
    ins AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_in FROM d GROUP BY source)
    SELECT source, n_docs_in, epoch_rows, epoch_tokens
    FROM agg JOIN ins USING (source) ORDER BY source
"""


@query("ops_text_augment")
def ops_text_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic augmentation for contrastive text training
    (SimCSE-style positives): 10% word dropout where each position's
    keep/drop coin is ``md5(doc_id:position) mod 100`` — reproducible
    across engines, runs, and partitionings, and independent per
    position (a repeated word can drop at one position and survive at
    another).  One projection + one array filter, zero shuffle; output
    stays compact (counts + the md5 of the augmented text)."""
    t = Tables(spark, sf_dir)
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit(X.WORD_RE), F.lit(0))
    w = t.documents.select("doc_id", words.alias("_ws"))
    # SQL filter lambda: the coin needs the 1-based position inside the
    # md5 concat (i + 1 — Spark's HOF index is 0-based, the oracle's
    # range() is 1-based)
    out = w.select(
        "doc_id",
        F.size("_ws").cast("bigint").alias("n_words"),
        F.expr(
            "filter(_ws, (w, i) -> "
            "CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':', "
            "CAST(i + 1 AS STRING))), 1, 8), 16, 10) AS BIGINT) % 100 >= 10)"
        ).alias("_kept"),
    )
    return out.select(
        "doc_id",
        "n_words",
        F.size("_kept").cast("bigint").alias("n_kept"),
        F.md5(F.array_join("_kept", " ")).alias("aug_md5"),
    ).orderBy("doc_id")


ORACLE["ops_text_augment"] = r"""
    WITH w AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        FROM documents),
    g AS (
        SELECT doc_id, i, ws[i] AS word
        FROM w, unnest(range(1, len(ws) + 1)) AS r(i)),
    kept AS (
        SELECT doc_id, i, word FROM g
        WHERE CAST(('0x' || substr(md5(doc_id || ':' || i), 1, 8)) AS BIGINT) % 100 >= 10),
    agg AS (
        SELECT doc_id, COUNT(*) AS n_kept,
               string_agg(word, ' ' ORDER BY i) AS aug
        FROM kept GROUP BY doc_id)
    SELECT w.doc_id, CAST(len(ws) AS BIGINT) AS n_words,
           CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
           md5(COALESCE(aug, '')) AS aug_md5
    FROM w LEFT JOIN agg USING (doc_id) ORDER BY w.doc_id
"""


@query("ops_quality_calibration")
def ops_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration/reliability table for the trained quality classifier
    (the model-QA step after ops_quality_classifier, as ops_lsh_eval is
    for the dedup index): scores bucketed into deciles
    (floor(score_ppm / 100000)), per bucket the doc count, positive
    count, and the observed positive rate in ppm — a well-calibrated
    model's observed rate tracks its bucket.  One aggregation over the
    scored corpus; exact integers."""
    from ..functions.classifier import (
        classifier_scores,
        irls_train,
        text_feature_frame,
    )

    t = Tables(spark, sf_dir)
    feat = text_feature_frame(
        t.documents, keep=((F.col("lang") == "en").cast("int").alias("label"),)
    )
    beta = irls_train(feat)
    scored = classifier_scores(feat, beta, keep=("label",))
    return (
        scored.groupBy(
            F.expr("score_ppm DIV 100000").cast("bigint").alias("decile")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("label").cast("bigint").alias("n_pos"),
        )
        .withColumn(
            "obs_pos_ppm",
            F.expr("CAST(1000000 * n_pos DIV n_docs AS BIGINT)"),
        )
        .orderBy("decile")
    )


@query("ops_bloom_decontaminate")
def ops_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination — the beyond-broadcast scale path for
    benchmark n-gram overlap (`ops_decontaminate` is the exact-set form):
    the eval suite's grams collapse to a fixed 128 KiB bitmap built
    distributed (per-partition numpy bitmaps, driver OR — benchmark
    cardinality never crosses the wire), and the corpus pays one scan +
    an Arrow-batched bit test over JVM xxhash64 gram hashes, zero
    gram-level shuffle.  False positives are one-sided over-flagging at
    the classical Bloom rate — conservative for contamination removal.
    Oracle: a sequential Python mirror with the Spark-bit-equal xxh64
    (plans/values_oracle.py:ref_bloom_decontaminate, pinned to the gate's
    sf0.01) reproduces the filter bit-for-bit, false positives included."""
    t = Tables(spark, sf_dir)
    bench = t.documents.where(F.col("source") == "src0")
    corpus = t.documents.where(F.col("source") != "src0")
    return D.bloom_decontaminate_stats(corpus, bench, n=8).orderBy("doc_id")


@query("ops_compression_filter")
def ops_compression_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEFLATE compression-ratio quality gate (Dolma §2 / RefinedWeb
    repetition heuristics): the compressor is the strongest general
    repetition detector, so docs compressing far below the corpus norm
    are flagged repetitive and near-incompressible docs flagged as noise.
    One mapInPandas corpus scan, integer-ppm ratios; oracle = sequential
    zlib mirror (plans/values_oracle.py:ref_compression_filter, pinned
    to sf0.01)."""
    t = Tables(spark, sf_dir)
    return X.compression_stats(t.documents).orderBy("doc_id")


@query("ops_span_dedup")
def ops_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style duplicate-span removal (Raffel et al. 2020 §2.2: drop all
    but one occurrence of any three-sentence span that appears more than
    once in the corpus).  The corpus has no punctuation, so "sentence" is
    a fixed 8-word window (the same delimiter-agnostic adaptation
    ops_paragraph_dedup documents); a span is 3 consecutive sentences,
    sliding stride 1.  Distinct from ops_paragraph_dedup in both
    directions: spans OVERLAP (stride 1, not a partition), and the
    globally FIRST occurrence (min (doc_id, start)) is KEPT — CCNet drops
    every copy of a duplicated paragraph, C4 keeps one.

    Plan (functions/dedup.py:span_dedup — shared with the streaming
    intake gate run_span_dedup_stream): one scan → span-hash explode
    (one row per span, the ×3 overlap stays inside the md5 argument,
    never materialized) → hash-agg ``min(struct(doc_id, start))`` per
    span hash (mergeable, no window sort over the corpus) → join back on
    duplicated hashes only → covered-sentence explode
    (removed-span-sized, tiny vs corpus) → ordered reassembly via
    sort_array(collect_list(struct)), the same window-free rebuild as
    ops_paragraph_dedup.  Per-hash state is one (count, min-pair): the
    agg shuffles |spans| rows but carries no text."""
    t = Tables(spark, sf_dir)
    return (
        D.span_dedup(t.documents)
        .select("doc_id", "n_sent", "n_removed", F.md5("cleaned").alias("cleaned_md5"))
        .orderBy("doc_id")
    )


ORACLE["ops_span_dedup"] = r"""
    WITH w AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        FROM documents),
    d AS (
        SELECT doc_id, ws,
               GREATEST(CAST(CEIL(len(ws) / 8.0) AS BIGINT), 1) AS nsent
        FROM w),
    sent AS (
        SELECT doc_id, i AS sid,
               array_to_string(ws[(i-1)*8+1 : (i-1)*8+8], ' ') AS sent
        FROM d, unnest(range(1, nsent + 1)) AS r(i)),
    sp AS (
        SELECT doc_id, i AS start,
               md5(array_to_string(ws[(i-1)*8+1 : (i-1)*8+24], ' ')) AS h
        FROM d, unnest(range(1, nsent - 2 + 1)) AS r(i)
        WHERE nsent >= 3),
    occ AS (
        SELECT doc_id, start,
               ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn
        FROM sp),
    rm AS (
        SELECT DISTINCT o.doc_id, o.start + j AS sid
        FROM occ o, unnest(range(0, 3)) AS g(j)
        WHERE o.rn >= 2),
    r AS (
        SELECT s.doc_id, COUNT(*) AS n_sent, COUNT(rm.sid) AS n_removed,
               md5(COALESCE(array_to_string(
                   list_transform(
                       list_sort(list(CASE WHEN rm.sid IS NULL
                                      THEN {'sid': s.sid, 'sent': s.sent} END)),
                       x -> x.sent),
                   ' '), '')) AS cleaned_md5
        FROM sent s LEFT JOIN rm ON s.doc_id = rm.doc_id AND s.sid = rm.sid
        GROUP BY s.doc_id)
    SELECT doc_id, CAST(n_sent AS BIGINT) AS n_sent,
           CAST(n_removed AS BIGINT) AS n_removed, cleaned_md5
    FROM r ORDER BY doc_id
"""


@query("ops_source_cap")
def ops_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget cap — the anti-domination mixing rule
    (FineWeb/RefinedWeb practice: no single crawl/domain may exceed a
    fixed share of the training mix).  Every source ranks its documents
    by a deterministic quality key (unique-word ratio, doc_id
    tie-break) and keeps the prefix whose cumulative token count fits
    the source's budget = 4% of CORPUS tokens (integer arithmetic:
    ``total*4 div 100`` — no float cap drift between engines).

    Plan: one scan computes (n_tokens, uniq_ratio); the corpus total is
    a scalar agg broadcast via cross-join; the running sum is one
    window per source — sources parallelize across the cluster, and a
    single pathological giant source falls back to the boundary-bucket
    technique ops_token_budget_select already implements (the cap rule
    composes with it unchanged)."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit(X.WORD_RE), F.lit(0))
    d = t.documents.select(
        "doc_id",
        "source",
        F.size(words).cast("bigint").alias("n_tokens"),
        (F.size(F.array_distinct(words)).cast("double") / F.size(words)).alias(
            "uniq_ratio"
        ),
    )
    tot = d.agg(F.sum("n_tokens").alias("_tot"))
    win = (
        W.partitionBy("source")
        .orderBy(F.col("uniq_ratio").desc(), F.col("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        d.crossJoin(F.broadcast(tot))
        .withColumn("cum_tokens", F.sum("n_tokens").over(win))
        .withColumn("cap", F.expr("_tot * 4 div 100"))
        .select(
            "source",
            "doc_id",
            "n_tokens",
            "uniq_ratio",
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
            (F.col("cum_tokens") <= F.col("cap")).cast("int").alias("kept"),
        )
        .orderBy("source", "doc_id")
    )


ORACLE["ops_source_cap"] = r"""
    WITH d AS (
        SELECT doc_id, source,
               CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
                   AS n_tokens,
               CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))
                    AS DOUBLE)
                   / len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS uniq_ratio
        FROM documents),
    tot AS (SELECT SUM(n_tokens) AS total FROM d),
    r AS (
        SELECT d.*, tot.total,
               SUM(n_tokens) OVER (PARTITION BY source
                                   ORDER BY uniq_ratio DESC, doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_tokens
        FROM d, tot)
    SELECT source, doc_id, n_tokens, uniq_ratio,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(cum_tokens <= (total * 4 // 100) AS INT) AS kept
    FROM r ORDER BY source, doc_id
"""


@query("ops_unigram_train")
def ops_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer training (Kudo 2018, the SentencePiece
    default) — the tokenizer family's second member next to the full BPE
    chain: over-complete substring seed → hard-EM Viterbi count
    re-estimation → count-based pruning, all integer counts with floats
    recomputed from integers (functions/text.py:unigram_train documents
    the exact determinism + scale contract: one corpus pass to the
    distinct-word table, then model-sized state only).  Oracle: an
    independent sequential implementation of the same spec
    (plans/values_oracle.py:ref_unigram_train, pinned sf0.01)."""
    t = Tables(spark, sf_dir)
    return X.unigram_train(t.documents).orderBy("rank")


@query("ops_unigram_encode")
def ops_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus encoding with the trained unigram model via the QUANTIZED
    integer ``logp_ppm`` scores — the persisted-model contract: a saved
    piece table re-scores identically anywhere.  One Arrow mapInPandas
    scan, Zipf-head memoized; compact verifiable output (counts +
    piece-sequence md5).  Oracle: sequential mirror
    (plans/values_oracle.py:ref_unigram_encode, pinned sf0.01)."""
    t = Tables(spark, sf_dir)
    model = X.unigram_train(t.documents)
    return X.unigram_encode(t.documents, model).orderBy("doc_id")


# ---------------------------------------------------------------------------
# shared funnel gate stages (VERDICT r12 item 6): the three declared
# funnel forms (ops_curation_funnel / _langid / _gopher) attribute
# rejections over the SAME underlying per-doc gate flags; each gate's
# flag frame is computed once per (session, sf_dir) and persisted, so
# running the trio pays for langid training, the dup-keeper agg and the
# contamination semi-join ONCE instead of three times — in a real
# deployment these gates are one pass over the corpus feeding several
# reports, and recomputing them per report would be the dishonest shape.
# Entries stay independently callable (whichever runs first
# materializes; results are deterministic, so sharing cannot change any
# declared hash), pieces are memoized PER GATE so a 3-stage-funnel-only
# caller never pays for langid, and the cache is LRU-capped with
# unpersist-on-evict so long sessions don't pin executor blocks.
# ---------------------------------------------------------------------------
_FUNNEL_CACHE: dict = {}
_FUNNEL_CACHE_MAX = 6


def _funnel_memo(spark: SparkSession, sf_dir: str, piece: str, build):
    app_id = spark.sparkContext.applicationId
    # purge entries from other (stopped) sessions first: their persisted
    # blocks died with the context, and unpersist() on a stopped context
    # raises — a dead entry must never abort a live query build
    for k in [k for k in _FUNNEL_CACHE if k[0] != app_id]:
        try:
            _FUNNEL_CACHE.pop(k).unpersist()
        except Exception:
            pass  # stopped SparkContext: blocks are already gone
    key = (app_id, sf_dir, piece)
    hit = _FUNNEL_CACHE.pop(key, None)
    if hit is not None:
        _FUNNEL_CACHE[key] = hit  # LRU refresh (dicts keep insertion order)
        return hit
    df = build().persist()
    df.count()  # materialize eagerly so every consumer reads pinned blocks
    while len(_FUNNEL_CACHE) >= _FUNNEL_CACHE_MAX:
        try:
            _FUNNEL_CACHE.pop(next(iter(_FUNNEL_CACHE))).unpersist()
        except Exception:
            pass  # evicted entry's context may be gone; eviction must not raise
    _FUNNEL_CACHE[key] = df
    return df


def _funnel_base_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, qfail, dup, contam) over the non-bench corpus — the
    three gates every funnel form shares: quality (length + unique-word
    ratio) from one corpus scan, exact-dup as a hash-agg keeper join
    (md5, never text), contamination as the broadcast 8-gram semi-join
    shared with ops_decontaminate."""

    def build() -> DataFrame:
        t = Tables(spark, sf_dir)
        words = F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(X.WORD_RE), F.lit(0)
        )
        bench = t.documents.where(F.col("source") == "src0")
        corpus = t.documents.where(F.col("source") != "src0")
        d = corpus.select(
            "doc_id",
            "text",
            F.size(words).alias("n_tokens"),
            (F.size(F.array_distinct(words)).cast("double") / F.size(words)).alias(
                "ur"
            ),
        )
        keeper = d.groupBy(F.md5("text").alias("_h")).agg(
            F.min("doc_id").alias("_keeper")
        )
        bench_grams = (
            bench.select(X.word_ngram_strings(words, 8).alias("_gs"))
            .select(F.explode("_gs").alias("gram"))
            .distinct()
        )
        contam_ids = (
            corpus.select(
                "doc_id", F.explode(X.word_ngram_strings(words, 8)).alias("gram")
            )
            .join(F.broadcast(bench_grams), "gram", "left_semi")
            .select("doc_id")
            .distinct()
            .withColumn("_contam", F.lit(1))
        )
        return (
            d.join(keeper, F.md5(F.col("text")) == F.col("_h"), "left")
            .join(contam_ids, "doc_id", "left")
            .select(
                "doc_id",
                ((F.col("n_tokens") < 40) | (F.col("ur") < 0.2)).alias("qfail"),
                (F.col("doc_id") != F.col("_keeper")).alias("dup"),
                F.col("_contam").isNotNull().alias("contam"),
            )
        )

    return _funnel_memo(spark, sf_dir, "base", build)


def _funnel_lreject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lreject) — the langid gate (trained hashed-ngram NB;
    reject when the prediction isn't the target language or the
    log-odds margin is under 12 nats)."""

    def build() -> DataFrame:
        from ..functions.langid import langid_fit_predict

        t = Tables(spark, sf_dir)
        return langid_fit_predict(t.documents).select(
            "doc_id",
            (
                (F.col("lang_pred") != F.lit("en"))
                | (F.col("margin_ppm") < F.lit(12_000_000))
            ).alias("lreject"),
        )

    return _funnel_memo(spark, sf_dir, "lreject", build)


def _funnel_grej(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, grej) — the Gopher-rules gate at the corpus-baseline
    ``n_rules_failed >= 2`` threshold (see ops_gopher_rules)."""

    def build() -> DataFrame:
        t = Tables(spark, sf_dir)
        return X.gopher_rules(t.documents).select(
            "doc_id", (F.col("n_rules_failed") >= 2).alias("grej")
        )

    return _funnel_memo(spark, sf_dir, "grej", build)


@query("ops_curation_funnel")
def ops_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intake-funnel report with FIRST-rejection attribution — the
    monitoring shape a curation pipeline is operated by (each document
    is charged to the first gate that rejects it, so stage counts sum
    exactly to the intake): quality (length + unique-word ratio) →
    exact-dup (non-keeper of an md5 group) → benchmark contamination
    (shared word 8-gram, src0 as the eval suite).  Complements
    ops_curation_pipeline (which emits the surviving docs) and
    ops_dedup_accounting (dedup-only attribution).

    Plan: the gate flags come from the session-memoized shared stage
    frame (_funnel_base_flags — one corpus scan + keeper hash-agg +
    broadcast gram semi-join, computed once for all three funnel
    forms); the funnel itself is ONE conditional aggregate exploded
    into 3 literal-struct rows — no per-stage recount, no driver
    loop."""
    flags = _funnel_base_flags(spark, sf_dir).select("qfail", "dup", "contam")
    c = flags.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("qfail").cast("bigint")).alias("nq"),
        F.sum((~F.col("qfail") & F.col("dup")).cast("bigint")).alias("nd"),
        F.sum(
            (~F.col("qfail") & ~F.col("dup") & F.col("contam")).cast("bigint")
        ).alias("nc"),
    )
    return (
        c.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit(1).alias("stage_rank"),
                        F.lit("quality").alias("stage"),
                        F.col("n").alias("n_in"),
                        F.col("nq").alias("n_rejected"),
                        (F.col("n") - F.col("nq")).alias("n_out"),
                    ),
                    F.struct(
                        F.lit(2).alias("stage_rank"),
                        F.lit("exact_dup").alias("stage"),
                        (F.col("n") - F.col("nq")).alias("n_in"),
                        F.col("nd").alias("n_rejected"),
                        (F.col("n") - F.col("nq") - F.col("nd")).alias("n_out"),
                    ),
                    F.struct(
                        F.lit(3).alias("stage_rank"),
                        F.lit("contaminated").alias("stage"),
                        (F.col("n") - F.col("nq") - F.col("nd")).alias("n_in"),
                        F.col("nc").alias("n_rejected"),
                        (
                            F.col("n") - F.col("nq") - F.col("nd") - F.col("nc")
                        ).alias("n_out"),
                    ),
                )
            ).alias("s")
        )
        .select("s.*")
        .orderBy("stage_rank")
    )


@query("ops_curation_funnel_langid")
def ops_curation_funnel_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The langid-FIRST funnel — the stage order every public pipeline
    the ops family cites actually runs (CCNet/C4/RefinedWeb/FineWeb gate
    on language before quality and dedup): langid (trained hashed-ngram
    NB, functions/langid.py — reject when the prediction isn't the
    target language or the log-odds margin is below 12 nats, the
    low-confidence drop) → quality → exact-dup → contamination, each
    document charged to its FIRST rejecting stage so counts sum to the
    intake.  Extends ops_curation_funnel (kept as the 3-stage SQL-oracle
    form) with the stage that entry couldn't attribute before the
    engine could produce a language prediction.  Oracle: sequential
    mirror (plans/values_oracle.py:ref_curation_funnel_langid, pinned
    sf0.01 — langid flags from the same numpy NB the driver already
    verifies via ops_langid).  Gate flags come from the session-memoized
    shared stage frames (_funnel_base_flags + _funnel_lreject): langid
    training and the base gates are computed once for the whole funnel
    trio."""
    flags = (
        _funnel_base_flags(spark, sf_dir)
        .join(_funnel_lreject(spark, sf_dir), "doc_id")
        .select("lreject", "qfail", "dup", "contam")
    )
    c = flags.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("lreject").cast("bigint")).alias("nl"),
        F.sum((~F.col("lreject") & F.col("qfail")).cast("bigint")).alias("nq"),
        F.sum(
            (~F.col("lreject") & ~F.col("qfail") & F.col("dup")).cast("bigint")
        ).alias("nd"),
        F.sum(
            (
                ~F.col("lreject") & ~F.col("qfail") & ~F.col("dup") & F.col("contam")
            ).cast("bigint")
        ).alias("nc"),
    )
    stage = lambda rank, name, n_in, n_rej: F.struct(  # noqa: E731
        F.lit(rank).alias("stage_rank"),
        F.lit(name).alias("stage"),
        n_in.alias("n_in"),
        n_rej.alias("n_rejected"),
        (n_in - n_rej).alias("n_out"),
    )
    n, nl, nq, nd, nc = (F.col(x) for x in ("n", "nl", "nq", "nd", "nc"))
    return (
        c.select(
            F.explode(
                F.array(
                    stage(1, "langid", n, nl),
                    stage(2, "quality", n - nl, nq),
                    stage(3, "exact_dup", n - nl - nq, nd),
                    stage(4, "contaminated", n - nl - nq - nd, nc),
                )
            ).alias("s")
        )
        .select("s.*")
        .orderBy("stage_rank")
    )


ORACLE["ops_curation_funnel"] = r"""
    WITH corpus AS (
        SELECT doc_id, text,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS words
        FROM documents WHERE source <> 'src0'),
    feat AS (
        SELECT doc_id, text,
               (len(words) < 40 OR
                CAST(len(list_distinct(words)) AS DOUBLE) / len(words) < 0.2)
                   AS qfail
        FROM corpus),
    keeper AS (
        SELECT md5(text) AS h, MIN(doc_id) AS k FROM feat GROUP BY md5(text)),
    bg AS (
        SELECT DISTINCT unnest(list_transform(range(1, len(words) - 6),
                       i -> array_to_string(list_slice(words, i, i + 7), ' ')))
                   AS gram
        FROM (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS words
              FROM documents WHERE source = 'src0')),
    contam AS (
        SELECT DISTINCT doc_id
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(words) - 6),
                            i -> array_to_string(list_slice(words, i, i + 7), ' ')))
                         AS gram
              FROM corpus) cg
        WHERE gram IN (SELECT gram FROM bg)),
    flags AS (
        SELECT f.qfail,
               (f.doc_id <> keeper.k) AS dup,
               (f.doc_id IN (SELECT doc_id FROM contam)) AS contam
        FROM feat f JOIN keeper ON md5(f.text) = keeper.h),
    c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN qfail THEN 1 ELSE 0 END) AS BIGINT) AS nq,
               CAST(SUM(CASE WHEN NOT qfail AND dup THEN 1 ELSE 0 END) AS BIGINT) AS nd,
               CAST(SUM(CASE WHEN NOT qfail AND NOT dup AND contam THEN 1 ELSE 0 END)
                    AS BIGINT) AS nc
        FROM flags)
    SELECT CAST(1 AS INT) AS stage_rank, 'quality' AS stage,
           n AS n_in, nq AS n_rejected, n - nq AS n_out FROM c
    UNION ALL
    SELECT CAST(2 AS INT), 'exact_dup', n - nq, nd, n - nq - nd FROM c
    UNION ALL
    SELECT CAST(3 AS INT), 'contaminated', n - nq - nd, nc, n - nq - nd - nc FROM c
    ORDER BY stage_rank
"""


@query("ops_ngram_diversity")
def ops_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source 3-gram diversity — distinct-gram share of all gram
    instances, in exact ppm.  The mode-collapse / template-domination
    signal used when auditing synthetic or scraped sources before
    mixing: a source whose generator loops (or whose pages share a
    boilerplate skeleton) repeats the same trigrams, so its distinct
    share collapses long before exact or near-dup dedup would fire
    (those need whole documents or long spans to repeat).

    Scale shape: the corpus is scanned ONCE; gram instances reduce
    immediately to (source, gram, n) with map-side combine — the shuffle
    carries the per-source distinct-gram table (vocabulary-sized, Heaps'
    law ≪ corpus), never raw gram instances.  No window, no join, no
    second scan; the same single-scan discipline as ops_ngram_novelty.
    Parity with the reference inventory: a curation-side analytics
    operator, like the reference's per-entity intake stats
    (StreamRunner.scala metrics), extended to content statistics."""
    t = Tables(spark, sf_dir)
    w = F.regexp_extract_all(F.lower("text"), F.lit(X.WORD_RE), 0)
    grams = (
        t.documents.select("source", w.alias("w"))
        .where(F.size("w") >= 3)
        .select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 2),
                    lambda i: F.concat_ws(" ", F.slice("w", i, 3)),
                )
            ).alias("gram"),
        )
    )
    per = grams.groupBy("source", "gram").agg(F.count(F.lit(1)).alias("n"))
    return (
        per.groupBy("source")
        .agg(
            F.sum("n").alias("n_gram_insts"),
            F.count(F.lit(1)).alias("n_distinct_grams"),
        )
        .select(
            "source",
            "n_gram_insts",
            "n_distinct_grams",
            F.expr(
                "CAST((n_distinct_grams * 1000000) DIV n_gram_insts AS BIGINT)"
            ).alias("diversity_ppm"),
        )
        .orderBy("source")
    )


ORACLE["ops_ngram_diversity"] = """
    WITH g AS (
        SELECT source, array_to_string(w[i:i+2], ' ') AS gram
        FROM (SELECT source, w, unnest(generate_series(1, len(w) - 2)) AS i
              FROM (SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                    FROM documents)
              WHERE len(w) >= 3))
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_gram_insts,
           CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct_grams,
           CAST((COUNT(DISTINCT gram) * 1000000) // COUNT(*) AS BIGINT)
               AS diversity_ppm
    FROM g GROUP BY source ORDER BY source
"""


@query("ops_doc_concat_detect")
def ops_doc_concat_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Glued-document detector — the crawl-extraction artifact where two
    unrelated pages land in one record (boilerplate joins, mis-split
    WARC payloads).  Signal: the Jaccard similarity of the DISTINCT word
    sets of a document's first and second halves, in exact ppm — a
    coherent document's halves share vocabulary; two glued articles
    don't.  ``suspect_concat`` flags long docs (>= 40 words, where the
    set estimate is meaningful) whose half-overlap falls below 10%.

    Scale shape: pure per-row projection — split, slice, two
    array_distinct, array_intersect/union — inside one whole-stage
    codegen scan; ZERO shuffles beyond the presentation order.  The
    arrays live only inside the projection (never exploded), so the
    operator is corpus-linear with no state."""
    t = Tables(spark, sf_dir)
    w = F.regexp_extract_all(F.lower("text"), F.lit(X.WORD_RE), 0)
    half = (
        t.documents.select("doc_id", w.alias("w"))
        .select(
            "doc_id",
            F.size("w").alias("n_words"),
            F.array_distinct(
                F.slice("w", F.lit(1), (F.size("w") / 2).cast("int"))
            ).alias("h1"),
            F.array_distinct(
                F.expr("slice(w, CAST(size(w) / 2 AS INT) + 1, size(w))")
            ).alias("h2"),
        )
    )
    # size() is 32-bit: promote to BIGINT before the ppm multiply, or any
    # document whose halves share >2147 distinct words overflows under ANSI.
    jacc = F.expr(
        "(CAST(size(array_intersect(h1, h2)) AS BIGINT) * 1000000)"
        " DIV CAST(size(array_union(h1, h2)) AS BIGINT)"
    )
    return (
        half.select(
            "doc_id",
            "n_words",
            F.when(F.size(F.array_union("h1", "h2")) > 0, jacc)
            .otherwise(F.lit(0).cast("bigint"))
            .alias("half_jaccard_ppm"),
        )
        .withColumn(
            "suspect_concat",
            (F.col("n_words") >= 40) & (F.col("half_jaccard_ppm") < 100000),
        )
        .orderBy("doc_id")
    )


ORACLE["ops_doc_concat_detect"] = """
    WITH h AS (
        SELECT doc_id, len(w) AS n_words,
               list_distinct(w[1:len(w) // 2]) AS h1,
               list_distinct(w[len(w) // 2 + 1:len(w)]) AS h2
        FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
              FROM documents)),
    j AS (
        SELECT doc_id, n_words,
               len(list_intersect(h1, h2)) AS inter,
               len(list_distinct(list_concat(h1, h2))) AS uni
        FROM h)
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(CASE WHEN uni > 0 THEN (inter * 1000000) // uni ELSE 0 END
                AS BIGINT) AS half_jaccard_ppm,
           (n_words >= 40 AND
            CASE WHEN uni > 0 THEN (inter * 1000000) // uni ELSE 0 END < 100000)
               AS suspect_concat
    FROM j ORDER BY doc_id
"""

@query("ops_exact_substring_dedup")
def ops_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup (Lee et al. 2021): cut every verbatim duplicated
    run of >= 20 tokens, keeping the globally first occurrence — the
    exact counterpart of ops_substring_dedup's winnowing APPROXIMATION
    and the C4-style span removal's fixed-granularity cousin
    (ops_span_dedup removes whole 3-sentence spans; this removes the
    precise duplicated token range, whatever its alignment).  20 tokens
    is the 50-BPE-token paper threshold scaled to this corpus's ~55-word
    documents; the operator is threshold-parametric.

    Plan (functions/dedup.py:exact_substring_dedup): gram-anchored — a
    duplicated run of m >= L tokens is exactly the union of its m-L+1
    duplicated stride-1 L-gram intervals, so maximal-match extension
    falls out of overlapping anchors with no suffix array and no
    driver-side state: one corpus-linear gram-hash explode →
    ``min(struct(doc_id, start))`` keep-first hash-agg (mergeable,
    duplicated hashes only survive) → removed-interval explode
    (removed-run-sized) → window-free ordered reassembly."""
    t = Tables(spark, sf_dir)
    return (
        D.exact_substring_dedup(t.documents, min_len=20)
        .select(
            "doc_id",
            "n_tokens",
            "n_removed",
            F.md5("cleaned").alias("cleaned_md5"),
        )
        .orderBy("doc_id")
    )


ORACLE["ops_exact_substring_dedup"] = r"""
    WITH w AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        FROM documents),
    g AS (
        SELECT doc_id, i AS start,
               md5(array_to_string(ws[i:i+19], ' ')) AS h
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 19)) AS i
              FROM w WHERE len(ws) >= 20)),
    occ AS (
        SELECT doc_id, start,
               ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn
        FROM g),
    rm AS (
        SELECT DISTINCT doc_id, tid
        FROM (SELECT o.doc_id, o.start + j AS tid
              FROM occ o, unnest(range(0, 20)) AS r(j)
              WHERE o.rn >= 2)),
    tok AS (
        SELECT doc_id, i AS tid, ws[i] AS token
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
              FROM w WHERE len(ws) >= 1)),
    agg AS (
        SELECT t.doc_id, COUNT(*) AS n_tokens, COUNT(rm.tid) AS n_removed,
               md5(COALESCE(array_to_string(
                   list_transform(
                       list_sort(list(CASE WHEN rm.tid IS NULL
                                      THEN {'tid': t.tid, 'token': t.token} END)),
                       x -> x.token),
                   ' '), '')) AS cleaned_md5
        FROM tok t LEFT JOIN rm ON t.doc_id = rm.doc_id AND t.tid = rm.tid
        GROUP BY t.doc_id)
    SELECT w.doc_id, CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(a.n_removed, 0) AS BIGINT) AS n_removed,
           COALESCE(a.cleaned_md5, md5('')) AS cleaned_md5
    FROM w LEFT JOIN agg a USING (doc_id)
    ORDER BY w.doc_id
"""

@query("ops_bpe_bytes_train")
def ops_bpe_bytes_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level BPE training (GPT-2-style byte fallback, Radford et al.
    2019) — completes the tokenizer family with the no-OOV variant: the
    initial alphabet is the 256 UTF-8 byte values as lowercase hex
    pairs, words are whitespace-split and case-preserving, so ANY input
    (emoji, CJK, mojibake) is coverable.  Same greedy argmax loop,
    tie-break, and adaptive driver/distributed engine as ops_bpe_train
    (functions/text.py:_bpe_merge_loop — shared code path).  Oracle:
    independent sequential byte-BPE reference
    (plans/values_oracle.py:ref_bpe_bytes_train, pinned to sf0.01)."""
    t = Tables(spark, sf_dir)
    merges, vocab = X.bpe_bytes_train(t.documents, n_merges=10)
    vocab.unpersist()
    df = local_df(
        spark,
        [(r, l, rt, l + rt, c) for (r, l, rt, c) in merges],
        "merge_rank long, left_sym string, right_sym string, merged string, pair_count long",
    )
    return df.orderBy("merge_rank")


@query("ops_bpe_bytes_encode")
def ops_bpe_bytes_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level BPE train → ENCODE with the no-OOV guarantee: every
    whitespace word decomposes to hex byte symbols before merging, so
    nothing is dropped on any script (functions/text.py:
    bpe_bytes_encode — distinct words segmented once in Arrow
    mapInPandas, per-doc totals via one word-key join + agg, the
    Heaps-law vocab-compression economics of ops_bpe_encode).  Oracle:
    independent sequential train+encode reference
    (plans/values_oracle.py:ref_bpe_bytes_encode, pinned to sf0.01)."""
    t = Tables(spark, sf_dir)
    merges, vocab = X.bpe_bytes_train(t.documents, n_merges=10)
    vocab.unpersist()
    return X.bpe_bytes_encode(t.documents, merges).orderBy("doc_id")

@query("ops_wordpiece_train")
def ops_wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece training (Schuster & Nakajima 2012, the BERT tokenizer)
    — the third classic subword algorithm, completing the trio with BPE
    (raw pair-count argmax) and unigram-LM (Viterbi pruning): each round
    merges the pair maximizing the likelihood gain
    count(pair)/(count(left)·count(right)), compared as exact
    cross-multiplied integers so the table is deterministic across
    engines (functions/text.py:wordpiece_train — corpus pass
    distributed, merge loop driver-side over the Heaps-compressed
    vocabulary by design; see docstring).  Oracle: independent
    sequential reference (plans/values_oracle.py:ref_wordpiece_train,
    pinned to sf0.01)."""
    t = Tables(spark, sf_dir)
    merges = X.wordpiece_train(t.documents, n_merges=10)
    df = local_df(
        spark,
        merges,
        "merge_rank long, left_sym string, right_sym string, merged string, "
        "pair_count long, left_count long, right_count long",
    )
    return df.orderBy("merge_rank")


@query("ops_wordpiece_encode")
def ops_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece train → ENCODE: greedy longest-match-first against the
    trained vocabulary (##-continuation pieces, whole-word [UNK] on an
    unseen char — n_unk is the coverage column a tokenizer report
    carries).  Distinct words segmented once in Arrow mapInPandas with
    the vocab set in the closure, per-doc totals via one word-key join +
    agg (the ops_bpe_encode economics).  Oracle: independent sequential
    train+encode reference (plans/values_oracle.py:ref_wordpiece_encode,
    pinned to sf0.01)."""
    t = Tables(spark, sf_dir)
    merges = X.wordpiece_train(t.documents, n_merges=10)
    vocab = X.wordpiece_vocab(t.documents, merges)
    return X.wordpiece_encode(t.documents, merges, vocab).orderBy("doc_id")

@query("ops_langid_train")
def ops_langid_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained language-ID model (hashed byte-n-gram multinomial NB —
    Cavnar & Trenkle 1994 profiles over a fastText-style hashed feature
    space): the first gate of every public curation pipeline (CCNet, C4,
    RefinedWeb, FineWeb filter on language BEFORE quality/dedup), and the
    in-engine producer of the ``lang`` column the curation ops consume
    (bfd_pack strata, mixture weights).  Unlike ops_lang_id's fixed
    charset heuristic this is TRAINED on the labeled corpus: one Arrow
    scan to (label, bucket, cnt) partials, one bounded model-sized
    shuffle (functions/langid.py:langid_train).  Declared result = the
    per-lang summary whose model_md5 pins every count in the L×B model.
    Oracle: independent sequential mirror
    (plans/values_oracle.py:ref_langid_train, pinned sf0.01)."""
    from ..functions.langid import langid_doc_counts, langid_model_summary, langid_train

    t = Tables(spark, sf_dir)
    model = langid_train(t.documents)
    counts = langid_doc_counts(t.documents)
    return langid_model_summary(model, counts).orderBy("lang")


@query("ops_langid")
def ops_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID sweep: train the hashed-ngram NB on the labeled corpus,
    broadcast the bounded L×B log-prob model, score every document in one
    Arrow pass — (doc_id, lang_pred, margin_ppm), margin = winner's
    log-odds lead in floor-micro-nats (functions/langid.py:
    langid_fit_predict; corpus never shuffles).  On this synthetic corpus
    the labels are near-random w.r.t. text, so the declared result
    verifies the TRAINING+SCORING machinery bit-for-bit (the
    ops_quality_classifier discipline) — discrimination skill on actually
    distinct languages is pytest-proven on planted multilingual text
    (tests/test_classifier.py).  Oracle: sequential numpy mirror
    (plans/values_oracle.py:ref_langid, pinned sf0.01)."""
    from ..functions.langid import langid_fit_predict

    t = Tables(spark, sf_dir)
    return langid_fit_predict(t.documents).orderBy("doc_id")


@query("ops_token_packing_bfd")
def ops_token_packing_bfd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-fit-decreasing sequence packing — documents stay WHOLE and
    bins fill greedily (the padding-efficiency upgrade over
    ops_token_packing's concat-and-chop when attention must not cross
    document boundaries; see functions/curation.py:bfd_pack for the
    determinism contract and the per-stratum applyInPandas scale shape —
    packing runs over the 24-byte-per-doc token-count table, never
    text).  Oracle: independent sequential BFD mirror
    (plans/values_oracle.py:ref_token_packing_bfd, pinned to sf0.01)."""
    from ..functions.curation import bfd_pack

    t = Tables(spark, sf_dir)
    return bfd_pack(t.documents, budget=4096).orderBy("lang", "seq_id")


# ---------------------------------------------------------------------------
# URL-level curation (functions/web.py) — the crawl pipeline's stage zero
# ---------------------------------------------------------------------------


@query("ops_url_normalize")
def ops_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (RFC 3986 §6 syntax normalization + the
    tracking-param strip every public crawl pipeline applies — RefinedWeb
    §3.1, C4): lower-cased scheme/host, www. stripped, default port
    dropped, fragment dropped, utm_*/ref/fbclid/gclid params removed,
    surviving params byte-sorted, trailing slash stripped.  One codegen'd
    projection — regex + array lambdas, no Python, no shuffle
    (functions/web.py:canonicalize_url).  The corpus has no url column,
    so both sides synthesize the SAME deterministic url from
    (doc_id, source) first (functions/web.py:synthesize_url /
    SYNTH_URL_SQL), exercising every rule."""
    from ..functions import web as WB

    t = Tables(spark, sf_dir)
    url = WB.synthesize_url(F.col("doc_id"), F.col("source"))
    return (
        t.documents.select(
            "doc_id",
            url.alias("url"),
            WB.canonicalize_url(url).alias("canon_url"),
        )
        .orderBy("doc_id")
    )


ORACLE["ops_url_normalize"] = f"""
    WITH u AS (
        SELECT doc_id, {WB_SYNTH_URL_SQL} AS url FROM documents)
    SELECT doc_id, url, {WB_CANON_URL_SQL} AS canon_url
    FROM u ORDER BY doc_id
"""


@query("ops_url_dedup")
def ops_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup: one row per canonical URL, keeper = longest text,
    ties to smallest doc_id (RefinedWeb dedups on the canonical URL
    BEFORE any text processing — it is the cheapest dedup stage because
    it never reads the body).  ONE hash aggregation on the canonical key
    with a mergeable max(struct) arg-max — map-side combine collapses
    duplicates pre-shuffle, no window, no second corpus pass
    (functions/web.py:url_dedup)."""
    from ..functions import web as WB

    t = Tables(spark, sf_dir)
    url = WB.synthesize_url(F.col("doc_id"), F.col("source"))
    canon = t.documents.select(
        "doc_id", "n_chars", WB.canonicalize_url(url).alias("canon_url")
    )
    return WB.url_dedup(canon).orderBy("keeper_id", "canon_url")


ORACLE["ops_url_dedup"] = f"""
    WITH u AS (
        SELECT doc_id, n_chars, {WB_SYNTH_URL_SQL} AS url FROM documents),
    c AS (
        SELECT doc_id, n_chars, {WB_CANON_URL_SQL} AS canon_url FROM u),
    r AS (
        SELECT canon_url, doc_id, n_chars,
               row_number() OVER (PARTITION BY canon_url ORDER BY n_chars DESC, doc_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY canon_url) AS n_copies
        FROM c)
    SELECT canon_url, doc_id AS keeper_id, n_chars AS keeper_chars,
           CAST(n_copies AS BIGINT) AS n_copies
    FROM r WHERE rn = 1 ORDER BY keeper_id, canon_url
"""


@query("ops_domain_cap")
def ops_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host contribution cap (C4 / MassiveText limit how much any one
    domain contributes to training): keep at most 16 documents per
    canonical host, selected by smallest md5(doc_id) — a deterministic
    uniform sample, unbiased w.r.t. content.  Declared form is the exact
    per-host row_number window; the 100-TB form (documented on
    functions/web.py:host_cap) computes each host's cap-th-smallest hash
    as a threshold (one agg + one semi-join) so no per-host sort
    materializes.  Output pins the kept set via an md5 over the ordered
    kept doc_ids."""
    from ..functions import web as WB

    t = Tables(spark, sf_dir)
    url = WB.synthesize_url(F.col("doc_id"), F.col("source"))
    hosts = t.documents.select(
        "doc_id",
        F.regexp_extract(WB.canonicalize_url(url), r"^[^:]+://([^/:?#]*)", 1).alias("host"),
    )
    return WB.host_cap(hosts, cap=16).orderBy("host")


ORACLE["ops_domain_cap"] = f"""
    WITH u AS (
        SELECT doc_id, {WB_SYNTH_URL_SQL} AS url FROM documents),
    c AS (
        SELECT doc_id, regexp_extract({WB_CANON_URL_SQL}, '^[^:]+://([^/:?#]*)', 1) AS host FROM u),
    r AS (
        SELECT host, doc_id,
               row_number() OVER (PARTITION BY host ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM c)
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rn <= 16 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(string_agg(CASE WHEN rn <= 16 THEN CAST(doc_id AS VARCHAR) END, ',' ORDER BY doc_id)) AS kept_md5
    FROM r GROUP BY host ORDER BY host
"""


# ---------------------------------------------------------------------------
# Kneser–Ney bigram LM (functions/lm.py) — the CCNet perplexity gate, exact
# ---------------------------------------------------------------------------

_KN_ORACLE_COMMON = r"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        FROM documents),
    bg AS (
        SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
        FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
              FROM toks WHERE len(ws) >= 2)),
    model AS (
        SELECT w1, w2, COUNT(*) AS c FROM bg WHERE doc_id % 2 = 0 GROUP BY w1, w2),
    ctx AS (
        SELECT w1, SUM(c) AS cu, COUNT(*) AS n1u FROM model GROUP BY w1),
    cont AS (
        SELECT w2, COUNT(*) AS n1w FROM model GROUP BY w2),
    tot AS (
        SELECT COUNT(*) AS n1tot FROM model)
"""


@query("ops_kn_lm_train")
def ops_kn_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram LM training (Kneser & Ney 1995;
    Chen & Goodman 1999) — the smoothed upgrade of ops_bigram_lm and the
    in-engine form of CCNet's KenLM gate.  Trains on the even-doc_id
    half; declared result = the 100 most frequent bigrams with their
    full KN decomposition (c, cu, n1u, n1w, n1tot, p_ppm in the exact
    3/4-discount integer arithmetic functions/lm.py documents).  ONE
    corpus aggregation; every other quantity derives from the
    vocab²-bounded count table."""
    from ..functions import lm as LM

    t = Tables(spark, sf_dir)
    train = t.documents.where(F.col("doc_id") % 2 == 0)
    model, ctx, cont, tot = LM.kn_model(train)
    return (
        LM.kn_model_table(model, ctx, cont, tot)
        .orderBy(F.desc("c"), "w1", "w2")
        .limit(100)
    )


ORACLE["ops_kn_lm_train"] = _KN_ORACLE_COMMON + r"""
    SELECT w1, w2, CAST(c AS BIGINT) AS c, CAST(cu AS BIGINT) AS cu,
           CAST(n1u AS BIGINT) AS n1u, CAST(n1w AS BIGINT) AS n1w,
           CAST(n1tot AS BIGINT) AS n1tot,
           CAST((GREATEST(4 * c - 3, 0) * 1000000) // (4 * cu)
                + (3 * n1u * n1w * 1000000) // (4 * cu * n1tot) AS BIGINT) AS p_ppm
    FROM model JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN tot
    ORDER BY c DESC, w1, w2 LIMIT 100
"""


@query("ops_kn_perplexity")
def ops_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KN fluency sweep: train on the even half, score EVERY doc (the odd
    half is genuinely held out, so the continuation-backoff path runs on
    real unseen bigrams — n_unseen counts them).  kn_ppm = integer mean
    transition probability (the ops_bigram_lm ranking convention, log-free
    and hash-stable).  Two corpus passes total (count + score); the
    (w1,w2) model join is the only corpus-sized shuffle, per-context /
    per-word tables broadcast (functions/lm.py:kn_score)."""
    from ..functions import lm as LM

    t = Tables(spark, sf_dir)
    train = t.documents.where(F.col("doc_id") % 2 == 0)
    scored = LM.kn_score(t.documents, *LM.kn_model(train))
    return scored.select(
        "doc_id",
        "n_bigrams",
        "n_unseen",
        "kn_ppm",
        F.when(F.col("doc_id") % 2 == 0, F.lit("train"))
        .otherwise(F.lit("held"))
        .alias("split"),
    ).orderBy("doc_id")


ORACLE["ops_kn_perplexity"] = _KN_ORACLE_COMMON + r"""
    , scored AS (
        SELECT bg.doc_id,
               model.c,
               CASE WHEN ctx.cu IS NULL
                    THEN (coalesce(cont.n1w, 0) * 1000000) // (SELECT n1tot FROM tot)
                    ELSE (GREATEST(4 * coalesce(model.c, 0) - 3, 0) * 1000000) // (4 * ctx.cu)
                         + (3 * ctx.n1u * coalesce(cont.n1w, 0) * 1000000)
                           // (4 * ctx.cu * (SELECT n1tot FROM tot))
               END AS p_ppm
        FROM bg
        LEFT JOIN model USING (w1, w2)
        LEFT JOIN ctx USING (w1)
        LEFT JOIN cont USING (w2))
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
           CAST(SUM(p_ppm) // COUNT(*) AS BIGINT) AS kn_ppm,
           CASE WHEN doc_id % 2 = 0 THEN 'train' ELSE 'held' END AS split
    FROM scored GROUP BY doc_id ORDER BY doc_id
"""


@query("ops_tokenizer_fertility")
def ops_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility report — the standard tokenizer-quality eval
    (tokens-per-word "fertility" and chars-per-token compression, by
    language): multilingual pipelines watch fertility per language
    because a tokenizer trained lopsided makes some languages pay 2-3×
    the sequence length for the same text.  Train BPE, encode the corpus
    (distinct-word segmentation — Heaps-law sublinear), join lang, ONE
    per-lang aggregate with integer-DIV ppm ratios.  Oracle: independent
    sequential train+encode mirror (plans/values_oracle.py:
    ref_tokenizer_fertility, pinned sf0.01)."""
    t = Tables(spark, sf_dir)
    merges, vocab = X.bpe_train(t.documents, n_merges=10)
    vocab.unpersist()
    enc = X.bpe_encode(t.documents, merges)
    return (
        enc.join(t.documents.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("n_chars_encoded").cast("bigint").alias("n_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_tokens",
            F.expr("CAST(n_tokens * 1000000 DIV n_words AS BIGINT)").alias(
                "fertility_ppm"
            ),
            F.expr("CAST(n_chars * 1000000 DIV n_tokens AS BIGINT)").alias(
                "chars_per_token_ppm"
            ),
        )
        .orderBy("lang")
    )


@query("ops_gopher_rules")
def ops_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published Gopher/MassiveText document-quality rule set (Rae et
    al. 2021, App. A1.1) as ONE codegen'd projection (functions/text.py:
    gopher_rules) — word-count bounds, mean-word-length bounds,
    symbol-to-word ratio (# and ...), bullet- / ellipsis-line fractions,
    alphabetic-word fraction, and the >=2-distinct-stopwords rule — each
    rule's measurement AND the failed-rule count + verdict declared per
    doc (funnel attribution).  Thresholds are the PUBLISHED ones, kept
    honest: the synthetic corpus's vocabulary carries only one listed
    stopword, so every doc fails that rule and `passes` is false
    corpus-wide — per-rule discrimination is pinned by planted boundary
    tests (tests/test_functions.py:TestGopherRules).  All ratios exact
    integer ppm; no shuffle, no Python, no window — the cheapest quality
    gate, running first after langid in the published pipelines."""
    t = Tables(spark, sf_dir)
    return X.gopher_rules(t.documents).orderBy("doc_id")


ORACLE["ops_gopher_rules"] = r"""
    WITH d AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS ws,
               string_split(text, chr(10)) AS lines,
               CAST(len(regexp_extract_all(text, '#'))
                    + len(regexp_extract_all(text, '\.\.\.')) AS BIGINT) AS n_symbols
        FROM documents),
    m AS (
        SELECT doc_id,
               CAST(len(ws) AS BIGINT) AS n_words,
               CASE WHEN len(ws) = 0 THEN NULL ELSE
                 CAST(list_aggregate(list_transform(ws, w -> length(w)), 'sum') * 1000000 // len(ws) AS BIGINT) END AS mwl_ppm,
               CASE WHEN len(ws) = 0 THEN NULL ELSE
                 CAST(n_symbols * 1000000 // len(ws) AS BIGINT) END AS symbol_ppm,
               CASE WHEN len(ws) = 0 THEN NULL ELSE
                 CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) * 1000000 // len(ws) AS BIGINT) END AS alpha_ppm,
               CAST(len(list_filter(lines, l -> regexp_matches(l, '^\s*([-*•]|[0-9]+\.)\s'))) * 1000000
                    // len(lines) AS BIGINT) AS bullet_ppm,
               CAST(len(list_filter(lines, l -> regexp_matches(l, '\.\.\.\s*$'))) * 1000000
                    // len(lines) AS BIGINT) AS ellipsis_ppm,
               CAST(len(list_intersect(list_distinct(ws),
                    ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS n_stop_distinct
        FROM d)
    SELECT *,
           CAST(CAST(NOT n_words BETWEEN 50 AND 100000 AS INT)
              + CAST(NOT coalesce(mwl_ppm BETWEEN 3000000 AND 10000000, false) AS INT)
              + CAST(NOT coalesce(symbol_ppm <= 100000, false) AS INT)
              + CAST(NOT coalesce(alpha_ppm >= 800000, false) AS INT)
              + CAST(NOT bullet_ppm <= 900000 AS INT)
              + CAST(NOT ellipsis_ppm <= 300000 AS INT)
              + CAST(NOT n_stop_distinct >= 2 AS INT) AS BIGINT) AS n_rules_failed,
           (CAST(NOT n_words BETWEEN 50 AND 100000 AS INT)
              + CAST(NOT coalesce(mwl_ppm BETWEEN 3000000 AND 10000000, false) AS INT)
              + CAST(NOT coalesce(symbol_ppm <= 100000, false) AS INT)
              + CAST(NOT coalesce(alpha_ppm >= 800000, false) AS INT)
              + CAST(NOT bullet_ppm <= 900000 AS INT)
              + CAST(NOT ellipsis_ppm <= 300000 AS INT)
              + CAST(NOT n_stop_distinct >= 2 AS INT)) = 0 AS passes
    FROM m ORDER BY doc_id
"""


@query("ops_ccnet_kn_buckets")
def ops_ccnet_kn_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The authentic CCNet routing chain completed: language → KN-LM
    fluency → per-language head/middle/tail terciles (Wenzek et al. 2020
    buckets by KenLM perplexity per language; ops_ccnet_buckets does the
    same routing on the heuristic quality score).  Scores come from the
    interpolated-KN sweep (train-on-even, functions/lm.py); the tercile
    is NTILE(3) over (kn_ppm DESC, doc_id) within each language — higher
    mean transition probability = head.  Scale note as ops_ccnet_buckets:
    the declared form keeps the per-language window sort; at 100 TB the
    same routing computes two tercile thresholds per language with
    operators/quantiles.exact_percentiles and buckets map-side."""
    from pyspark.sql import Window as W

    from ..functions import lm as LM

    t = Tables(spark, sf_dir)
    train = t.documents.where(F.col("doc_id") % 2 == 0)
    scored = LM.kn_score(t.documents, *LM.kn_model(train))
    w = W.partitionBy("lang").orderBy(F.desc("kn_ppm"), "doc_id")
    return (
        scored.join(t.documents.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "kn_ppm",
            F.ntile(3).over(w).cast("bigint").alias("bucket"),
        )
        .orderBy("doc_id")
    )


ORACLE["ops_ccnet_kn_buckets"] = _KN_ORACLE_COMMON + r"""
    , scored AS (
        SELECT bg.doc_id,
               model.c,
               CASE WHEN ctx.cu IS NULL
                    THEN (coalesce(cont.n1w, 0) * 1000000) // (SELECT n1tot FROM tot)
                    ELSE (GREATEST(4 * coalesce(model.c, 0) - 3, 0) * 1000000) // (4 * ctx.cu)
                         + (3 * ctx.n1u * coalesce(cont.n1w, 0) * 1000000)
                           // (4 * ctx.cu * (SELECT n1tot FROM tot))
               END AS p_ppm
        FROM bg
        LEFT JOIN model USING (w1, w2)
        LEFT JOIN ctx USING (w1)
        LEFT JOIN cont USING (w2)),
    docscore AS (
        SELECT doc_id, CAST(SUM(p_ppm) // COUNT(*) AS BIGINT) AS kn_ppm
        FROM scored GROUP BY doc_id)
    SELECT d.doc_id, docs.lang, d.kn_ppm,
           CAST(ntile(3) OVER (PARTITION BY docs.lang
                               ORDER BY d.kn_ppm DESC, d.doc_id) AS BIGINT) AS bucket
    FROM docscore d JOIN documents docs ON d.doc_id = docs.doc_id
    ORDER BY d.doc_id
"""


@query("ops_event_funnel")
def ops_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel over the event stream (signup → view →
    purchase): a user advances a step only with an event STRICTLY AFTER
    their previous step's time — the product-analytics primitive every
    warehouse ships (strict-order semantics, not mere co-occurrence).
    Three per-user hash aggs chained by two user-key joins (co-partitioned
    on user_id — AQE broadcasts the shrinking step tables); inter-step
    gaps in exact epoch-microsecond integers (sum DIV count)."""
    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id", "event_type", F.unix_micros("ts").alias("us"))
    s1 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "view")
        .join(s1, "user_id")
        .where(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"), F.min("t1").alias("t1"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"), F.min("t2").alias("t2"))
    )
    r1 = s1.agg(
        F.lit(1).cast("bigint").alias("step_rank"),
        F.lit("signup").alias("step"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.lit(None).cast("bigint").alias("mean_gap_us"),
    )
    r2 = s2.agg(
        F.lit(2).cast("bigint").alias("step_rank"),
        F.lit("view").alias("step"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.expr("CAST(sum(t2 - t1) DIV count(1) AS BIGINT)").alias("mean_gap_us"),
    )
    r3 = s3.agg(
        F.lit(3).cast("bigint").alias("step_rank"),
        F.lit("purchase").alias("step"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.expr("CAST(sum(t3 - t2) DIV count(1) AS BIGINT)").alias("mean_gap_us"),
    )
    return r1.unionByName(r2).unionByName(r3).orderBy("step_rank")


ORACLE["ops_event_funnel"] = """
    WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    s1 AS (
        SELECT user_id, MIN(us) AS t1 FROM ev WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (
        SELECT ev.user_id, MIN(ev.us) AS t2, MIN(s1.t1) AS t1
        FROM ev JOIN s1 USING (user_id)
        WHERE ev.event_type = 'view' AND ev.us > s1.t1 GROUP BY ev.user_id),
    s3 AS (
        SELECT ev.user_id, MIN(ev.us) AS t3, MIN(s2.t2) AS t2
        FROM ev JOIN s2 USING (user_id)
        WHERE ev.event_type = 'purchase' AND ev.us > s2.t2 GROUP BY ev.user_id)
    SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS step_rank, 'signup' AS step,
               CAST(COUNT(*) AS BIGINT) AS n_users, CAST(NULL AS BIGINT) AS mean_gap_us
        FROM s1
        UNION ALL
        SELECT 2, 'view', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(t2 - t1) // COUNT(*) AS BIGINT) FROM s2
        UNION ALL
        SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(t3 - t2) // COUNT(*) AS BIGINT) FROM s3)
    ORDER BY step_rank
"""


@query("ops_cohort_retention")
def ops_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen week,
    counted in every later week they were active — (cohort_week,
    offset_weeks, n_users), the other canonical product-analytics rollup.
    Two hash aggs (first-seen per user; distinct user-weeks) and one
    user-key join; week arithmetic on date_trunc('week') is
    Monday-anchored identically in Spark and DuckDB, offsets are exact
    day-diffs DIV 7."""
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    )
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort_week",
            F.expr("CAST(datediff(wk, cohort_week) DIV 7 AS BIGINT)").alias(
                "offset_weeks"
            ),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("cohort_week", "offset_weeks")
    )


ORACLE["ops_cohort_retention"] = """
    WITH ev AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
    first AS (
        SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY user_id)
    SELECT cohort_week,
           CAST(date_diff('day', cohort_week, wk) // 7 AS BIGINT) AS offset_weeks,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM ev JOIN first USING (user_id)
    GROUP BY cohort_week, offset_weeks
    ORDER BY cohort_week, offset_weeks
"""


@query("ops_curation_funnel_gopher")
def ops_curation_funnel_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE published stage order with per-stage attribution:
    langid → Gopher rules → quality → exact-dup → contamination (CCNet/
    C4/RefinedWeb/FineWeb run exactly this cheap-to-expensive ladder),
    each doc charged to its FIRST rejecting stage so counts sum to the
    intake.  The Gopher stage rejects at ``n_rules_failed >= 2`` — the
    corpus-baseline threshold, since this synthetic corpus structurally
    fails the stopword rule everywhere (see ops_gopher_rules; C4
    similarly dropped Gopher rules that didn't fit its corpus — rule-set
    tuning per corpus is the published practice).  Oracle: sequential
    mirror (plans/values_oracle.py:ref_curation_funnel_gopher, pinned
    sf0.01).  Gate flags come from the session-memoized shared stage
    frames (_funnel_base_flags + _funnel_lreject + _funnel_grej):
    langid training and the base gates are computed once for the whole
    funnel trio."""
    flags = (
        _funnel_base_flags(spark, sf_dir)
        .join(_funnel_lreject(spark, sf_dir), "doc_id")
        .join(_funnel_grej(spark, sf_dir), "doc_id")
        .select("lreject", "grej", "qfail", "dup", "contam")
    )
    c = flags.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("lreject").cast("bigint")).alias("nl"),
        F.sum((~F.col("lreject") & F.col("grej")).cast("bigint")).alias("ng"),
        F.sum(
            (~F.col("lreject") & ~F.col("grej") & F.col("qfail")).cast("bigint")
        ).alias("nq"),
        F.sum(
            (
                ~F.col("lreject") & ~F.col("grej") & ~F.col("qfail") & F.col("dup")
            ).cast("bigint")
        ).alias("nd"),
        F.sum(
            (
                ~F.col("lreject")
                & ~F.col("grej")
                & ~F.col("qfail")
                & ~F.col("dup")
                & F.col("contam")
            ).cast("bigint")
        ).alias("nc"),
    )
    stage = lambda rank, name, n_in, n_rej: F.struct(  # noqa: E731
        F.lit(rank).cast("int").alias("stage_rank"),
        F.lit(name).alias("stage"),
        n_in.cast("bigint").alias("n_in"),
        n_rej.cast("bigint").alias("n_rejected"),
        (n_in - n_rej).cast("bigint").alias("n_out"),
    )
    n, nl, ng, nq, nd, nc = (F.col(x) for x in ("n", "nl", "ng", "nq", "nd", "nc"))
    return (
        c.select(
            F.explode(
                F.array(
                    stage(1, "langid", n, nl),
                    stage(2, "gopher", n - nl, ng),
                    stage(3, "quality", n - nl - ng, nq),
                    stage(4, "exact_dup", n - nl - ng - nq, nd),
                    stage(5, "contaminated", n - nl - ng - nq - nd, nc),
                )
            ).alias("s")
        )
        .select("s.*")
        .orderBy("stage_rank")
    )


# ---------------------------------------------------------------------------
# document-graph operators (functions/graph.py)
# ---------------------------------------------------------------------------


@query("ops_connected_components")
def ops_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over a deterministic synthesized doc graph:
    every node labeled with its component's MIN node id; edge-less nodes
    are singleton components.  The propagation engine is the SAME
    adaptive min-label machinery that resolves duplicate clusters
    (functions/dedup.py:duplicate_clusters — driver union-find for small
    edge sets, pointer-jumping O(log diameter) rounds above it), here
    exposed as a first-class graph operator.  The oracle is an
    independent recursive-CTE min-label closure, pruned to decreasing
    labels (functions/graph.py:CC_ORACLE_SQL)."""
    from ..functions import graph as G

    t = Tables(spark, sf_dir)
    docs = t.documents
    edges = G.synthesize_edges(docs)
    nodes = docs.select(F.col("doc_id").cast("bigint").alias("node"))
    return G.connected_components(nodes, edges).orderBy("node")


@query("ops_pagerank")
def ops_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank in exact ppm fixed point (5 synchronous rounds, damping
    85/100, integer DIV at every step — bit-identical across engines)
    over the same synthesized doc graph: the link-centrality primitive
    every public crawl pipeline ranks hosts by (Common Crawl publishes
    PageRank/harmonic host ranks) re-expressed as the canonical
    join+agg-per-round Spark loop (functions/graph.py:pagerank_ppm).
    The oracle replays the identical recurrence as chained CTEs."""
    from ..functions import graph as G

    t = Tables(spark, sf_dir)
    docs = t.documents
    edges = G.synthesize_edges(docs)
    nodes = docs.select(F.col("doc_id").cast("bigint").alias("node"))
    return G.pagerank_ppm(nodes, edges, iterations=5).orderBy("node")


from ..functions import graph as _G  # noqa: E402
from ..functions.graph import CC_ORACLE_SQL as _CC_SQL  # noqa: E402
from ..functions.graph import pagerank_oracle_sql as _pr_sql  # noqa: E402

ORACLE["ops_connected_components"] = _CC_SQL
ORACLE["ops_pagerank"] = _pr_sql(5)


# ---------------------------------------------------------------------------
# encoding repair / curriculum / duplication-aware reweighting
# ---------------------------------------------------------------------------


@query("ops_mojibake_detect")
def ops_mojibake_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mojibake audit — the encoding-repair screen (public
    form: the ftfy tool's core heuristic) every crawl pipeline runs:
    UTF-8 bytes decoded as Latin-1/cp1252 leave telltale two-byte
    sequences ('Ã¡' for á, 'â€™' for ’) that never occur in clean
    text.  The corpus is synthetic ASCII, so both sides first plant the
    SAME deterministic corruption (doc_id % 19 selects victims), then
    detect it by counting the telltales — the detection expression is
    what a real pipeline ships.  One codegen'd projection + one
    hash-agg; no Python, no second pass."""
    t = Tables(spark, sf_dir)
    did = F.col("doc_id")
    corrupted = (
        F.when(did % 19 == 0, F.regexp_replace(F.col("text"), "a", "Ã¡"))
        .when(did % 19 == 7, F.regexp_replace(F.col("text"), "e", "â€™"))
        .otherwise(F.col("text"))
    )
    hits = F.regexp_count(corrupted, F.lit("Ã¡|â€™")).cast("bigint")
    return (
        t.documents.select("source", hits.alias("n_hits"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n_hits") > 0).cast("bigint")).alias("n_mojibake_docs"),
            F.sum("n_hits").alias("total_hits"),
        )
        .orderBy("source")
    )


ORACLE["ops_mojibake_detect"] = """
    WITH c AS (
        SELECT source,
               CASE WHEN doc_id % 19 = 0 THEN replace(text, 'a', 'Ã¡')
                    WHEN doc_id % 19 = 7 THEN replace(text, 'e', 'â€™')
                    ELSE text END AS ctext
        FROM documents)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN len(regexp_extract_all(ctext, 'Ã¡|â€™')) > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_mojibake_docs,
           CAST(SUM(len(regexp_extract_all(ctext, 'Ã¡|â€™'))) AS BIGINT) AS total_hits
    FROM c GROUP BY source ORDER BY source
"""


@query("ops_curriculum_order")
def ops_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering (Bengio et al. 2009 applied to corpus
    scheduling): sort the corpus easy→hard by a difficulty proxy
    (token count), but deterministically shuffle WITHIN each difficulty
    decile so a training epoch doesn't see monotone length — intra-decile
    order via the md5 of the doc id (a hash is the only engine-portable
    'shuffle').  Output: the first 3 and last 3 docs of each decile —
    the band-boundary sample a curriculum audit inspects.

    Scale shape (both former windows eliminated):

    * deciles via ``operators.quantiles.ntile_exact`` — the distributed
      range-shuffle rank-selection form, bit-identical to the oracle's
      ``ntile(10) OVER (ORDER BY difficulty, doc_id)`` because the order
      is total (doc_id tie-break); no single-partition window sort;
    * head/tail-3 per decile via two-phase partial top-k — phase 1
      prunes each (decile, physical partition) group to its 3 smallest
      and 3 largest (hk, doc_id) rows through ranking windows over ONE
      (decile, pid) shuffle: window sorts are spillable external sorts,
      so per-task state is bounded everywhere (the former
      ``slice(array_sort(collect_list(...)))`` held the ENTIRE group in
      one aggregation buffer — O(rows of the decile within a range
      partition), which grows with the corpus at fixed partition count);
      the ≤3+3 survivors per group then merge in a decile-keyed hash-agg
      whose state is 6·P structs (the classic map-side top-k).  The
      former ``row_number() OVER (PARTITION BY decile)`` alternative
      would funnel corpus/10 rows through each of 10 window tasks.
    """
    t = Tables(spark, sf_dir)
    from pyspark.sql import Window as W

    from ..functions import text as XT
    from ..operators.quantiles import ntile_exact

    base = t.documents.select(
        "doc_id", XT.token_count(F.col("text")).alias("difficulty")
    )
    deciled = ntile_exact(
        base, 10, ["difficulty", "doc_id"], bucket_col="decile"
    )
    part = deciled.select(
        "decile",
        "doc_id",
        "difficulty",
        F.md5(F.col("doc_id").cast("string")).alias("hk"),
        F.spark_partition_id().alias("pid"),
    )
    wg = W.partitionBy("decile", "pid")
    # doc_id is unique, so (hk, doc_id) is a total order — identical
    # selection to sorting (hk, doc_id, difficulty) structs
    pruned = part.select(
        "decile",
        "pid",
        "hk",
        "doc_id",
        "difficulty",
        F.row_number().over(wg.orderBy("hk", "doc_id")).alias("_rlo"),
        F.row_number()
        .over(wg.orderBy(F.desc("hk"), F.desc("doc_id")))
        .alias("_rhi"),
        F.count(F.lit(1)).over(wg).alias("_cnt"),
    ).where((F.col("_rlo") <= 3) | (F.col("_rhi") <= 3))
    rec = F.struct(F.col("hk"), F.col("doc_id"), F.col("difficulty"))
    per_part = pruned.groupBy("decile", "pid").agg(
        F.slice(
            F.array_sort(F.collect_list(F.when(F.col("_rlo") <= 3, rec))), 1, 3
        ).alias("lo"),
        F.slice(
            F.reverse(
                F.array_sort(F.collect_list(F.when(F.col("_rhi") <= 3, rec)))
            ),
            1,
            3,
        ).alias("hi"),
        F.max("_cnt").alias("cnt"),
    )
    merged = per_part.groupBy("decile").agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("lo"))), 1, 3).alias("lo3"),
        # ascending slice of the global LAST 3: merge the per-partition
        # tails descending, cut to 3, flip back
        F.reverse(
            F.slice(F.reverse(F.array_sort(F.flatten(F.collect_list("hi")))), 1, 3)
        ).alias("hi3"),
        F.sum("cnt").alias("n"),
    )
    lo_rows = merged.select(
        "decile", F.posexplode("lo3").alias("idx", "r")
    ).select(
        "decile",
        (F.col("idx") + 1).alias("pos"),
        F.col("r.doc_id").alias("doc_id"),
        F.col("r.difficulty").alias("difficulty"),
    )
    hi_rows = (
        merged.select("decile", "n", F.size("hi3").alias("sz"),
                      F.posexplode("hi3").alias("idx", "r"))
        .select(
            "decile",
            (F.col("n") - F.col("sz") + F.col("idx") + 1).alias("pos"),
            F.col("r.doc_id").alias("doc_id"),
            F.col("r.difficulty").alias("difficulty"),
        )
        .where(F.col("pos") > 3)  # rows already emitted by the head slice
    )
    return (
        lo_rows.unionByName(hi_rows)
        .select("decile", F.col("pos").cast("int").alias("pos"), "doc_id", "difficulty")
        .orderBy("decile", "pos")
    )


ORACLE["ops_curriculum_order"] = r"""
    WITH d AS (
        SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS difficulty
        FROM documents),
    r AS (
        SELECT doc_id, difficulty,
               ntile(10) OVER (ORDER BY difficulty, doc_id) AS decile
        FROM d),
    p AS (
        SELECT decile, doc_id, difficulty,
               row_number() OVER (PARTITION BY decile ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pos,
               COUNT(*) OVER (PARTITION BY decile) AS n
        FROM r)
    SELECT decile, pos, doc_id, CAST(difficulty AS BIGINT) AS difficulty
    FROM p WHERE pos <= 3 OR pos > n - 3 ORDER BY decile, pos
"""


@query("ops_soft_dedup")
def ops_soft_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-aware sampling weights (SoftDeDup, He et al. ACL
    2024): instead of REMOVING duplicates, keep every copy but weight it
    1/n_copies so the cluster contributes one document's worth of
    gradient — the modern alternative to hard dedup when duplicates
    carry distribution signal.  weight_ppm = 1e6 DIV n_copies (exact
    integer, hash-stable); the per-source rollup reports effective size
    (Σ weights) vs raw size, i.e. how much the source shrinks under soft
    dedup.  ONE hash-agg on (md5) with map-side combine, then the
    cluster-size table joins back onto the corpus — strategy left to
    AQE: ``sizes`` has one row per DISTINCT text (corpus cardinality
    minus the duplicates), so a forced broadcast would cap the operator
    at the driver/broadcast limit; AQE broadcasts it at test scale and
    falls back to a shuffle hash join when the distinct-text table
    outgrows the threshold."""
    t = Tables(spark, sf_dir)
    # ONE md5 pass (r15): the cluster-size aggregate and the join-back
    # both consume the same (doc_id, source, h) projection — formerly
    # each re-hashed the full text.  Pinned lazily (guide §1.2); the
    # sizes aggregate materializes the 3-narrow-column frame.
    base = t.documents.select(
        "doc_id", "source", F.md5("text").alias("h")
    ).localCheckpoint(eager=False)
    sizes = base.groupBy("h").agg(F.count(F.lit(1)).alias("n_copies"))
    weighted = (
        base.join(sizes, "h")
        .select(
            "source",
            F.expr("CAST(1000000 DIV n_copies AS BIGINT)").alias("w_ppm"),
        )
    )
    return (
        weighted.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("w_ppm").alias("effective_ppm"),
        )
        .select(
            "source",
            "n_docs",
            "effective_ppm",
            F.expr("CAST(effective_ppm DIV n_docs AS BIGINT)").alias("mean_weight_ppm"),
        )
        .orderBy("source")
    )


ORACLE["ops_soft_dedup"] = """
    WITH s AS (
        SELECT md5(text) AS h, COUNT(*) AS n_copies
        FROM documents GROUP BY md5(text)),
    w AS (
        SELECT d.source, CAST(1000000 // s.n_copies AS BIGINT) AS w_ppm
        FROM documents d JOIN s ON md5(d.text) = s.h)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(w_ppm) AS BIGINT) AS effective_ppm,
           CAST(CAST(SUM(w_ppm) AS BIGINT) // COUNT(*) AS BIGINT) AS mean_weight_ppm
    FROM w GROUP BY source ORDER BY source
"""


@query("ops_cc_incremental")
def ops_cc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental connected components — crawl-N+1 maintenance of the
    component labeling (functions/graph.py:cc_fold_in): label the base
    half of the synthesized edge set from scratch, then FOLD IN the other
    half touching only the label table and the new batch (old edges never
    re-read; super-graph = one tiny component resolution per batch).
    Labels are component-min node ids, so the fold-in provably converges
    to the from-scratch labeling of the FULL graph — which is exactly
    what the oracle computes (the same recursive min-label closure as
    ops_connected_components), making the incremental path's equivalence
    the checked contract, not an implementation detail."""
    from ..functions import graph as G

    t = Tables(spark, sf_dir)
    docs = t.documents
    edges = G.synthesize_edges(docs)
    base = edges.where(F.col("src") % 2 == 0)
    increment = edges.where(F.col("src") % 2 == 1)
    nodes = docs.select(F.col("doc_id").cast("bigint").alias("node"))
    base_labels = G.connected_components(nodes, base)
    return G.cc_fold_in(base_labels, increment).orderBy("node")


ORACLE["ops_cc_incremental"] = _CC_SQL


@query("ops_graph_degrees")
def ops_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In/out/total degree DISTRIBUTION of the synthesized doc graph —
    the histogram every crawl-graph report leads with (Common Crawl's
    host-graph releases publish exactly these; the tail shape decides
    hub-skew strategy for every downstream join).  Zero-degree nodes
    included.  Output is histogram-sized: two edge aggs + two node-sized
    zero-fill joins + one agg per kind (functions/graph.py:
    degree_histogram); nothing node-sized ever reaches the driver."""
    from ..functions import graph as G

    t = Tables(spark, sf_dir)
    docs = t.documents
    edges = G.synthesize_edges(docs)
    nodes = docs.select(F.col("doc_id").cast("bigint").alias("node"))
    return G.degree_histogram(nodes, edges).orderBy("kind", "degree")


ORACLE["ops_graph_degrees"] = _G.DEGREES_ORACLE_SQL


@query("ops_graph_reciprocity")
def ops_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link reciprocity of the doc graph (share of directed edges whose
    reverse exists — the symmetry diagnostic that flags mirror/link-farm
    structure in a crawl; host graphs are normally highly asymmetric).
    The base grammar is acyclically chained so its reciprocity is 0;
    both engines plant the SAME deterministic reverse edges (every 7th
    chain link — functions/graph.py:synthesize_back_edges) so the
    metric is non-vacuous, then measure: one distinct + one reversed-key
    self semi-join (edge-sized shuffle) + two scalar aggs, exact ppm."""
    from ..functions import graph as G

    t = Tables(spark, sf_dir)
    edges = G.synthesize_back_edges(G.synthesize_edges(t.documents))
    return G.reciprocity(edges)


ORACLE["ops_graph_reciprocity"] = _G.RECIPROCITY_ORACLE_SQL


@query("ops_graph_triangles")
def ops_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-block triangle counts (the clustering-structure companion to
    the degree histogram; triangle density separates organic link
    neighborhoods from spam sprays).  Both engines add the SAME
    deterministic i→i+2 shortcuts (functions/graph.py:
    synthesize_shortcut_edges) so the chain grammar actually closes
    triangles, then count with the DEGREE-ORIENTED wedge join
    (functions/graph.py:triangle_counts): orient each undirected edge
    from the smaller (degree, id) endpoint, join wedges at the oriented
    source, semi-join the closing edge — O(m^1.5) candidates on ANY
    degree distribution, where a naive orientation squares the hottest
    hub.  The oracle replays the identical orientation."""
    from ..functions import graph as G

    t = Tables(spark, sf_dir)
    docs = t.documents
    edges = G.synthesize_edges(docs).unionAll(G.synthesize_shortcut_edges(docs))
    return G.triangle_counts(edges).orderBy("block")


ORACLE["ops_graph_triangles"] = _G.TRIANGLES_ORACLE_SQL


@query("ops_graph_kcore")
def ops_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the doc graph by synchronous peeling (12 declared
    rounds — functions/graph.py:kcore): drop degree-<2 nodes among
    survivors each round; the fixpoint is the k-core, the standard
    crawl-graph denoising that strips dangling chains/leaves before
    centrality or community steps.  The grammar's dangling stubs are
    ≤ ~9 nodes so 12 rounds provably stabilize (fixpoint asserted in
    tests/test_graph.py); the oracle unrolls the same peel as chained
    CTEs.  Per round: two alive semi-joins + one degree agg, edge-sized,
    lineage truncated per round."""
    from ..functions import graph as G

    t = Tables(spark, sf_dir)
    docs = t.documents
    edges = G.synthesize_edges(docs)
    nodes = docs.select(F.col("doc_id").cast("bigint").alias("node"))
    return G.kcore(nodes, edges, k=2, rounds=12).orderBy("node")


ORACLE["ops_graph_kcore"] = _G.kcore_oracle_sql(k=2, rounds=12)


@query("ops_pagerank_dangling")
def ops_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank with dangling-mass redistribution (exact ppm integer):
    the synthesized grammar has GENUINE sinks (chain-break nodes that
    are neither star nor long-range sources, e.g. doc_id 16), and real
    host graphs are full of them — the drop-the-mass simplification of
    ops_pagerank deflates every rank.  Each round adds ONE scalar agg
    over the sink-restricted ranks (node-sized semi-join) folded back as
    a single-row cross join — no driver round-trip in the loop
    (functions/graph.py:pagerank_ppm(dangling='redistribute')).  The
    oracle replays the identical recurrence with a per-round dangling
    CTE, MATERIALIZED against exponential CTE inlining."""
    from ..functions import graph as G

    t = Tables(spark, sf_dir)
    docs = t.documents
    edges = G.synthesize_edges(docs)
    nodes = docs.select(F.col("doc_id").cast("bigint").alias("node"))
    return G.pagerank_ppm(
        nodes, edges, iterations=5, dangling="redistribute"
    ).orderBy("node")


ORACLE["ops_pagerank_dangling"] = _G.pagerank_ext_oracle_sql(
    5, dangling="redistribute", seeded=False
)


@query("ops_pagerank_personalized")
def ops_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from the block-start hubs (the seeded-crawl
    form: rank pages by proximity to a trusted seed set instead of
    global centrality — the standard crawl-frontier policy when
    expanding from known-good hosts).  Teleport mass concentrates on
    the seeds ((150000·N) DIV |S| each, total mass preserved up to the
    floor) and dangling mass re-spreads over the seeds too, keeping the
    recurrence exact-integer.  Same per-round plan as
    ops_pagerank_dangling plus one loop-invariant seed-flag join
    (functions/graph.py:pagerank_ppm(seeds=...))."""
    from ..functions import graph as G

    t = Tables(spark, sf_dir)
    docs = t.documents
    edges = G.synthesize_edges(docs)
    nodes = docs.select(F.col("doc_id").cast("bigint").alias("node"))
    seeds = nodes.where(F.col("node") % 100 == 0)
    return G.pagerank_ppm(
        nodes, edges, iterations=5, dangling="redistribute", seeds=seeds
    ).orderBy("node")


ORACLE["ops_pagerank_personalized"] = _G.pagerank_ext_oracle_sql(
    5, dangling="redistribute", seeded=True
)


@query("ops_graph_clustering")
def ops_graph_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient over the shortcut-augmented
    doc graph (exact ppm: 1e6·2T(v) DIV (d(v)·(d(v)−1)), degree-≥2
    nodes) — the neighborhood-closure diagnostic published next to
    triangle counts for crawl host graphs: link farms have huge degree
    and near-zero closure, organic communities close.  Triangles come
    from the SAME degree-oriented enumeration as ops_graph_triangles
    (functions/graph.py:oriented_triangles — O(m^1.5) wedge candidates
    on any degree distribution), exploded to corners (3T rows,
    triangle-sized) and rolled up per node; the oracle replays the
    identical orientation and rollup."""
    from ..functions import graph as G

    t = Tables(spark, sf_dir)
    docs = t.documents
    edges = G.synthesize_edges(docs).unionAll(G.synthesize_shortcut_edges(docs))
    return G.clustering_coefficients(edges).orderBy("node")


ORACLE["ops_graph_clustering"] = _G.CLUSTERING_ORACLE_SQL


@query("ops_graph_component_sizes")
def ops_graph_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-size HISTOGRAM of the doc graph — (component_size,
    n_components), singletons included: the first thing a dedup or
    crawl-structure report states ('N clusters of size 2, M of size
    3…'), and the shape that decides whether cluster resolution needs
    the distributed path.  Two hash-aggs over ops_connected_components'
    labeling (size per component, then components per size) — output is
    histogram-sized.  Oracle: the recursive min-label closure rolled up
    twice."""
    from ..functions import graph as G

    t = Tables(spark, sf_dir)
    docs = t.documents
    edges = G.synthesize_edges(docs)
    nodes = docs.select(F.col("doc_id").cast("bigint").alias("node"))
    comp = G.connected_components(nodes, edges)
    return (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("sz"))
        .groupBy("sz")
        .agg(F.count(F.lit(1)).alias("n_components"))
        .select(
            F.col("sz").cast("bigint").alias("component_size"),
            F.col("n_components").cast("bigint"),
        )
        .orderBy("component_size")
    )


ORACLE["ops_graph_component_sizes"] = _G.COMPONENT_SIZES_ORACLE_SQL


# ---------------------------------------------------------------------------
# sequence packing (operators/prefix.py): the training-batch assembly step
# ---------------------------------------------------------------------------

_PACK_CTX = 2048  # context window (tokens) — GPT-style concat-and-chunk


def _pack_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, tok, sp, w0, w1): each doc's global token offset under
    concat-and-chunk packing in doc_id order — sp = exclusive prefix sum
    of token counts (operators/prefix.py:running_total — range shuffle +
    driver offsets + per-physical-partition parallel windows, NO
    single-partition scan), w0/w1 = first/last context window the doc
    touches."""
    from ..operators.prefix import running_total

    t = Tables(spark, sf_dir)
    d = t.documents.select("doc_id", X.token_count(F.col("text")).alias("tok"))
    s = running_total(d, "tok", ["doc_id"], out_col="sp", exclusive=True)
    return s.select(
        "doc_id",
        "tok",
        "sp",
        F.expr(f"sp DIV {_PACK_CTX}").alias("w0"),
        F.expr(
            f"CASE WHEN tok > 0 THEN (sp + tok - 1) DIV {_PACK_CTX}"
            f" ELSE sp DIV {_PACK_CTX} END"
        ).alias("w1"),
    )


@query("ops_sequence_pack")
def ops_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing audit, the summary row: GPT-style
    concat-and-chunk packs the token stream (docs concatenated in
    doc_id order) into fixed 2048-token context windows — THE
    training-batch assembly step after curation.  Reports corpus size,
    window count, how many docs straddle a window boundary (the
    cross-doc-attention contamination a masking strategy must handle),
    and the tail padding waste in ppm — all exact integers.  The global
    token offset per doc is the distributed prefix scan
    (operators/prefix.py): one range shuffle + K driver offsets +
    per-partition parallel windows; the oracle uses the window spelling
    (SUM OVER ORDER BY) — same numbers, antagonistic plan."""
    b = _pack_spans(spark, sf_dir)
    C = _PACK_CTX
    return b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("tok").cast("bigint").alias("total_tokens"),
        F.expr(f"CAST((sum(tok) + {C - 1}) DIV {C} AS BIGINT)").alias("n_windows"),
        F.sum((F.col("w1") > F.col("w0")).cast("bigint")).alias("n_boundary_docs"),
        # greatest(..., 1): a zero-token corpus has 0 windows — Spark DIV 0
        # yields NULL where the DuckDB oracle's // 0 raises (parity break);
        # both sides guard identically (no-op whenever total_tokens > 0)
        F.expr(
            f"CAST(1000000 * ({C} * ((sum(tok) + {C - 1}) DIV {C}) - sum(tok))"
            f" DIV greatest({C} * ((sum(tok) + {C - 1}) DIV {C}), 1) AS BIGINT)"
        ).alias("tail_waste_ppm"),
    )


ORACLE["ops_sequence_pack"] = rf"""
    WITH d AS (
        SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS tok FROM documents),
    s AS (
        SELECT doc_id, tok,
               COALESCE(SUM(tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sp
        FROM d),
    b AS (
        SELECT doc_id, tok, sp, sp // {_PACK_CTX} AS w0,
               CASE WHEN tok > 0 THEN (sp + tok - 1) // {_PACK_CTX}
                    ELSE sp // {_PACK_CTX} END AS w1
        FROM s)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS total_tokens,
           CAST((SUM(tok) + {_PACK_CTX - 1}) // {_PACK_CTX} AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN w1 > w0 THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs,
           CAST(1000000 * ({_PACK_CTX} * ((SUM(tok) + {_PACK_CTX - 1}) // {_PACK_CTX}) - SUM(tok))
                // greatest({_PACK_CTX} * ((SUM(tok) + {_PACK_CTX - 1}) // {_PACK_CTX}), 1) AS BIGINT) AS tail_waste_ppm
    FROM b
"""


@query("ops_sequence_pack_windows")
def ops_sequence_pack_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing audit, the docs-per-window HISTOGRAM:
    (docs_per_window, n_windows) — how many context windows contain 1,
    2, 3… document (fragments).  The shape a masking/attention-isolation
    decision is made from (mostly-1 means long docs dominate and
    cross-doc attention is rare; a heavy tail means the packer mixes
    many short docs per window).  Each doc explodes to the windows it
    touches (span-sized: Σ(tok DIV ctx + 1) rows, output-proportional),
    then two hash-aggs.  Same distributed prefix scan as
    ops_sequence_pack; oracle unnests generate_series over the window
    form."""
    b = _pack_spans(spark, sf_dir)
    per_w = (
        b.select(F.explode(F.sequence("w0", "w1")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return (
        per_w.groupBy("n_docs")
        .agg(F.count(F.lit(1)).alias("n_windows"))
        .select(
            F.col("n_docs").cast("bigint").alias("docs_per_window"),
            F.col("n_windows").cast("bigint"),
        )
        .orderBy("docs_per_window")
    )


ORACLE["ops_sequence_pack_windows"] = rf"""
    WITH d AS (
        SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS tok FROM documents),
    s AS (
        SELECT doc_id, tok,
               COALESCE(SUM(tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sp
        FROM d),
    b AS (
        -- CAST: DuckDB's windowed SUM yields HUGEINT and generate_series
        -- binds only BIGINT
        SELECT doc_id, tok, sp, CAST(sp // {_PACK_CTX} AS BIGINT) AS w0,
               CAST(CASE WHEN tok > 0 THEN (sp + tok - 1) // {_PACK_CTX}
                    ELSE sp // {_PACK_CTX} END AS BIGINT) AS w1
        FROM s),
    per_w AS (
        SELECT unnest(generate_series(w0, w1)) AS w FROM b),
    pc AS (SELECT w, COUNT(*) AS n_docs FROM per_w GROUP BY w)
    SELECT CAST(n_docs AS BIGINT) AS docs_per_window,
           CAST(COUNT(*) AS BIGINT) AS n_windows
    FROM pc GROUP BY n_docs ORDER BY docs_per_window
"""


@query("ops_graph_harmonic")
def ops_graph_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated harmonic centrality (radius 6) over the doc graph —
    the OTHER centrality Common Crawl publishes for its host graph
    (harmonic ranks beside PageRank), in the exact within-k-hops form:
    harmonic_ppm(v) = Σ over sources u within 6 directed hops of
    1e6 DIV d(u→v), plus the reacher count.  Five rounds of frontier
    expansion, each ONE edge-join + ONE (u,v) min hash-agg over a
    ball-bounded distance table (O(N·|ball|) rows, never N²); the
    full-radius form at unbounded scale is HyperANF (per-node HLL
    sketches via hll_sketch_agg/hll_union_agg), approximate by
    construction and therefore not hash-declarable — documented in
    functions/graph.py:harmonic_truncated."""
    from ..functions import graph as G

    t = Tables(spark, sf_dir)
    edges = G.synthesize_edges(t.documents)
    return G.harmonic_truncated(edges, radius=6).orderBy("node")


ORACLE["ops_graph_harmonic"] = _G.harmonic_oracle_sql(6)
