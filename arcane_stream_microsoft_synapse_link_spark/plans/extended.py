"""Extended declared queries Q26+: streaming windows as batch queries,
pivot, exact percentiles, statistical aggregates, date arithmetic, term
frequencies, regexp surface.

The window queries exercise the engine's Structured-Streaming window
operators (`F.window`, `F.session_window` — SURVEY.md §2.E extension
surface) in batch mode, oracle-checked against equivalent DuckDB SQL
(tumbling = date_trunc buckets, sliding = union of shifted buckets,
session = gaps-and-islands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..functions import text as X
from .oracle import ORACLE
from .queries import DEC, QUERIES, _cents100, _fixed_money, query


@query("q26_tumbling_window")
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window agg (F.window — the streaming windowed-agg
    operator in batch mode; epoch-aligned, equals date_trunc buckets)."""
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour"))
        # exact sum in bigint-cents fixed point (same rational value as the
        # decimal cast, long arithmetic per row — plans/queries.py:_fixed_money),
        # emitted as double: DECIMAL output types never hash-match across engines
        .agg(
            F.count("*").alias("cnt"),
            _fixed_money(
                F.sum(_cents100("value").cast("decimal(20,0)")), 2, round2=False
            ).alias("sum_val"),
        )
        .select(F.col("window.start").alias("ws"), "cnt", "sum_val")
        .orderBy("ws")
    )


ORACLE["q26_tumbling_window"] = """
    SELECT date_trunc('hour', ts) AS ws, COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
    FROM events GROUP BY 1 ORDER BY ws
"""


@query("q27_sliding_window")
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (2h span / 1h slide): every event lands in 2 buckets."""
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("window.start").alias("ws"), "cnt")
        .orderBy("ws")
    )


ORACLE["q27_sliding_window"] = """
    SELECT ws, COUNT(*) AS cnt FROM (
        SELECT date_trunc('hour', ts) AS ws FROM events
        UNION ALL
        SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR FROM events
    ) GROUP BY ws ORDER BY ws
"""


@query("q28_session_window")
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30 min gap) per user — the stateful streaming
    operator in batch mode; oracle = gaps-and-islands SQL."""
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("cnt"),
            _fixed_money(
                F.sum(_cents100("value").cast("decimal(20,0)")), 2, round2=False
            ).alias("sum_val"),
        )
        .select("user_id", F.col("session_window.start").alias("session_start"), "cnt", "sum_val")
        .orderBy("user_id", "session_start")
    )


ORACLE["q28_session_window"] = """
    WITH o AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
        SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess
        FROM o
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
    FROM s GROUP BY user_id, sess
    ORDER BY user_id, session_start
"""


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query("q29_pivot")
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event-type counts (explicit value list → static
    schema, the scale-safe pivot form — no driver-side distinct scan)."""
    t = Tables(spark, sf_dir)
    out = (
        t.events.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
    )
    return out.select(
        "user_id", *[F.col(c).cast("bigint").alias(f"n_{c}") for c in _EVENT_TYPES]
    ).orderBy("user_id")


ORACLE["q29_pivot"] = """
    SELECT user_id,
           COUNT(*) FILTER (event_type = 'click')    AS n_click,
           COUNT(*) FILTER (event_type = 'error')    AS n_error,
           COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
           COUNT(*) FILTER (event_type = 'view')     AS n_view
    FROM events GROUP BY user_id ORDER BY user_id
"""


@query("q30_exact_percentiles")
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (sort-based, interpolated) percentiles — deterministic, unlike
    percentile_approx which is tolerance-checked separately.

    r14: computed by the distributed rank-selection operator
    (operators/quantiles.py:exact_percentiles — one bounded-memory range
    shuffle + K driver offsets) instead of the ``percentile`` builtin,
    whose aggregate merges a buffer of EVERY value on one reducer: fine
    below ~1e8 rows, a guaranteed driver-of-the-plan failure at the
    declared 100 TB lineitem.  Measured at sf0.1 the builtin's
    single-reducer merge was also the slower local plan (3.1 s vs ~1.2).
    The ``cont`` interpolation is bit-identical to DuckDB quantile_cont
    (verified; and at these fractions every interpolation fraction is a
    multiple of 0.25 on round(price*100)*4, so the value is an
    exact-integer double in both engines regardless of formula).

    Output in quarter-cents (BIGINT), one row — the three driver-side
    interpolated scalars re-emitted as literals (the operator already
    returns driver-computed (p, value) literals; this is the same
    metadata-sized collection)."""
    from ..operators.quantiles import exact_percentiles

    t = Tables(spark, sf_dir)
    # RINT not ROUND: same exact quarter-cents (see _cents100), no
    # per-row BigDecimal in the corpus-wide scan feeding the selection
    qc = (F.expr("RINT(l_extendedprice * 100)") * 4).alias("qc")
    rows = {
        r["p"]: r["value"]
        for r in exact_percentiles(
            t.lineitem.select(qc), "qc", [0.25, 0.5, 0.75], interpolation="cont"
        ).collect()
    }
    return spark.range(1).select(
        F.lit(rows[0.25]).cast("bigint").alias("p25_qc"),
        F.lit(rows[0.5]).cast("bigint").alias("p50_qc"),
        F.lit(rows[0.75]).cast("bigint").alias("p75_qc"),
    )


ORACLE["q30_exact_percentiles"] = """
    SELECT CAST(quantile_cont(ROUND(l_extendedprice * 100) * 4, 0.25) AS BIGINT) AS p25_qc,
           CAST(quantile_cont(ROUND(l_extendedprice * 100) * 4, 0.50) AS BIGINT) AS p50_qc,
           CAST(quantile_cont(ROUND(l_extendedprice * 100) * 4, 0.75) AS BIGINT) AS p75_qc
    FROM lineitem
"""


@query("q31_stats_aggs")
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per group, computed contract-stably.

    Native ``stddev_samp``/``corr`` accumulate doubles in engine- and
    partition-order, and Spark's ROUND-on-double rounds the shortest
    string repr while DuckDB rounds the binary value — so hashing their
    rounded output is corpus-lucky (ADVICE r3).  Instead: accumulate the
    exact DECIMAL moment sums (the source doubles are exact 2-decimal
    values, so the interior cast is lossless and order-independent), then
    derive sd/var/corr/avg with one identical chain of IEEE double ops in
    both engines — bit-equal without any rounding policy.

    Fixed-point extraction (``floor(v*100 + 0.5)`` — source values carry 2
    decimals, so never near a .5 boundary) makes every moment an exact
    integer; products are kept inside DECIMAL(38,0) via explicit operand
    precisions (p1+p2 <= 38, exact to ~sf100; both engines then subtract
    exactly).  A one-ulp FMA-contraction difference in ``a*b - c*d`` double
    shapes was observed between Spark and DuckDB, so NO double subtraction
    appears anywhere — only cast/sqrt/multiply/divide, each IEEE
    correctly-rounded, hence bit-equal.
    """
    t = Tables(spark, sf_dir)

    def fix(col: str) -> F.Column:
        return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("bigint")

    qi, yi, di = fix("l_quantity"), fix("l_extendedprice"), fix("l_discount")
    g = t.lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qi).alias("sx"),
        F.sum((qi * qi).cast("decimal(26,0)")).alias("sxx"),
        F.sum(yi).alias("sy"),
        F.sum((yi * yi).cast("decimal(26,0)")).alias("syy"),
        F.sum((qi * yi).cast("decimal(26,0)")).alias("sxy"),
        F.sum(di).alias("sdisc"),
    )
    n12 = F.col("n").cast("decimal(12,0)")
    vx = (n12 * F.col("sxx").cast("decimal(26,0)")
          - F.col("sx").cast("decimal(16,0)") * F.col("sx").cast("decimal(22,0)"))
    vy = (n12 * F.col("syy").cast("decimal(26,0)")
          - F.col("sy").cast("decimal(16,0)") * F.col("sy").cast("decimal(22,0)"))
    cov = (n12 * F.col("sxy").cast("decimal(26,0)")
           - F.col("sx").cast("decimal(16,0)") * F.col("sy").cast("decimal(22,0)"))
    nn1 = (n12 * (n12 - F.lit(1))).cast("double")
    vx_d, vy_d, cov_d = vx.cast("double"), vy.cast("double"), cov.cast("double")
    var = vx_d / nn1 / F.lit(1.0e4)
    return (
        g.select(
            "l_returnflag",
            F.sqrt(var).alias("sd_qty"),
            var.alias("var_qty"),
            (cov_d / (F.sqrt(vx_d) * F.sqrt(vy_d))).alias("corr_qp"),
            (F.col("sdisc").cast("double") / F.col("n").cast("double")
             / F.lit(1.0e2)).alias("avg_disc"),
        )
        .orderBy("l_returnflag")
    )


ORACLE["q31_stats_aggs"] = """
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS sx,
               SUM(CAST(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)
                        * CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)
                        AS DECIMAL(26,0))) AS sxx,
               SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS sy,
               SUM(CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                        * CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                        AS DECIMAL(26,0))) AS syy,
               SUM(CAST(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)
                        * CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                        AS DECIMAL(26,0))) AS sxy,
               SUM(CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) AS sdisc
        FROM lineitem GROUP BY l_returnflag
    ), d AS (
        SELECT l_returnflag, n,
               CAST(CAST(n AS DECIMAL(12,0)) * CAST(sxx AS DECIMAL(26,0))
                    - CAST(sx AS DECIMAL(16,0)) * CAST(sx AS DECIMAL(22,0))
                    AS DOUBLE) AS vx,
               CAST(CAST(n AS DECIMAL(12,0)) * CAST(syy AS DECIMAL(26,0))
                    - CAST(sy AS DECIMAL(16,0)) * CAST(sy AS DECIMAL(22,0))
                    AS DOUBLE) AS vy,
               CAST(CAST(n AS DECIMAL(12,0)) * CAST(sxy AS DECIMAL(26,0))
                    - CAST(sx AS DECIMAL(16,0)) * CAST(sy AS DECIMAL(22,0))
                    AS DOUBLE) AS cov,
               CAST(CAST(n AS DECIMAL(12,0)) * (CAST(n AS DECIMAL(12,0)) - 1)
                    AS DOUBLE) AS nn1,
               sdisc
        FROM m
    )
    SELECT l_returnflag,
           SQRT(vx / nn1 / 1e4) AS sd_qty,
           vx / nn1 / 1e4 AS var_qty,
           cov / (SQRT(vx) * SQRT(vy)) AS corr_qp,
           CAST(sdisc AS DOUBLE) / CAST(n AS DOUBLE) / 1e2 AS avg_disc
    FROM d ORDER BY l_returnflag
"""


@query("q32_date_arith")
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.select(
            "o_orderkey",
            F.date_add("o_orderdate", 30).alias("due"),
            F.datediff(F.lit("1998-12-01").cast("date"), F.col("o_orderdate"))
            .cast("bigint")
            .alias("age_days"),
            F.last_day("o_orderdate").alias("eom"),
            F.dayofweek("o_orderdate").cast("bigint").alias("dow"),
            F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


# DuckDB dayofweek is 0=Sunday; Spark is 1=Sunday → +1 (per-engine mapping)
ORACLE["q32_date_arith"] = """
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due,
           datediff('day', o_orderdate, DATE '1998-12-01') AS age_days,
           last_day(o_orderdate) AS eom,
           dayofweek(o_orderdate) + 1 AS dow,
           quarter(o_orderdate) AS qtr
    FROM orders ORDER BY o_orderkey LIMIT 500
"""


@query("q33_top_terms")
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency: explode words → count → global top 100.
    Partial aggregation collapses counts map-side before the shuffle."""
    t = Tables(spark, sf_dir)
    return (
        t.documents.select(
            F.explode(F.regexp_extract_all(F.lower("text"), F.lit(X.WORD_RE), 0)).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(100)
    )


ORACLE["q33_top_terms"] = """
    SELECT word, COUNT(*) AS cnt FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
        FROM documents
    ) GROUP BY word ORDER BY cnt DESC, word LIMIT 100
"""


@query("q34_quality_score")
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality heuristic, oracle-checked end to end.

    Emitted as FLOOR(score·1e6) parts-per-million: the score mixes exact
    binary fractions (x/64 terms) whose decimal form ends in 5, where
    Spark's HALF_UP and DuckDB's rounding disagree — floor has no tie."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.floor(X.quality_score(F.col("text")) * 1e6).cast("bigint").alias("quality_ppm"),
    ).orderBy("doc_id")


ORACLE["q34_quality_score"] = r"""
    WITH c AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS toks,
               CAST(len(regexp_extract_all(lower(text),
                    '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS DOUBLE) AS stops,
               CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) AS puncts,
               CAST(GREATEST(length(text), 1) AS DOUBLE) AS chars
        FROM documents
    )
    SELECT doc_id,
           CAST(FLOOR((
               0.5 * LEAST(toks / 64.0, 1.0)
             + 0.3 * LEAST(stops / GREATEST(toks, 1.0) * 5.0, 1.0)
             + 0.2 * (1.0 - LEAST(puncts / chars * 10.0, 1.0))) * 1e6) AS BIGINT) AS quality_ppm
    FROM c ORDER BY doc_id
"""


@query("q35_null_funcs")
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLIF / COALESCE / NVL2-style conditional null handling."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.select(
            "l_orderkey",
            "l_linenumber",
            F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc_or_null"),
            F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias("rf"),
            F.greatest("l_tax", "l_discount").alias("gmax"),
            F.least("l_tax", "l_discount").alias("gmin"),
        )
        # (l_orderkey, l_linenumber) is NOT unique in the corpus — total sort
        .orderBy(
            "l_orderkey",
            "l_linenumber",
            F.asc_nulls_last("disc_or_null"),
            "rf",
            "gmax",
            "gmin",
        )
        .limit(500)
    )


ORACLE["q35_null_funcs"] = """
    SELECT l_orderkey, l_linenumber,
           NULLIF(l_discount, 0.0) AS disc_or_null,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS rf,
           GREATEST(l_tax, l_discount) AS gmax,
           LEAST(l_tax, l_discount) AS gmin
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber, disc_or_null NULLS LAST, rf, gmax, gmin
    LIMIT 500
"""


@query("q36_regexp")
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.part.select(
            "p_partkey",
            F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
            F.regexp_replace("p_type", r"[aeiou]", "_").alias("devowel"),
            F.col("p_name").rlike("red").alias("has_red"),
        )
        .orderBy("p_partkey")
        .limit(500)
    )


ORACLE["q36_regexp"] = r"""
    SELECT p_partkey,
           regexp_extract(p_name, '^(\w+)', 1) AS first_word,
           regexp_replace(p_type, '[aeiou]', '_', 'g') AS devowel,
           regexp_matches(p_name, 'red') AS has_red
    FROM part ORDER BY p_partkey LIMIT 500
"""


@query("q37_window_funcs")
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking/distribution window functions: ntile, percent_rank,
    cume_dist, first/last/nth value with explicit full frames (the default
    running frame differs between engines for last_value)."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    order = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    w = W.partitionBy("o_custkey").orderBy(*order)
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        t.orders.select(
            "o_orderkey",
            "o_custkey",
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            # raw doubles: both engines compute (rank-1)/(n-1) resp. rows/n
            # over identical operands — bit-equal, no rounding policy needed
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.first("o_orderkey").over(wf).alias("top_order"),
            F.last("o_orderkey").over(wf).alias("bottom_order"),
            F.nth_value("o_orderkey", 2).over(wf).alias("second_order"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


ORACLE["q37_window_funcs"] = """
    SELECT o_orderkey, o_custkey,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           FIRST_VALUE(o_orderkey) OVER wf AS top_order,
           LAST_VALUE(o_orderkey) OVER wf AS bottom_order,
           NTH_VALUE(o_orderkey, 2) OVER wf AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
           wf AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_orderkey LIMIT 500
"""


@query("q38_array_hof")
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over embeddings (size/filter/element
    access/max), float outputs floor-quantized to ppm — exact element-wise
    ops only, no cross-engine float reduction."""
    t = Tables(spark, sf_dir)
    e = F.col("embedding")

    def ppm(x):
        return F.floor(x.cast("double") * 1e6).cast("bigint")

    return (
        t.embeddings.select(
            "vec_id",
            F.size(e).cast("bigint").alias("dim"),
            F.size(F.filter(e, lambda x: x > 0)).cast("bigint").alias("n_pos"),
            ppm(F.array_max(e)).alias("max_ppm"),
            ppm(F.element_at(e, 1)).alias("e0_ppm"),
            ppm(F.element_at(e, -1)).alias("elast_ppm"),
        )
        .orderBy("vec_id")
        .limit(2000)
    )


ORACLE["q38_array_hof"] = """
    SELECT vec_id,
           len(embedding) AS dim,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           CAST(FLOOR(CAST(list_max(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS max_ppm,
           CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT) AS e0_ppm,
           CAST(FLOOR(CAST(embedding[-1] AS DOUBLE) * 1e6) AS BIGINT) AS elast_ppm
    FROM embeddings ORDER BY vec_id LIMIT 2000
"""


@query("q39_collect_sorted")
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-collecting aggregation surfaced as a deterministic string
    (sorted distinct event types per user)."""
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy("user_id")
        .agg(
            F.count_distinct("event_type").cast("bigint").alias("n_types"),
            F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("types_csv"),
        )
        .orderBy("user_id")
    )


ORACLE["q39_collect_sorted"] = """
    SELECT user_id, COUNT(DISTINCT event_type) AS n_types,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv
    FROM events GROUP BY user_id ORDER BY user_id
"""


@query("q40_cond_agg")
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / boolean aggregates: count_if, filtered sums,
    bool_and/bool_or."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.count_if(F.col("l_quantity") > 25).cast("bigint").alias("n_bulk"),
            _fixed_money(
                F.sum(
                    F.when(
                        F.col("l_discount") > 0.05,
                        _cents100("l_quantity").cast("decimal(20,0)"),
                    )
                ),
                2,
                round2=False,
            ).alias("qty_hidisc"),
            F.bool_and(F.col("l_quantity") > 0).alias("all_pos"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_disc"),
        )
        .orderBy("l_returnflag")
    )


ORACLE["q40_cond_agg"] = """
    SELECT l_returnflag,
           COUNT(*) FILTER (l_quantity > 25) AS n_bulk,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_discount > 0.05) AS DOUBLE) AS qty_hidisc,
           bool_and(l_quantity > 0) AS all_pos,
           bool_or(l_discount > 0.09) AS any_deep_disc
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query("q41_unpivot")
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide measure columns to long (var, val) rows."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").alias("qty"),
            F.col("l_discount").alias("disc"),
            F.col("l_tax").alias("tax"),
        )
        .unpivot(["l_orderkey", "l_linenumber"], ["qty", "disc", "tax"], "var", "val")
        # (l_orderkey, l_linenumber) is NOT unique in the corpus — include
        # val so ties order identically in both engines
        .orderBy("l_orderkey", "l_linenumber", "var", "val")
        .limit(600)
    )


ORACLE["q41_unpivot"] = """
    SELECT l_orderkey, l_linenumber, var, val FROM (
        SELECT l_orderkey, l_linenumber, l_quantity AS qty, l_discount AS disc,
               l_tax AS tax FROM lineitem)
    UNPIVOT (val FOR var IN (qty, disc, tax))
    ORDER BY l_orderkey, l_linenumber, var, val LIMIT 600
"""


@query("q42_recursive_spine")
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE date spine + gap-filling left join (the continuous-
    aggregate/time-series-densify pattern). Spark 4 WITH RECURSIVE; the
    spine is tiny (days), the fact side aggregates BEFORE the join."""
    t = Tables(spark, sf_dir)
    t.view("events")
    return spark.sql("""
        WITH RECURSIVE spine(d) AS (
            SELECT DATE '2023-12-30'
            UNION ALL SELECT d + INTERVAL '1' DAY FROM spine WHERE d < DATE '2024-02-02'
        ),
        daily AS (
            SELECT CAST(ts AS DATE) AS d, COUNT(*) AS cnt FROM events GROUP BY 1
        )
        SELECT CAST(spine.d AS DATE) AS d, CAST(COALESCE(daily.cnt, 0) AS BIGINT) AS cnt
        FROM spine LEFT JOIN daily ON spine.d = daily.d
        ORDER BY d
    """)


# per-engine SQL (interval literal spelling differs); values hash-match
ORACLE["q42_recursive_spine"] = """
    WITH RECURSIVE spine(d) AS (
        SELECT DATE '2023-12-30'
        UNION ALL SELECT d + INTERVAL 1 DAY FROM spine WHERE d < DATE '2024-02-02'
    ),
    daily AS (
        SELECT CAST(ts AS DATE) AS d, COUNT(*) AS cnt FROM events GROUP BY 1
    )
    SELECT CAST(spine.d AS DATE) AS d, COALESCE(daily.cnt, 0) AS cnt
    FROM spine LEFT JOIN daily ON spine.d = daily.d
    ORDER BY d
"""


@query("q43_set_ops_all")
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set ops (EXCEPT ALL / INTERSECT ALL keep duplicates)."""
    t = Tables(spark, sf_dir)
    cust = t.customer.select(F.col("c_nationkey").alias("k"))
    supp = t.supplier.select(F.col("s_nationkey").alias("k"))
    ex = cust.exceptAll(supp).groupBy("k").agg(F.count("*").alias("n_except"))
    inter = cust.intersectAll(supp).groupBy("k").agg(F.count("*").alias("n_intersect"))
    return (
        ex.join(inter, "k", "full")
        .select(
            "k",
            F.coalesce("n_except", F.lit(0)).cast("bigint").alias("n_except"),
            F.coalesce("n_intersect", F.lit(0)).cast("bigint").alias("n_intersect"),
        )
        .orderBy("k")
    )


ORACLE["q43_set_ops_all"] = """
    WITH ex AS (
        SELECT k, COUNT(*) AS n_except FROM (
            SELECT c_nationkey AS k FROM customer
            EXCEPT ALL SELECT s_nationkey FROM supplier) GROUP BY k),
    inter AS (
        SELECT k, COUNT(*) AS n_intersect FROM (
            SELECT c_nationkey AS k FROM customer
            INTERSECT ALL SELECT s_nationkey FROM supplier) GROUP BY k)
    SELECT COALESCE(ex.k, inter.k) AS k,
           COALESCE(n_except, 0) AS n_except,
           COALESCE(n_intersect, 0) AS n_intersect
    FROM ex FULL JOIN inter ON ex.k = inter.k
    ORDER BY k
"""


@query("q44_range_frame_interval")
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: trailing 1-hour running sum/count per
    user (peers at equal ts share the frame — deterministic under ties)."""
    t = Tables(spark, sf_dir)
    t.view("events")
    return spark.sql("""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trail_sum,
               CAST(COUNT(*) OVER w AS BIGINT) AS trail_cnt
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id LIMIT 1000
    """)


ORACLE["q44_range_frame_interval"] = """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trail_sum,
           CAST(COUNT(*) OVER w AS BIGINT) AS trail_cnt
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id LIMIT 1000
"""


@query("q45_lateral_explode")
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array UNNEST / lateral explode with ordinality: flatten embedding
    vectors to (vec_id, pos, value) rows — the Generate operator that
    underlies every tokenize/n-gram/vector-flatten step. posexplode runs
    inside whole-stage codegen with no shuffle; values floor-ppm-quantized
    (exact on the shared float32 → double widening) for cross-engine
    hashing. DuckDB twin zips unnest + generate_subscripts."""
    t = Tables(spark, sf_dir)
    return (
        t.embeddings.filter(F.col("vec_id") <= 100)
        .select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select(
            "vec_id",
            F.col("pos").cast("bigint").alias("pos"),
            F.floor(F.col("val").cast("double") * 1e6).cast("bigint").alias("val_ppm"),
        )
        .orderBy("vec_id", "pos")
    )


ORACLE["q45_lateral_explode"] = """
    SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
           CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS val_ppm
    FROM embeddings WHERE vec_id <= 100
    ORDER BY vec_id, pos
"""


@query("q46_lateral_join_topk")
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join: top-priced order per customer via a
    per-row subquery with ORDER BY + LIMIT (SQL:2016 LATERAL; Spark plans
    it as a rewritten join, not a per-row loop — same result as the
    window top-k but expressed relationally)."""
    t = Tables(spark, sf_dir)
    t.view("customer")
    t.view("orders")
    return spark.sql("""
        SELECT c_custkey, l.o_orderkey, l.o_totalprice AS top_price
        FROM customer,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) l
        ORDER BY c_custkey LIMIT 500
    """)


ORACLE["q46_lateral_join_topk"] = """
    SELECT c_custkey, l.o_orderkey, l.o_totalprice AS top_price
    FROM customer,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) l
    ORDER BY c_custkey LIMIT 500
"""


@query("q47_variant_json")
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse_json once into a
    VARIANT value, then typed variant_get extraction — the
    shred-at-read model for JSON event properties (vs q24's per-path
    string get_json_object). Oracle is DuckDB's native JSON extraction."""
    t = Tables(spark, sf_dir)
    # parse_json ONCE in its own projection, extract both paths from the
    # same VARIANT value — inlining the parse per variant_get doubles the
    # JSON-parse cost per row (CollapseProject keeps the split because
    # parse_json is non-cheap and multiply-referenced)
    ev = t.events.select("event_id", "props")
    # a single small parquet file scans as ONE task, serializing the
    # parse; re-split only then (a many-file scan at real scale already
    # has file-level parallelism and must not pay this shuffle)
    if ev.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism // 2:
        ev = ev.repartition(spark.sparkContext.defaultParallelism)
    return (
        ev.select("event_id", F.parse_json("props").alias("v"))
        .select(
            "event_id",
            F.variant_get("v", "$.k", "bigint").alias("k"),
            F.variant_get("v", "$.tag", "string").alias("tag"),
        )
        .orderBy("event_id")
        .limit(500)
    )


ORACLE["q47_variant_json"] = """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           json_extract_string(props, '$.tag') AS tag
    FROM events ORDER BY event_id LIMIT 500
"""


@query("q48_locf_gap_fill")
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF (last observation carried forward): per user, carry the most
    recent non-'click' event type forward over click rows —
    ``last(ignorenulls=True)`` over an unbounded-preceding frame, the
    canonical sparse-to-dense time-series fill. Per-engine spelling:
    Spark puts IGNORE NULLS after the function, DuckDB inside the
    argument list; values hash-match."""
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sparse = F.when(F.col("event_type") != "click", F.col("event_type"))
    return (
        t.events.select(
            "event_id",
            "user_id",
            F.last(sparse, ignorenulls=True).over(w).alias("locf_type"),
        )
        .orderBy("user_id", "event_id")
        .limit(500)
    )


ORACLE["q48_locf_gap_fill"] = """
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type <> 'click' THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_type
    FROM events ORDER BY user_id, event_id LIMIT 500
"""


@query("q49_ntile_deciles")
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE decile assignment + per-decile profile — WITHOUT the window:
    ``ntile(10) OVER (ORDER BY ...)`` plans as a single-partition sort
    (one task orders every order row; dead at 100×), so the declared
    plan is ``operators.quantiles.ntile_exact`` — a balanced range
    shuffle + per-partition offsets + a closed-form bucket projection,
    bit-identical to the window form because the ORDER BY is made total
    with the o_orderkey tie-break (o_totalprice carries duplicate
    values; the tie-pinning is regression-tested in
    tests/test_joins.py::test_ntile_exact_matches_window_under_heavy_ties).
    Money sums accumulate in exact decimal
    (_revenue_dec contract).  The oracle keeps the window spelling —
    same buckets, antagonistic plan."""
    from ..operators.quantiles import ntile_exact

    t = Tables(spark, sf_dir)
    deciled = ntile_exact(
        t.orders.select("o_totalprice", "o_orderkey"),
        10,
        ["o_totalprice", "o_orderkey"],
        bucket_col="decile",
    )
    return (
        deciled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _fixed_money(
                F.sum(_cents100("o_totalprice").cast("decimal(20,0)")), 2
            ).alias("sum_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("decile")
    )


ORACLE["q49_ntile_deciles"] = """
    WITH d AS (
        SELECT o_totalprice,
               NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        FROM orders
    )
    SELECT decile, COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM d GROUP BY decile ORDER BY decile
"""


@query("q50_listagg")
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation per group. Spark spells it
    concat_ws(array_sort(collect_list(..))) — collect_list order is
    nondeterministic but array_sort pins it; DuckDB's string_agg with
    ORDER BY is the direct equivalent. Restricted to one segment per
    nation to keep the concatenation bounded."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.filter(F.col("c_mktsegment") == "BUILDING")
        .filter(F.col("c_custkey") % 50 == 0)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.concat_ws("|", F.array_sort(F.collect_list("c_name"))).alias("members"),
        )
        .orderBy("c_nationkey")
    )


ORACLE["q50_listagg"] = """
    SELECT c_nationkey, COUNT(*) AS n_members,
           string_agg(c_name, '|' ORDER BY c_name) AS members
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_custkey % 50 = 0
    GROUP BY c_nationkey ORDER BY c_nationkey
"""


@query("q51_bit_aggs")
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate functions (bit_and / bit_or / bit_xor) over an
    integer expression per group — exact integer semantics, identical in
    both engines."""
    t = Tables(spark, sf_dir)
    v = (F.col("l_partkey") % 4096).cast("bigint")
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.bit_and(v).alias("band"),
            F.bit_or(v).alias("bor"),
            F.bit_xor(v).alias("bxor"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


ORACLE["q51_bit_aggs"] = """
    SELECT l_returnflag,
           bit_and(CAST(l_partkey % 4096 AS BIGINT)) AS band,
           bit_or(CAST(l_partkey % 4096 AS BIGINT)) AS bor,
           bit_xor(CAST(l_partkey % 4096 AS BIGINT)) AS bxor,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query("q52_median")
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median per group, hash-stable: computed over the
    2-decimal fixed-point integers (floor(q*100+0.5) — never near a .5
    boundary), where the even-count midpoint (a+b)/2 is exactly
    representable, then divided back by the exact power of two × scale —
    a single correctly-rounded double op in both engines."""
    t = Tables(spark, sf_dir)
    qi = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("bigint")
    return (
        t.lineitem.groupBy("l_linestatus")
        .agg(
            (F.median(qi) / F.lit(100.0)).alias("med_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_linestatus")
    )


ORACLE["q52_median"] = """
    SELECT l_linestatus,
           median(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0 AS med_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
"""


@query("q53_gaps_islands")
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive high-value events per
    user (value > 50 ordered by ts), via the classic rn − rn_filtered
    difference — two ranking windows sharing ONE partition-by-user sort,
    then a per-island aggregate. Total order via the (ts, event_id)
    tie-break."""
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    w_all = W.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = t.events.select(
        "user_id",
        "event_id",
        "ts",
        F.col("value"),
        F.row_number().over(w_all).alias("rn"),
    ).filter(F.col("value") > 50)
    w_hi = W.partitionBy("user_id").orderBy("ts", "event_id")
    islands = ranked.select(
        "user_id",
        "event_id",
        "ts",
        (F.col("rn") - F.row_number().over(w_hi)).alias("grp"),
    )
    return (
        islands.groupBy("user_id", "grp")
        .agg(
            F.count(F.lit(1)).alias("island_len"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        .filter(F.col("island_len") >= 3)
        .select("user_id", "island_len", "first_event", "last_event")
        .orderBy("user_id", "first_event")
    )


ORACLE["q53_gaps_islands"] = """
    WITH ranked AS (
        SELECT user_id, event_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    hi AS (
        SELECT user_id, event_id, ts,
               rn - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS grp
        FROM ranked WHERE value > 50
    )
    SELECT user_id,
           COUNT(*) AS island_len,
           MIN(event_id) AS first_event,
           MAX(event_id) AS last_event
    FROM hi GROUP BY user_id, grp
    HAVING COUNT(*) >= 3
    ORDER BY user_id, first_event
"""


@query("q54_scd2_intervals")
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-Type-2 interval construction: collapse each user's consecutive
    runs of equal event_type (in (ts, event_id) order) into validity
    intervals [valid_from, valid_to) with the next run's start as the
    exclusive end (NULL = current) — the change-tracking shape a
    dimension-history table stores. Run detection is the rn-difference
    trick sharing ONE partition sort; interval ends come from one lead()
    over the collapsed (tiny) run set."""
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    runs = t.events.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (F.row_number().over(w) - F.row_number().over(w_typ)).alias("grp"),
    )
    collapsed = runs.groupBy("user_id", "event_type", "grp").agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event"),
    )
    w_runs = W.partitionBy("user_id").orderBy("valid_from", "first_event")
    return (
        collapsed.select(
            "user_id",
            "event_type",
            "valid_from",
            F.lead("valid_from").over(w_runs).alias("valid_to"),
            "n_events",
            "first_event",
        )
        .orderBy("user_id", "valid_from", "event_type", "first_event")
        .limit(500)
        .drop("first_event")
    )


ORACLE["q54_scd2_intervals"] = """
    WITH runs AS (
        SELECT user_id, event_type, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             - ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
               AS grp
        FROM events
    ),
    collapsed AS (
        SELECT user_id, event_type, grp,
               MIN(ts) AS valid_from,
               COUNT(*) AS n_events,
               MIN(event_id) AS first_event
        FROM runs GROUP BY user_id, event_type, grp
    )
    SELECT user_id, event_type, valid_from, valid_to, n_events
    FROM (SELECT user_id, event_type, valid_from,
                 LEAD(valid_from) OVER (PARTITION BY user_id
                                        ORDER BY valid_from, first_event) AS valid_to,
                 n_events, first_event
          FROM collapsed
          ORDER BY user_id, valid_from, event_type, first_event
          LIMIT 500)
"""


@query("q55_window_distinct")
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count over a window — a capability gap re-expressed:
    Spark windows reject DISTINCT aggregates, so the running number of
    distinct order priorities per customer is ``size(collect_set(...))``
    over the running frame (set semantics in the aggregation buffer give
    exactly COUNT(DISTINCT); the buffer is bounded by the attribute's
    cardinality — 5 priorities — not the frame length, so it scales)."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        t.orders.select(
            "o_orderkey",
            "o_custkey",
            F.size(F.collect_set("o_orderpriority").over(w)).cast("bigint").alias("n_prio"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


ORACLE["q55_window_distinct"] = """
    SELECT o_orderkey, o_custkey,
           COUNT(DISTINCT o_orderpriority) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS n_prio
    FROM orders ORDER BY o_orderkey LIMIT 500
"""


@query("q56_funnel")
def q56_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: per user the
    first view, the first click strictly after it, the first purchase
    strictly after that — then users surviving each stage.  The chained
    conditional-min spelling keeps every aggregation and join on the
    SAME key (user_id): one shuffle partitioning reused end-to-end,
    no per-user event arrays materialized (heavy users cost nothing
    beyond their aggregate row)."""
    t = Tables(spark, sf_dir)
    e = t.events.select("user_id", "ts", "event_type")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    out = (
        v.agg(F.lit(1).alias("stage"), F.count("*").alias("n_users"))
        .unionByName(c.agg(F.lit(2).alias("stage"), F.count("*").alias("n_users")))
        .unionByName(p.agg(F.lit(3).alias("stage"), F.count("*").alias("n_users")))
    )
    return out.select(
        F.col("stage").cast("bigint").alias("stage"),
        F.col("n_users").cast("bigint").alias("n_users"),
    ).orderBy("stage")


ORACLE["q56_funnel"] = """
    WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
    SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM c
        UNION ALL
        SELECT CAST(3 AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM p
    ) ORDER BY stage
"""


@query("q57_retention_cohorts")
def q57_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by the week of their first
    event; for each cohort, distinct users active k weeks later
    (k = 0..3).  Two aggregations and one join, all keyed on user_id /
    (cohort, k) — integer week arithmetic (floor of day diff / 7) so the
    result is engine-exact."""
    t = Tables(spark, sf_dir)
    e = t.events.select("user_id", F.to_date("ts").alias("d"))
    first = e.groupBy("user_id").agg(F.min("d").alias("d0"))
    joined = e.join(first, "user_id").select(
        "user_id",
        F.date_trunc("week", F.col("d0")).cast("date").alias("cohort_week"),
        F.floor(F.datediff(F.col("d"), F.col("d0")) / 7).cast("bigint").alias("k"),
    )
    return (
        joined.where(F.col("k") <= 3)
        .groupBy("cohort_week", "k")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
        .orderBy("cohort_week", "k")
    )


ORACLE["q57_retention_cohorts"] = """
    WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
    f AS (SELECT user_id, MIN(d) AS d0 FROM e GROUP BY user_id),
    j AS (SELECT e.user_id,
                 CAST(date_trunc('week', f.d0) AS DATE) AS cohort_week,
                 CAST(FLOOR(date_diff('day', f.d0, e.d) / 7.0) AS BIGINT) AS k
          FROM e JOIN f USING (user_id))
    SELECT cohort_week, k, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM j WHERE k <= 3 GROUP BY cohort_week, k ORDER BY cohort_week, k
"""
