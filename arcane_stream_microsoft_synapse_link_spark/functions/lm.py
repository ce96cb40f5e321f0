"""Kneser–Ney smoothed bigram language model, trained and scored in-engine.

CCNet's quality gate is a KenLM n-gram model scoring each paragraph's
perplexity; docs land in head/middle/tail by that score.  The engine's
``ops_bigram_lm`` is the unsmoothed MLE form (zero mass for unseen
transitions); THIS module adds the real thing — interpolated Kneser–Ney
(Kneser & Ney 1995; Chen & Goodman 1999 eq. 15) — so held-out documents
with unseen bigrams get calibrated, non-zero transition probabilities
from the continuation distribution.

Exact-integer contract (hash-stable across engines — no log, no float):
with discount D = 3/4 every interpolated-KN term is rational with small
denominators, so probabilities are declared in ppm fixed point:

* seen context ``u`` (``cu = c(u,·)``, ``n1u = N1+(u·)``,
  ``n1w = N1+(·w)``, ``n1tot = |{(u,w): c(u,w)>0}|``)::

      term1_ppm = (max(4·c(u,w) − 3, 0) · 1e6) DIV (4·cu)        # discounted MLE
      term2_ppm = (3 · n1u · n1w · 1e6)      DIV (4·cu·n1tot)    # backoff weight × continuation
      p_ppm     = term1_ppm + term2_ppm

  (two exact divisions instead of one over a common denominator keeps
  the intermediates small: term2's numerator is ≤ 3·|V|²·1e6 < 2⁶³ for
  vocabularies to ~1e6 types, and term1's numerator 4·c(u,w)·1e6 is
  bounded by the CORPUS bigram count, not the vocabulary — it stays
  under 2⁶³ while every single bigram occurs < 2⁶³/4e6 ≈ 2.3e12 times,
  i.e. for any corpus below ~2.3 quadrillion tokens even if one bigram
  dominated it outright; each term floors independently, a ≤2-ppm
  defined semantics mirrored verbatim in the oracle);

* unseen context: pure continuation, ``p_ppm = (n1w · 1e6) DIV n1tot``;

* unseen word in unseen context: 0 (the corpus-closed floor — a filter
  threshold never distinguishes 0 from ε).

A document's fluency is the integer mean ``sum(p_ppm) DIV n_bigrams``
(the ``ops_bigram_lm`` convention: mean transition probability ranks
documents identically to perplexity for thresholding, without ln ulps).

100-TB shape: ONE corpus pass builds the bigram count table (hash-agg
with map-side combine under Zipf skew); every other model quantity
(cu, n1u, n1w, n1tot) derives from that vocab²-bounded table, never from
the corpus.  Scoring is one more corpus pass: the (w1,w2) model join is
the only big shuffle (AQE skew-join splits the hot function words), the
per-context and per-word tables are vocab-sized broadcasts, n1tot is a
scalar broadcast.  Train-on-even / score-all keeps genuinely held-out
docs in the declared result so the backoff path is exercised, not just
compiled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: word grammar shared with ops_bigram_lm and the tokenizer family
_WORD_RE = "[a-z0-9]+"


def corpus_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) — adjacent lowercase word pairs, docs with ≥2
    tokens only (a codegen'd projection + generate; no data-sized
    shuffle — the r14 spread is a no-op once the scan has enough
    splits, and locally it stops the CPU-bound tokenize+explode from
    serializing onto the one core that owns the single parquet split)."""
    from .dedup import spread_small_scan

    return (
        spread_small_scan(docs.select("doc_id", "text")).select(
            "doc_id",
            F.expr(f"regexp_extract_all(lower(text), '{_WORD_RE}', 0)").alias("ws"),
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


def kn_model(train_docs: DataFrame):
    """Train the KN sufficient statistics.

    Returns ``(model, ctx, cont, tot)``:

    * ``model``: (w1, w2, c) — bigram type counts (the ONE corpus agg);
    * ``ctx``:   (w1, cu, n1u) — per-context totals, derived from model;
    * ``cont``:  (w2, n1w) — continuation counts, derived from model;
    * ``tot``:   single row (n1tot) — distinct bigram types.
    """
    bg = corpus_bigrams(train_docs)
    # pin the bigram count table (vocab²-bounded): ctx/cont/tot below are
    # each broadcast under a different build key, and without the pin each
    # broadcast build re-ran the train-corpus tokenize+count from the scan
    # (r14 measured: four ~0.6 s duplicate single-task jobs per KN entry —
    # at scale, four corpus passes where one suffices)
    model = (
        bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(eager=False)
    )
    ctx = model.groupBy("w1").agg(
        F.sum("c").alias("cu"), F.count(F.lit(1)).alias("n1u")
    )
    cont = model.groupBy("w2").agg(F.count(F.lit(1)).alias("n1w"))
    tot = model.agg(F.count(F.lit(1)).alias("n1tot"))
    return model, ctx, cont, tot


_P_SEEN_CTX = (
    "CAST((GREATEST(4 * coalesce(c, 0) - 3, 0) * 1000000) DIV (4 * cu) AS BIGINT)"
    " + CAST((3 * n1u * coalesce(n1w, 0) * 1000000) DIV (4 * cu * n1tot) AS BIGINT)"
)
_P_UNSEEN_CTX = "CAST((coalesce(n1w, 0) * 1000000) DIV n1tot AS BIGINT)"


def kn_transition_ppm() -> F.Column:
    """The per-bigram KN probability in ppm, over joined columns
    (c, cu, n1u, n1w, n1tot — nulls where unseen)."""
    return F.expr(
        f"CASE WHEN cu IS NULL THEN {_P_UNSEEN_CTX} ELSE {_P_SEEN_CTX} END"
    ).alias("p_ppm")


def kn_score(docs: DataFrame, model, ctx, cont, tot) -> DataFrame:
    """Score every document against a trained model: one corpus pass.

    (doc_id, n_bigrams, n_unseen, kn_ppm) — n_unseen counts bigram
    INSTANCES absent from the model (the held-out novelty signal a
    decontamination dashboard watches alongside the fluency score).
    """
    bg = corpus_bigrams(docs)
    j = (
        bg.join(model, ["w1", "w2"], "left")
        .join(F.broadcast(ctx), "w1", "left")
        .join(F.broadcast(cont), "w2", "left")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", F.col("c"), kn_transition_ppm())
    )
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.when(F.col("c").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_unseen"),
        F.expr("CAST(sum(p_ppm) DIV count(1) AS BIGINT)").alias("kn_ppm"),
    )


def kn_model_table(model, ctx, cont, tot) -> DataFrame:
    """The joined model view (w1, w2, c, cu, n1u, n1w, n1tot, p_ppm) —
    every quantity from the vocab²-bounded count table, corpus untouched."""
    return (
        model.join(F.broadcast(ctx), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c").cast("bigint").alias("c"),
            F.col("cu").cast("bigint").alias("cu"),
            F.col("n1u").cast("bigint").alias("n1u"),
            F.col("n1w").cast("bigint").alias("n1w"),
            F.col("n1tot").cast("bigint").alias("n1tot"),
            F.expr(_P_SEEN_CTX).cast("bigint").alias("p_ppm"),
        )
    )
