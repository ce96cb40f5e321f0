"""Distributed IRLS logistic regression (trained quality filter)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from arcane_stream_microsoft_synapse_link_spark.catalog import Tables
from arcane_stream_microsoft_synapse_link_spark.functions.classifier import (
    FEATURE_COLS,
    classifier_scores,
    irls_train,
    text_feature_frame,
)
from arcane_stream_microsoft_synapse_link_spark.session import local_df


@pytest.mark.slow
def test_irls_learns_a_separable_problem(spark):
    """Planted separable corpus: label 1 docs are punctuation-free prose,
    label 0 docs are punctuation-dense — the x_punct feature separates
    them, and the trained classifier must score ≥95% correctly."""
    rows = []
    for i in range(60):
        if i % 2 == 0:
            text = "the quick brown fox jumps over the lazy dog " * (2 + i % 3)
            rows.append((i, text, 1))
        else:
            text = "x,y;z.!?" * (5 + i % 3)
            rows.append((i, text, 0))
    df = local_df(spark, rows, "doc_id bigint, text string, label int")
    feat = text_feature_frame(df, keep=("label",))
    beta = irls_train(feat)
    out = classifier_scores(feat, beta).join(df.select("doc_id", "label"), "doc_id")
    hits = out.where(
        ((F.col("score_ppm") >= 500000) & (F.col("label") == 1))
        | ((F.col("score_ppm") < 500000) & (F.col("label") == 0))
    ).count()
    assert hits >= 57, hits  # ≥95% of 60


def test_irls_matches_sequential_numpy(spark, sf_dir):
    """Engine β == a straight sequential numpy IRLS on the same features
    (collected once) — the distributed partial-sum combine introduces no
    drift at single-partition test scale."""
    import numpy as np

    t = Tables(spark, sf_dir)
    feat = text_feature_frame(
        t.documents, keep=((F.col("lang") == "en").cast("int").alias("label"),)
    )
    beta = irls_train(feat)
    rows = feat.orderBy("doc_id").collect()
    X = np.asarray([[1.0, *[r[c] for c in FEATURE_COLS]] for r in rows])
    y = np.asarray([float(r["label"]) for r in rows])
    b = np.zeros(X.shape[1])
    for _ in range(4):
        p = 1.0 / (1.0 + np.exp(-(X @ b)))
        w = p * (1.0 - p)
        H = X.T @ (w[:, None] * X)
        g = X.T @ (y - p)
        b = b + np.linalg.solve(H + 1e-6 * np.eye(X.shape[1]), g)
    assert np.allclose(beta, b, rtol=0, atol=1e-12), (beta, list(b))


def test_classifier_mirror_discriminates(spark):
    """Fewer Newton iterations must hash-mismatch the mirror."""
    from arcane_stream_microsoft_synapse_link_spark.plans import ORACLE

    from .oracle_harness import compare

    def wrong(spark_, sf_dir):
        t = Tables(spark_, sf_dir)
        feat = text_feature_frame(
            t.documents, keep=((F.col("lang") == "en").cast("int").alias("label"),)
        )
        beta = irls_train(feat, iters=1)
        return (
            classifier_scores(feat, beta)
            .join(feat.select("doc_id", "label"), "doc_id")
            .select("doc_id", F.col("label").cast("bigint").alias("label"), "score_ppm")
            .orderBy("doc_id")
        )

    ok, _ = compare(
        spark, "/root/testdata/sf0.01", wrong, ORACLE["ops_quality_classifier"], strict=True
    )
    assert not ok, "an under-trained model must hash-mismatch the mirror"


# ---------------------------------------------------------------------------
# language ID (hashed byte-n-gram multinomial NB, functions/langid.py)
# ---------------------------------------------------------------------------

_LANG_SENTENCES = {
    "en": [
        "the quick brown fox jumps over the lazy dog in the park",
        "it is a good day to walk with the children and old friends",
        "she said that the weather would be fine for the whole week",
    ],
    "de": [
        "der schnelle braune fuchs springt über den faulen hund im park",
        "es ist ein schöner tag für einen spaziergang mit den kindern",
        "sie sagte dass das wetter die ganze woche schön bleiben würde",
    ],
    "es": [
        "el rápido zorro marrón salta sobre el perro perezoso en el parque",
        "es un buen día para caminar con los niños y los viejos amigos",
        "ella dijo que el tiempo sería bueno durante toda la semana",
    ],
    "fr": [
        "le renard brun rapide saute par dessus le chien paresseux au parc",
        "c'est une belle journée pour se promener avec les enfants",
        "elle a dit que le temps serait beau pendant toute la semaine",
    ],
    "zh": [
        "敏捷的棕色狐狸跳过了公园里那只懒惰的狗",
        "今天是个好日子适合和孩子们还有老朋友一起散步",
        "她说这一整个星期的天气都会很好",
    ],
}


def test_langid_discriminates_planted_languages(spark):
    """Planted multi-language discrimination: trained on 3 real sentences
    per language, the NB must (a) classify every training document
    correctly with positive margin and (b) generalize to UNSEEN sentences
    of each language — including CJK, where the utf-8 byte n-grams do the
    separating."""
    from arcane_stream_microsoft_synapse_link_spark.functions.langid import (
        collect_model,
        langid_doc_counts,
        langid_predict,
        langid_train,
    )

    rows, i = [], 0
    for lang, sents in _LANG_SENTENCES.items():
        for s in sents:
            rows.append((i, s, lang))
            i += 1
    train = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model = langid_train(train)
    counts = langid_doc_counts(train)
    labels, logp, logprior = collect_model(model, counts)

    got = {
        r["doc_id"]: (r["lang_pred"], r["margin_ppm"])
        for r in langid_predict(train, labels, logp, logprior).collect()
    }
    for doc_id, _text, lang in rows:
        pred, margin = got[doc_id]
        assert pred == lang, (doc_id, pred, lang)
        assert margin > 0

    unseen = [
        (100, "the old dog walks slowly through the quiet garden", "en"),
        (101, "die kinder spielen gerne draußen wenn die sonne scheint", "de"),
        (102, "los amigos comen juntos en la casa de la abuela", "es"),
        (103, "les enfants jouent dehors quand le soleil brille", "fr"),
        (104, "孩子们喜欢在阳光明媚的时候去外面玩耍", "zh"),
    ]
    test = spark.createDataFrame(
        [(d, t) for d, t, _ in unseen], "doc_id long, text string"
    )
    preds = {
        r["doc_id"]: r["lang_pred"]
        for r in langid_predict(test, labels, logp, logprior).collect()
    }
    for doc_id, _text, lang in unseen:
        assert preds[doc_id] == lang, (doc_id, preds[doc_id], lang)


@pytest.mark.slow
def test_langid_partitioning_invariant_and_summary_pins_model(spark):
    """Determinism under redistribution: training partials summed across
    any partitioning must produce the identical model (integer counts →
    identical float64 log-probs → identical predictions), and the
    5-row summary's model_md5 must flip when any count changes."""
    from arcane_stream_microsoft_synapse_link_spark.functions.langid import (
        langid_doc_counts,
        langid_fit_predict,
        langid_model_summary,
        langid_train,
    )

    rows, i = [], 0
    for lang, sents in _LANG_SENTENCES.items():
        for s in sents:
            rows.append((i, s, lang))
            i += 1
    df1 = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    df7 = df1.repartition(7)
    p1 = sorted(map(tuple, langid_fit_predict(df1).collect()))
    p7 = sorted(map(tuple, langid_fit_predict(df7).collect()))
    assert p1 == p7

    s1 = {r["lang"]: r for r in langid_model_summary(
        langid_train(df1), langid_doc_counts(df1)).collect()}
    s7 = {r["lang"]: r for r in langid_model_summary(
        langid_train(df7), langid_doc_counts(df7)).collect()}
    assert {k: tuple(v) for k, v in s1.items()} == {k: tuple(v) for k, v in s7.items()}
    # perturb one document -> the perturbed language's digest flips
    rows2 = list(rows)
    rows2[0] = (rows2[0][0], rows2[0][1] + " x", rows2[0][2])
    df2 = spark.createDataFrame(rows2, "doc_id long, text string, lang string")
    s2 = {r["lang"]: r for r in langid_model_summary(
        langid_train(df2), langid_doc_counts(df2)).collect()}
    assert s2["en"]["model_md5"] != s1["en"]["model_md5"]
    assert s2["de"]["model_md5"] == s1["de"]["model_md5"]
