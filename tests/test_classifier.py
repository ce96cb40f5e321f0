"""Distributed IRLS logistic regression (trained quality filter)."""

from __future__ import annotations

from pyspark.sql import functions as F

from arcane_stream_microsoft_synapse_link_spark.catalog import Tables
from arcane_stream_microsoft_synapse_link_spark.functions.classifier import (
    FEATURE_COLS,
    classifier_scores,
    irls_train,
    text_feature_frame,
)
from arcane_stream_microsoft_synapse_link_spark.session import local_df


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
