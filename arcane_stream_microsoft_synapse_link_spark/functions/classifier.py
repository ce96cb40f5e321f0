"""Trained quality/domain classifier: distributed IRLS logistic regression.

The classic LLM-pipeline quality filter (GPT-3 / CCNet style) is a tiny
linear classifier trained to separate a trusted seed domain from the raw
crawl, then swept over the whole corpus as a score.  This module trains
that classifier INSIDE the engine with iteratively reweighted least
squares (IRLS / Newton–Raphson):

    β ← β + (XᵀWX + εI)⁻¹ Xᵀ(y − p),   p = σ(Xβ),  W = diag(p(1−p))

The 100 TB shape: the corpus never moves — each Newton iteration is ONE
mapInPandas scan emitting per-batch partial sums ``(XᵀWX flattened d²,
Xᵀ(y−p) d)`` (a few hundred doubles per batch regardless of corpus
size), combined on the driver where the d×d solve is trivial.  This is
exactly MLlib's treeAggregate pattern, written explicitly so the
arithmetic is reproducible and mirrorable: at the verification scale the
corpus is a single Arrow batch, so a sequential numpy reference
(plans/values_oracle.py:ref_quality_classifier) reproduces every GEMM
bit-for-bit.

Features are engineered Spark-SQL ratios (length saturation, stopword
density, punctuation density, mean word length) — JVM-computed doubles
from exact integer counts, so any engine recomputes them identically."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import char_count, punct_count, stopword_count, token_count

FEATURE_COLS = ("x_len", "x_stop", "x_punct", "x_wordlen")


def text_feature_frame(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: tuple = (),
) -> DataFrame:
    """Per-document classifier features as deterministic double ratios of
    exact integer counts (regexp_count — no arrays materialized).
    ``keep`` passes extra columns (e.g. a label) through the projection so
    training needs no join."""
    # the canonical counters from text.py — one definition of token/
    # stopword/punct semantics shared with quality_score and the oracles
    txt = F.col(text_col)
    toks = token_count(txt).cast("double")
    stops = stopword_count(txt).cast("double")
    punct = punct_count(txt).cast("double")
    chars = char_count(txt).cast("double")
    return df.select(
        F.col(id_col),
        *[c if not isinstance(c, str) else F.col(c) for c in keep],
        (toks / (toks + F.lit(64.0))).alias("x_len"),
        F.least(stops * F.lit(5.0) / F.greatest(toks, F.lit(1.0)), F.lit(1.0)).alias(
            "x_stop"
        ),
        F.least(punct * F.lit(10.0) / F.greatest(chars, F.lit(1.0)), F.lit(1.0)).alias(
            "x_punct"
        ),
        F.least(chars / F.greatest(toks, F.lit(1.0)) / F.lit(8.0), F.lit(2.0)).alias(
            "x_wordlen"
        ),
    )


def irls_train(
    feat: DataFrame,
    label_col: str = "label",
    feature_cols: tuple[str, ...] = FEATURE_COLS,
    iters: int = 4,
    ridge: float = 1e-6,
) -> list[float]:
    """Newton–Raphson logistic regression over a feature frame with an
    intercept.  Per iteration: one distributed partial-sum scan (bounded
    payload: d² + d doubles per Arrow batch), one driver-side d×d solve.
    Returns ``[β₀ (intercept), β₁…β_d]``.

    Determinism: partials are combined in collect order (stable for a
    fixed partition layout); at the oracle compare scale the corpus is a
    single batch, making the whole computation a fixed sequence of numpy
    GEMMs a sequential reference reproduces exactly."""
    import numpy as np
    import pandas as pd

    d = len(feature_cols) + 1
    beta = np.zeros(d)
    cols = [label_col, *feature_cols]
    src = feat.select(*cols)
    for _ in range(iters):
        b = beta.copy()

        def partials(batches, b=b, d=d):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.column_stack(
                    [np.ones(len(pdf))]
                    + [pdf[c].to_numpy(dtype=np.float64) for c in feature_cols]
                )
                y = pdf[label_col].to_numpy(dtype=np.float64)
                p = 1.0 / (1.0 + np.exp(-(X @ b)))
                w = p * (1.0 - p)
                xtwx = X.T @ (w[:, None] * X)
                xtr = X.T @ (y - p)
                yield pd.DataFrame(
                    {"h": [xtwx.ravel().tolist()], "g": [xtr.tolist()]}
                )

        rows = src.mapInPandas(
            partials, schema="h array<double>, g array<double>"
        ).collect()
        H = np.zeros((d, d))
        g = np.zeros(d)
        for r in rows:
            H += np.asarray(r["h"]).reshape(d, d)
            g += np.asarray(r["g"])
        beta = beta + np.linalg.solve(H + ridge * np.eye(d), g)
    return [float(v) for v in beta]


def classifier_scores(
    feat: DataFrame,
    beta: list[float],
    feature_cols: tuple[str, ...] = FEATURE_COLS,
    id_col: str = "doc_id",
    keep: tuple = (),
) -> DataFrame:
    """Score the corpus with a trained β: ``floor(1e6·σ(xβ))`` as an
    integer ppm — a pure JVM projection (exp/division in doubles), no
    Python in the scoring path.  ``keep`` passes extra columns (a label,
    the text) through the same projection so callers need no join-back
    (a second reference to the lazy feature frame would re-run the
    4-regex corpus projection per consumer)."""
    z = F.lit(float(beta[0]))
    for c, b in zip(feature_cols, beta[1:]):
        z = z + F.col(c) * F.lit(float(b))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feat.select(
        F.col(id_col),
        *[c if not isinstance(c, str) else F.col(c) for c in keep],
        F.floor(score * 1e6).cast("bigint").alias("score_ppm"),
    )
