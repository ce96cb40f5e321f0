"""Trained language identification: hashed byte-n-gram multinomial NB.

The standard first gate of every public curation pipeline the ops family
cites (CCNet, C4, RefinedWeb, FineWeb filter on language BEFORE quality
and dedup), in its public-knowledge form: character/byte n-gram profiles
(Cavnar & Trenkle 1994) scored as a multinomial Naive Bayes over a
HASHED feature space (the fastText langid trick — hashed n-grams keep
the model a fixed-size table regardless of vocabulary).  Until now the
engine consumed a ``lang`` column it could not produce
(functions/curation.py:bfd_pack, mixture ops); this module trains that
column's producer in-engine, the way ``ops_quality_classifier`` trains
the quality filter (functions/classifier.py).

Feature space
    Overlapping byte 2- and 3-grams of ``" " + text.lower() + " "``
    (UTF-8 bytes — multi-byte scripts contribute their lead/continuation
    byte patterns, which is exactly what separates e.g. CJK from Latin),
    bucketed by a multiplicative hash ``(gram * 2654435761) mod 2^32 mod
    n_buckets`` (Knuth's constant).  Byte-level n-grams vectorize
    EXACTLY in numpy (shift-or over a ``frombuffer`` view — no per-gram
    Python loop, no per-gram crc), and integer hashing is bit-identical
    in any engine, which is what lets the driver hash-compare the model
    against an independent sequential mirror
    (plans/values_oracle.py:ref_langid_*).

100-TB shape
    Train: ONE corpus scan (Arrow ``mapInPandas``) emitting per-batch
    partial ``(label, bucket, cnt)`` rows — at most ``langs × n_buckets``
    rows per batch regardless of corpus size — then a map-side-combined
    ``groupBy(label, bucket).sum``: the shuffle payload is bounded by
    the MODEL size (langs × buckets ints), never the corpus.  Score: the
    model (langs × buckets ≈ a few hundred KB) collects to the driver
    and broadcasts into one Arrow ``mapInPandas`` sweep; the corpus
    never shuffles.  This is the classifier.py partial-sums discipline
    with integer counts instead of GEMM partials.

Determinism (strict hash-compare contract)
    Training counts are exact integers.  Scoring holds log-probs in
    float64 computed by the SAME numpy expressions the sequential
    mirror runs — smoothing ``log((cnt+1)/(total+buckets))``, prior
    ``log(n_docs/total_docs)``, per-document score
    ``(M * hist).sum(axis=1) + prior`` (numpy's pairwise reduction over
    a fixed-length axis; deliberately NOT a BLAS GEMV, whose blocking
    may reorder accumulation) — so every double is bit-identical and
    ``floor(margin * 1e6)`` hashes equal.  Argmax ties break to the
    lexicographically smallest label (labels are sorted; ``argmax``
    returns the first maximum).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_KNUTH = 2654435761
_MASK32 = 0xFFFFFFFF

DEFAULT_BUCKETS = 4096


def _gram_buckets(text: str, n_buckets: int):
    """Hashed byte 2-/3-gram bucket ids of one document (numpy uint64
    vector).  Pure function of the text bytes — the sequential mirror
    (plans/values_oracle.py) runs this exact expression sequence."""
    import numpy as np

    raw = (" " + (text or "").lower() + " ").encode("utf-8")
    b = np.frombuffer(raw, dtype=np.uint8).astype(np.uint64)
    g2 = (b[:-1] << np.uint64(8)) | b[1:]
    g3 = (b[:-2] << np.uint64(16)) | (b[1:-1] << np.uint64(8)) | b[2:]
    grams = np.concatenate([g2, g3])
    return ((grams * np.uint64(_KNUTH)) & np.uint64(_MASK32)) % np.uint64(n_buckets)


def langid_train(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Bucket-count model table ``(label, bucket, cnt)`` — the multinomial
    NB sufficient statistics.  One corpus scan; output ≤ labels × buckets
    rows (map-side partials per Arrow batch, summed in one bounded
    shuffle)."""
    schema = T.StructType(
        [
            T.StructField("label", T.StringType()),
            T.StructField("bucket", T.LongType()),
            T.StructField("cnt", T.LongType()),
        ]
    )

    def partials(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            acc: dict[str, object] = {}
            for text, label in zip(pdf[text_col], pdf[label_col]):
                buckets = _gram_buckets(text, n_buckets)
                hist = np.bincount(buckets.astype(np.int64), minlength=n_buckets)
                prev = acc.get(label)
                acc[label] = hist if prev is None else prev + hist
            out_label, out_bucket, out_cnt = [], [], []
            for label in acc:
                hist = acc[label]
                nz = hist.nonzero()[0]
                out_label.extend([label] * len(nz))
                out_bucket.extend(int(i) for i in nz)
                out_cnt.extend(int(hist[i]) for i in nz)
            yield pd.DataFrame(
                {"label": out_label, "bucket": out_bucket, "cnt": out_cnt}
            )

    from .dedup import spread_small_scan

    parts = spread_small_scan(
        docs.select(F.col(text_col).alias(text_col), F.col(label_col).alias(label_col))
    ).mapInPandas(partials, schema=schema)
    return parts.groupBy("label", "bucket").agg(F.sum("cnt").alias("cnt"))


def langid_doc_counts(docs: DataFrame, label_col: str = "lang") -> DataFrame:
    """Per-label document counts ``(label, n_docs)`` — the NB prior's
    sufficient statistic (reads only the label column: pruned scan)."""
    return docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def langid_model_summary(model: DataFrame, counts: DataFrame) -> DataFrame:
    """Compact, hash-verifiable pin of the FULL model: per label
    ``(lang, n_docs, n_grams, buckets_hit, model_md5)`` where model_md5
    fingerprints the canonical ``bucket:cnt`` sequence in bucket order —
    one different count anywhere flips the digest, so 5 summary rows pin
    langs × buckets integers without a giant VALUES literal."""
    canon = model.groupBy("label").agg(
        F.sum("cnt").alias("n_grams"),
        F.count(F.lit(1)).alias("buckets_hit"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("bucket", "cnt"))
                    ),
                    lambda s: F.concat_ws(":", s["bucket"], s["cnt"]),
                ),
            )
        ).alias("model_md5"),
    )
    return (
        counts.join(canon, on="label", how="left")
        .select(
            F.col("label").alias("lang"),
            "n_docs",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("buckets_hit", F.lit(0)).alias("buckets_hit"),
            F.coalesce("model_md5", F.md5(F.lit(""))).alias("model_md5"),
        )
        .orderBy("lang")
    )


def collect_model(
    model: DataFrame, counts: DataFrame, n_buckets: int = DEFAULT_BUCKETS
):
    """Materialize the bounded model for broadcast: sorted label list,
    float64 log-prob matrix [labels × buckets], float64 log-prior
    vector.  Size is labels × buckets doubles — independent of corpus
    size, the precondition for collect()."""
    import numpy as np

    count_rows = counts.collect()
    labels = sorted(r["label"] for r in count_rows)
    lab_ix = {lang: i for i, lang in enumerate(labels)}
    n_docs = np.zeros(len(labels), dtype=np.float64)
    for r in count_rows:
        n_docs[lab_ix[r["label"]]] = float(r["n_docs"])
    cnt = np.zeros((len(labels), n_buckets), dtype=np.float64)
    for r in model.collect():
        cnt[lab_ix[r["label"]], int(r["bucket"])] = float(r["cnt"])
    totals = cnt.sum(axis=1)
    logp = np.log((cnt + 1.0) / (totals + float(n_buckets))[:, None])
    logprior = np.log(n_docs / n_docs.sum())
    return labels, logp, logprior


def langid_predict(
    docs: DataFrame,
    labels: list[str],
    logp,
    logprior,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Score every document against the broadcast model in one Arrow
    sweep: ``(doc_id, lang_pred, margin_ppm)`` where margin is the
    winner's log-odds lead over the runner-up in floor-micro-nats (0
    when only one label exists).  Per-document reduction is
    ``(logp * hist).sum(axis=1)`` — fixed pairwise order, mirror-exact
    (module docstring)."""
    schema = T.StructType(
        [
            docs.schema[id_col],
            T.StructField("lang_pred", T.StringType()),
            T.StructField("margin_ppm", T.LongType()),
        ]
    )
    single = len(labels) < 2

    def score(batches: Iterator) -> Iterator:
        import math

        import numpy as np
        import pandas as pd

        for pdf in batches:
            preds, margins = [], []
            for text in pdf[text_col]:
                buckets = _gram_buckets(text, n_buckets)
                hist = np.bincount(
                    buckets.astype(np.int64), minlength=n_buckets
                ).astype(np.float64)
                scores = (logp * hist).sum(axis=1) + logprior
                best = int(np.argmax(scores))
                preds.append(labels[best])
                if single:
                    margins.append(0)
                else:
                    runner = np.max(np.delete(scores, best))
                    margins.append(
                        int(math.floor((float(scores[best]) - float(runner)) * 1e6))
                    )
            yield pd.DataFrame(
                {id_col: pdf[id_col], "lang_pred": preds, "margin_ppm": margins}
            )

    from .dedup import spread_small_scan

    # spread before the per-doc gram hashing (CPU-bound; no-op at scale)
    return spread_small_scan(docs.select(id_col, text_col)).mapInPandas(
        score, schema=schema
    )


def langid_fit_predict(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Train on the labeled corpus, then sweep it: the in-engine
    train+apply composition (ops_langid's entry shape, mirroring
    ops_quality_classifier's)."""
    model = langid_train(docs, text_col, label_col, n_buckets)
    counts = langid_doc_counts(docs, label_col)
    labels, logp, logprior = collect_model(model, counts, n_buckets)
    return langid_predict(docs, labels, logp, logprior, text_col, id_col, n_buckets)
