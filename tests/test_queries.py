"""Declared-query correctness: Spark result vs DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from arcane_stream_microsoft_synapse_link_spark.plans import ORACLE, ORACLE_SF, QUERIES

from .oracle_harness import compare


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, sf_dir, name):
    assert name in QUERIES, f"oracle {name} has no Spark query"
    # literal-VALUES oracles are pinned to the driver's sf0.01 compare
    # scale (plans/values_oracle.py); everything else runs at the sweep sf
    ok, msg = compare(spark, ORACLE_SF.get(name, sf_dir), QUERIES[name], ORACLE[name], strict=True)
    assert ok, msg


def test_all_queries_have_runnable_plans(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name


def test_values_oracles_discriminate(spark):
    """The literal-VALUES oracles are real checks, not rubber stamps: a
    deliberately perturbed computation must FAIL the strict compare.
    Two probes — a parameter change on the ANN mirror (nprobe) and a
    content change on the fingerprint mirror (doc text)."""
    from arcane_stream_microsoft_synapse_link_spark.catalog import Tables
    from arcane_stream_microsoft_synapse_link_spark.functions import similarity as S
    from arcane_stream_microsoft_synapse_link_spark.functions import text as X
    from pyspark.sql import functions as F

    from .oracle_harness import compare

    sf = "/root/testdata/sf0.01"

    def wrong_knn(spark_, sf_dir):
        t = Tables(spark_, sf_dir)
        emb = t.embeddings
        cents = S.ivf_train(emb, 32, iters=1)
        assigned = S.ivf_assign(emb, cents)
        q = emb.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        # nprobe 4 instead of the declared 28 → different top-k
        return S.ivf_topk(assigned, cents, q, k=10, nprobe=4).select(
            "query_id",
            "vec_id",
            "rank",
            F.floor(F.col("cos_sim") * 1e6).cast("bigint").alias("cos_ppm"),
        ).orderBy("query_id", "rank")

    ok, _ = compare(spark, sf, wrong_knn, ORACLE["ops_knn_ivf"], strict=True)
    assert not ok, "perturbed ANN parameters must hash-mismatch the mirror"

    def wrong_fp(spark_, sf_dir):
        t = Tables(spark_, sf_dir)
        docs = t.documents.withColumn(
            "text",
            F.when(F.col("doc_id") == 0, F.concat(F.col("text"), F.lit(" tampered"))).otherwise(
                F.col("text")
            ),
        )
        return X.rolling_fingerprints_np(docs).orderBy("doc_id")

    ok, _ = compare(spark, sf, wrong_fp, ORACLE["ops_fingerprint_rolling"], strict=True)
    assert not ok, "a changed document must change its fingerprint vs the mirror"


def test_unigram_values_oracle_discriminates(spark):
    """The unigram mirror is a real check: training with one fewer EM
    iteration (different counts/probs) must FAIL the strict compare
    against ORACLE['ops_unigram_train']."""
    from arcane_stream_microsoft_synapse_link_spark.catalog import Tables
    from arcane_stream_microsoft_synapse_link_spark.functions import text as X

    from .oracle_harness import compare

    def wrong_train(spark_, sf_dir):
        t = Tables(spark_, sf_dir)
        return X.unigram_train(t.documents, n_iters=3).orderBy("rank")

    ok, _ = compare(
        spark, "/root/testdata/sf0.01", wrong_train,
        ORACLE["ops_unigram_train"], strict=True,
    )
    assert not ok, "a perturbed EM schedule must hash-mismatch the mirror"
