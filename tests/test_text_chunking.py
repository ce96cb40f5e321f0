"""Text chunking: built-in operator edge cases + the Python UDTF twin
(§2.F surface — lateral table function over documents)."""

from __future__ import annotations

from pyspark.sql.functions import udtf

from arcane_stream_microsoft_synapse_link_spark.functions.text import chunk_documents


def test_chunk_edges(spark):
    docs = spark.createDataFrame(
        [
            (1, "one two three"),                      # < size -> one chunk
            (2, " ".join(f"w{i}" for i in range(64))),  # exactly size -> one chunk
            (3, " ".join(f"w{i}" for i in range(65))),  # size+1 -> two chunks
            (4, "   "),                                 # blank -> dropped
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 4 not in by_doc
    assert [len(by_doc[d]) for d in (1, 2, 3)] == [1, 1, 2]
    # overlap: chunk 1 starts at word index 48
    c1 = sorted(by_doc[3], key=lambda r: r["chunk_id"])[1]["chunk"]
    assert c1.split()[0] == "w48" and c1.split()[-1] == "w64"


@udtf(returnType="chunk_id: bigint, chunk: string")
class ChunkTextUDTF:
    """Row-at-a-time reference implementation of chunk_documents — the
    §2.F user-defined-table-function surface. The built-in form is the
    hot path; this exists to prove the semantics and the API."""

    def eval(self, text: str):
        words = (text or "").split()
        if not words:
            return
        step, size = 48, 64
        n = max(-(-(len(words) - 16) // step), 1)
        for i in range(n):
            yield i, " ".join(words[i * step : i * step + size])


def test_udtf_matches_builtin(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(5 + i * 37))) for i in range(8)],
        "doc_id long, text string",
    )
    spark.udtf.register("chunk_text", ChunkTextUDTF)
    docs.createOrReplaceTempView("chunk_src")
    via_udtf = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk"])
        for r in spark.sql(
            "SELECT s.doc_id, c.chunk_id, c.chunk FROM chunk_src s, LATERAL chunk_text(s.text) c"
        ).collect()
    )
    via_builtin = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk"]) for r in chunk_documents(docs).collect()
    )
    assert via_udtf == via_builtin and len(via_builtin) == sum(
        max(-(-(5 + i * 37 - 16) // 48), 1) for i in range(8)
    )


# ---------------------------------------------------------------------------
# repetition metrics: property test against a pure-Python model
# ---------------------------------------------------------------------------


def test_repetition_metrics_property(spark):
    """repetition_metrics must equal the obvious per-doc Python computation
    for arbitrary small word streams (incl. empty and single-word docs)."""
    import random
    import re
    from collections import Counter

    from arcane_stream_microsoft_synapse_link_spark.functions.text import (
        WORD_RE,
        repetition_metrics,
    )

    rng = random.Random(1234)
    vocab = ["aa", "bb", "cc", "dd"]
    docs = [(0, ""), (1, "solo"), (2, "!!! ???")]  # degenerate shapes
    docs += [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
        for i in range(3, 60)
    ]

    def model(text):
        w = re.findall(WORD_RE, text.lower())
        total = len(w)
        dup = ((total - len(set(w))) * 1_000_000) // total if total else 0
        grams = [f"{a} {b}" for a, b in zip(w, w[1:])]
        top = (max(Counter(grams).values()) * 1_000_000) // len(grams) if grams else 0
        return total, dup, top

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.total_w, r.dup_word_ppm, r.top_bigram_ppm)
           for r in repetition_metrics(df).collect()}
    for doc_id, text in docs:
        assert got[doc_id] == model(text), (doc_id, text)
