"""Corpus-curation selection operators: token-budget greedy selection and
DSIR-style importance weighting.

Both are batch corpus→corpus decisions a training-data pipeline makes
after per-document scoring: WHICH documents go into the next pretraining
mix.  They are deliberately expressed so the expensive part stays a
declarative Spark plan (Catalyst prunes/pushes down; integer outputs make
the results engine-portable and oracle-checkable):

- ``token_budget_select``: fill a token budget with the best-quality
  documents — the greedy knapsack every data-mix spec ("200 B tokens of
  web, best-first") runs.  Implemented WITHOUT a global sort: a bounded
  per-quality-bucket aggregate finds the boundary bucket, and only that
  bucket (1/``n_buckets`` of the corpus) is ordered exactly.
- ``importance_weights``: hashed-/vocab-n-gram importance sampling log
  ratios (Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling"): score every raw document by how much its
  bigram distribution looks like a target domain vs the raw corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import WORD_RE


def token_budget_select(
    df: DataFrame,
    budget: int,
    quality_col: str = "quality_ppm",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    bucket_width: int = 1000,
) -> DataFrame:
    """Greedy token-budget selection: take documents in (quality DESC,
    id ASC) order while the running token total stays ≤ ``budget``.

    Semantically identical to ``SUM(tokens) OVER (ORDER BY quality DESC,
    id) <= budget`` — but that window is a GLOBAL SORT of the corpus,
    which is exactly what a 100 TB selection job cannot afford.  Instead:

    1. one aggregate pass buckets quality (ppm // ``bucket_width`` →
       ≤ 1e6/width + 1 buckets, a bounded driver collect),
    2. a driver prefix-sum over the bucket totals finds the single
       BOUNDARY bucket where the budget runs out — every bucket above it
       is included wholesale with no ordering at all,
    3. only the boundary bucket's rows (≈ corpus/n_buckets) are sorted
       exactly; a window cumsum spends the remaining budget inside it.

    The greedy order never skips past an unaffordable document to a
    cheaper one below it (cumulative-inclusive ≤ budget semantics), so
    the two-pass plan reproduces the global window bit-for-bit.

    ``quality_col`` must be a non-negative integer ppm (≤ 1e6) — the
    contract every quality scorer in this engine already meets."""
    q, tk = F.col(quality_col), F.col(tokens_col)
    qb = (q / F.lit(bucket_width)).cast("bigint").alias("qb")
    levels = sorted(
        df.groupBy(qb).agg(F.sum(tk).alias("toks")).collect(),
        key=lambda r: -r["qb"],
    )
    running = 0
    boundary, rem = None, 0
    for r in levels:
        if running + r["toks"] > budget:
            boundary, rem = r["qb"], budget - running
            break
        running += r["toks"]
    cols = [F.col(id_col), q.alias(quality_col), tk.alias(tokens_col)]
    if boundary is None:  # whole corpus fits
        return df.select(*cols).orderBy(F.desc(quality_col), F.asc(id_col))
    full = df.where((q / bucket_width).cast("bigint") > boundary).select(*cols)
    from pyspark.sql import Window as W

    w = W.orderBy(F.desc(quality_col), F.asc(id_col)).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    edge = (
        df.where((q / bucket_width).cast("bigint") == boundary)
        .select(*cols)
        .withColumn("_cum", F.sum(tokens_col).over(w))
        .where(F.col("_cum") <= rem)
        .drop("_cum")
    )
    return full.unionByName(edge).orderBy(F.desc(quality_col), F.asc(id_col))


def rrf_fuse(
    ranked: dict[str, DataFrame],
    k: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N retrieval
    systems' ranked lists: ``rrf_ppm = Σ_systems ⌊1e6 / (k + rank)⌋``,
    integer division so the fused score is EXACT and engine-portable.

    ``ranked`` maps system name → a ``(query_id, doc_id, rank)`` frame
    (rank 1-based, top-bounded by the caller — candidate lists, not
    corpora).  Systems are merged with full-outer joins in sorted-name
    order; a document absent from a system's list contributes 0, the
    standard RRF treatment.  Each system's rank survives in the output as
    ``<name>_rank`` (NULL when absent) so downstream can attribute the
    fusion.  The joins are candidate-list-sized — at serving scale these
    are k·queries rows, never corpus-shaped."""
    names = sorted(ranked)
    fused = None
    for name in names:
        part = ranked[name].select(
            query_col, id_col, F.col("rank").alias(f"{name}_rank")
        )
        if fused is None:
            fused = part
        else:
            fused = fused.join(part, [query_col, id_col], "full_outer")
    score = None
    for name in names:
        term = F.coalesce(
            F.expr(f"1000000 div ({k} + {name}_rank)"), F.lit(0)
        )
        score = term if score is None else score + term
    return fused.withColumn("rrf_ppm", score.cast("bigint"))


def doc_bigrams(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, bigram) token stream: adjacent lowercase-word pairs joined by
    one space — pure codegen projection + generate, no shuffle.

    The word array is materialized in its OWN projection before the pair
    lambda touches it: referencing the ``regexp_extract_all`` expression
    from inside a higher-order-function lambda defeats Catalyst's
    common-subexpression elimination, re-running the regex scan per array
    element — measured 10.4 s → 1.9 s on the sf0.1 DSIR entry.  The
    pairing itself is ``zip_with`` over the two shifted slices, each
    evaluated once."""
    ws = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0))
    w = df.select(F.col(id_col), ws.alias("_ws"))
    n1 = F.greatest(F.size(F.col("_ws")) - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(F.col("_ws"), 1, n1),
        F.slice(F.col("_ws"), 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return w.select(F.col(id_col), F.explode(grams).alias("bigram"))


def dsir_lambda_table(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 512,
) -> DataFrame:
    """The trainable half of ``importance_weights``: the ``(bigram,
    lam_ppm)`` log-ratio table learned from a reference corpus.  Split
    out so a streaming scorer can train it ONCE, persist it, and apply
    it per micro-batch (streaming/structured.py:run_curation_stream)."""
    from ..session import local_df

    grams = doc_bigrams(df, text_col, id_col)
    flags = df.select(id_col, target.cast("boolean").alias("_tgt"))
    g = grams.join(flags, id_col)
    counts = g.groupBy("bigram").agg(
        F.count("*").alias("raw_cnt"),
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("tgt_cnt"),
    )
    # the vocab is a bounded TakeOrdered result (≤ vocab_size rows) that
    # two consumers need (the λ projection AND its totals) — referencing
    # the lazy frame twice re-runs the corpus bigram aggregate per
    # consumer (Spark does not CSE common subtrees outside exchange
    # reuse). Collect it once; totals become exact-integer literals and
    # the λ math stays a Spark-side projection over the LocalRelation
    # (JVM ln — same bits the distributed spelling produced).
    vrows = sorted(
        counts.orderBy(F.desc("raw_cnt"), F.asc("bigram")).limit(vocab_size).collect(),
        key=lambda r: (-r["raw_cnt"], r["bigram"]),
    )
    raw_tot = sum(r["raw_cnt"] for r in vrows)
    tgt_tot = sum(r["tgt_cnt"] for r in vrows)
    vocab = local_df(
        df.sparkSession,
        [(r["bigram"], r["raw_cnt"], r["tgt_cnt"]) for r in vrows],
        "bigram string, raw_cnt bigint, tgt_cnt bigint",
    )
    tots = local_df(
        df.sparkSession,
        [(raw_tot, tgt_tot, len(vrows))],
        "raw_tot bigint, tgt_tot bigint, v bigint",
    )
    return (
        vocab.crossJoin(F.broadcast(tots))
        .withColumn(
            "lam_ppm",
            F.floor(
                F.lit(1e6)
                * (
                    F.log(
                        (F.col("tgt_cnt") + F.lit(0.5))
                        / (F.col("tgt_tot") + F.lit(0.5) * F.col("v"))
                    )
                    - F.log(
                        (F.col("raw_cnt") + F.lit(0.5))
                        / (F.col("raw_tot") + F.lit(0.5) * F.col("v"))
                    )
                )
            ).cast("bigint"),
        )
        .select("bigram", "lam_ppm")
    )


def dsir_score(
    df: DataFrame,
    lam: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned λ table to a corpus (or micro-batch): per-doc
    ``dsir_ppm = Σ count_f · λ_f`` — exact integer fold, broadcast join,
    O(batch) with no reference re-scan."""
    grams = doc_bigrams(df, text_col, id_col)
    per_doc = (
        grams.join(F.broadcast(lam), "bigram")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feat"),
            F.sum("lam_ppm").cast("bigint").alias("dsir_ppm"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feat", F.lit(0)).cast("bigint").alias("n_feat"),
            F.coalesce("dsir_ppm", F.lit(0)).cast("bigint").alias("dsir_ppm"),
        )
    )


def importance_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 512,
) -> DataFrame:
    """DSIR-style importance log-ratios over a learned bigram vocabulary.

    For each document, ``dsir_ppm = Σ_f count_f · λ_f`` where
    ``λ_f = ppm⌊ln p̂_target(f) − ln p̂_raw(f)⌋`` with add-half (Laplace)
    smoothed feature distributions — documents whose bigrams look like
    the ``target`` domain (a boolean Column over ``df``'s rows, e.g.
    ``F.col("lang") == "en"``) score high; resampling by these weights is
    the DSIR selection step (Xie et al. 2023).

    The published method hashes n-grams into a fixed bucket space; this
    implementation learns a top-``vocab_size`` bigram vocabulary instead
    (rank by raw count DESC, bigram ASC) — the same bounded feature
    space, but exactly reproducible by any engine without sharing a hash
    function (swap the vocab join for ``pmod(xxhash64(bigram), B)`` to
    recover the hashed variant).  Plan shape: one bigram aggregate
    (map-side combined), a TakeOrdered vocab (never a full sort), one
    broadcast-joined per-(feature) conditional count pass — λ is ppm
    integer, so the per-document fold is exact integer arithmetic and
    aggregation order cannot perturb results."""
    lam = dsir_lambda_table(df, target, text_col, id_col, vocab_size)
    return dsir_score(df, lam, text_col, id_col)


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates across
    splits: every near-dup CLUSTER moves as a unit, keyed by the cluster
    representative's content hash.

    A plain content-hash split (``ops_hash_split``) keeps exact
    duplicates together (same text → same bucket) but scatters NEAR
    duplicates — a train doc's paraphrase lands in test and inflates
    eval.  Here the verified near-dup ``pairs`` are resolved to
    connected components (functions/dedup.py:duplicate_clusters —
    adaptive union-find / min-label propagation), and the split bucket
    is computed from the REPRESENTATIVE's md5, so all members inherit
    one assignment.  Singletons fall back to their own content hash,
    which equals the representative rule (they are their own cluster).

    Plan shape: the cluster map is pair-graph-sized (LSH survivors) —
    broadcast both directions; representative buckets come from one
    corpus scan semi-joined to the (tiny) representative id set.  The
    corpus itself is never shuffled.  md5-prefix mod 100 is the
    cross-engine-stable bucket (same rule as ``ops_hash_split``)."""
    from .dedup import duplicate_clusters

    # coalesce: md5(NULL) is NULL, which would fall through every when()
    # branch to 'test' AND detach cluster members from a NULL-text
    # representative; the sequential mirror maps missing text to '' too
    bucket_of = F.expr(
        f"CAST(conv(substr(md5(coalesce({text_col}, '')), 1, 8), 16, 10) AS BIGINT) % 100"
    )
    clusters = duplicate_clusters(pairs).withColumnRenamed("id", id_col)
    rep_ids = clusters.select(F.col("cluster_id").alias("_rep")).distinct()
    rep_bucket = (
        df.join(F.broadcast(rep_ids), F.col(id_col) == F.col("_rep"))
        .select(F.col(id_col).alias("_repc"), bucket_of.alias("_rep_bucket"))
    )
    withc = (
        df.select(id_col, bucket_of.alias("_own_bucket"))
        .join(F.broadcast(clusters), id_col, "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col(id_col)))
        .join(
            F.broadcast(rep_bucket),
            F.col("cluster_id") == F.col("_repc"),
            "left",
        )
        .withColumn("bucket", F.coalesce("_rep_bucket", "_own_bucket"))
    )
    split = (
        F.when(F.col("bucket") < train_pct, "train")
        .when(F.col("bucket") < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return withc.select(
        F.col(id_col),
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
        split.alias("split"),
    )


def hashed_lambda_table(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """The trainable half of ``importance_weights_hashed``: the
    ``(f, lam_ppm)`` log-ratio table over the fixed hashed bucket space.
    The bucket count aggregate is ≤ ``n_buckets`` rows (bounded collect);
    λ is computed DRIVER-SIDE in Python over the exact integer counts so
    a sequential mirror reproduces it bit-for-bit (the mirror shares the
    validated pure-Python XXH64 and the same ``math.log`` calls).  Every
    bucket participates in smoothing (V = ``n_buckets``), including
    empty ones — so any FUTURE bigram already has a bucket and a λ,
    which is what makes this the natural variant for unbounded streams
    (streaming/structured.py:run_curation_stream)."""
    import math

    from ..session import local_df

    grams = doc_bigrams(df, text_col, id_col)
    bucket = F.pmod(F.xxhash64("bigram"), F.lit(n_buckets)).cast("int")
    flags = df.select(id_col, target.cast("boolean").alias("_tgt"))
    counts = (
        grams.join(flags, id_col)
        .groupBy(bucket.alias("f"))
        .agg(
            F.count("*").alias("raw_cnt"),
            F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("tgt_cnt"),
        )
        .collect()
    )
    raw = {r["f"]: r["raw_cnt"] for r in counts}
    tgt = {r["f"]: r["tgt_cnt"] for r in counts}
    raw_tot, tgt_tot = sum(raw.values()), sum(tgt.values())
    rows = []
    for f in range(n_buckets):
        lam = math.log((tgt.get(f, 0) + 0.5) / (tgt_tot + 0.5 * n_buckets)) - math.log(
            (raw.get(f, 0) + 0.5) / (raw_tot + 0.5 * n_buckets)
        )
        rows.append((f, math.floor(lam * 1e6)))
    return local_df(df.sparkSession, rows, "f int, lam_ppm bigint")


def hashed_dsir_score(
    df: DataFrame,
    lam: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Apply a (possibly persisted) hashed λ table: every bigram has a
    bucket, so ``n_feat`` counts ALL bigrams — no vocabulary cut, no
    out-of-vocab zero-contribution path."""
    grams = doc_bigrams(df, text_col, id_col).select(
        F.col(id_col),
        F.pmod(F.xxhash64("bigram"), F.lit(n_buckets)).cast("int").alias("f"),
    )
    per_doc = (
        grams.join(F.broadcast(lam), "f")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feat"),
            F.sum("lam_ppm").cast("bigint").alias("dsir_ppm"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feat", F.lit(0)).cast("bigint").alias("n_feat"),
            F.coalesce("dsir_ppm", F.lit(0)).cast("bigint").alias("dsir_ppm"),
        )
    )


def importance_weights_hashed(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR importance log-ratios over HASHED bigram features — the form
    actually published (Xie et al. 2023): bigrams hash into a fixed
    ``n_buckets`` space via ``pmod(xxhash64(bigram), B)``, so there is no
    vocabulary to learn, store, or ship.  Collisions blur probability
    mass (the hashing-trick tradeoff) but the estimator is unbiased in
    expectation; the learned-vocab variant (``importance_weights``) is
    the collision-free alternative when the reference corpus is
    available to mine.  Composes ``hashed_lambda_table`` (train) with
    ``hashed_dsir_score`` (apply)."""
    lam = hashed_lambda_table(df, target, text_col, id_col, n_buckets)
    return hashed_dsir_score(df, lam, text_col, id_col, n_buckets)


def bfd_pack(
    docs: DataFrame,
    budget: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    shard_rows: int = 1_000_000,
) -> DataFrame:
    """Best-fit-decreasing sequence packing — the padding-efficiency
    upgrade over concat-and-chop (ops_token_packing): chop splits
    documents across window boundaries; BFD keeps every document WHOLE
    and fills bins greedily (docs sorted by token count DESC, each
    placed into the FULLEST bin that still fits, else a new bin) — the
    classic 11/9·OPT + 6/9 bin-packing guarantee, and in LLM practice
    the fill-rate difference between ~75% and ~95% non-padding tokens
    when documents must not straddle sequences (e.g. contrastive or
    instruction tuning where attention must not cross documents).

    Determinism contract (oracle-mirrored): sort (n_tok DESC, id ASC);
    "fullest fitting" ties break to the LOWEST bin id; bins numbered by
    creation order per stratum; docs with n_tok >= budget occupy a bin
    alone capped at budget (long docs are truncated upstream).

    Scale shape: one corpus scan computes (id, stratum, n_tok) — the
    only pass over text (the per-stratum row counts that size the
    sub-sharding read just the stratum column, so column pruning keeps
    that pre-pass off the text bytes); packing then runs on the
    TOKEN-COUNT table (rows = documents, bytes = 24/doc) via
    ``applyInPandas``.  A stratum larger than ``shard_rows`` documents
    is AUTOMATICALLY sub-sharded on a salt —
    ``pmod(xxhash64(id), ceil(rows / shard_rows))`` — so a corpus
    dominated by one language can never serialize onto a single task:
    each (stratum, shard) packs independently (industry practice; the
    fill-rate loss is ~1 partially-filled bin per shard) and bins are
    renumbered per stratum in (shard, local-bin) order by a
    window over the BIN table (thousands of rows, not documents).
    With one shard the renumber is the identity, so the unsharded
    result — and the oracle compare — is unchanged.

    The per-shard loop is O(docs·log docs): the classic best-fit
    structure indexed by remaining capacity (buckets[rem] = min-heap of
    bin ids, plus a sorted list of the ≤ budget+1 nonempty rem values)
    replaces the O(docs·bins) linear scan — "fullest fitting bin, ties
    to lowest bin id" is exactly "minimum remaining capacity ≥ eff,
    then heap-min bin id", so the placement sequence is bit-identical
    to the linear scan's."""
    from .text import token_count

    toks = docs.select(
        F.col(id_col), F.col(stratum_col), token_count(F.col(text_col)).alias("n_tok")
    )
    # per-stratum doc counts — reads ONLY the stratum column (pruned scan)
    shards_per_stratum = (
        docs.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("_rows"))
        .select(
            F.col(stratum_col),
            F.greatest(
                F.lit(1), F.ceil(F.col("_rows") / F.lit(int(shard_rows)))
            ).alias("_n_shards"),
        )
    )
    toks = toks.join(F.broadcast(shards_per_stratum), on=stratum_col).withColumn(
        "_shard", F.pmod(F.xxhash64(F.col(id_col)), F.col("_n_shards")).cast("long")
    )

    from pyspark.sql import types as T

    pack_schema = T.StructType(
        [
            toks.schema[stratum_col],
            T.StructField("_shard", T.LongType()),
            T.StructField("seq_id", T.LongType()),
            T.StructField("n_docs", T.LongType()),
            T.StructField("seq_tokens", T.LongType()),
            T.StructField("fill_ppm", T.LongType()),
        ]
    )

    def pack(pdf):
        import heapq
        from bisect import bisect_left, insort

        import pandas as pd

        pdf = pdf.sort_values(["n_tok", id_col], ascending=[False, True])
        loads: list[int] = []
        ndocs: list[int] = []
        buckets: dict[int, list[int]] = {}  # rem capacity -> min-heap of bin ids
        rems: list[int] = []  # sorted distinct nonempty rem values (≤ budget+1)
        for tok in pdf["n_tok"]:
            eff = min(int(tok), budget)
            # fullest fitting = minimum remaining capacity >= eff;
            # ties (same rem ⇒ same load) -> lowest bin id = heap min
            i = bisect_left(rems, eff)
            if i < len(rems):
                rem = rems[i]
                heap = buckets[rem]
                b = heapq.heappop(heap)
                if not heap:
                    del buckets[rem]
                    rems.pop(i)
                loads[b] += eff
                ndocs[b] += 1
                nrem = rem - eff
            else:
                b = len(loads)
                loads.append(eff)
                ndocs.append(1)
                nrem = budget - eff
            nheap = buckets.get(nrem)
            if nheap is None:
                buckets[nrem] = [b]
                insort(rems, nrem)
            else:
                heapq.heappush(nheap, b)
        stratum = pdf[stratum_col].iloc[0] if len(pdf) else None
        shard = int(pdf["_shard"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame(
            {
                stratum_col: [stratum] * len(loads),
                "_shard": [shard] * len(loads),
                "seq_id": range(len(loads)),
                "n_docs": ndocs,
                "seq_tokens": loads,
                "fill_ppm": [ld * 1_000_000 // budget for ld in loads],
            }
        )

    packed = toks.groupBy(stratum_col, "_shard").applyInPandas(
        pack, schema=pack_schema
    )
    # renumber bins per stratum in (shard, local-bin) order: identity when a
    # stratum has one shard; the window runs over BINS, not documents
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy("_shard", "seq_id")
    return packed.select(
        F.col(stratum_col),
        (F.row_number().over(w) - F.lit(1)).cast("long").alias("seq_id"),
        "n_docs",
        "seq_tokens",
        "fill_ppm",
    )
