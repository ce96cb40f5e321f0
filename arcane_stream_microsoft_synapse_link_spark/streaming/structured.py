"""Structured Streaming CDC runner: synapse_link source → foreachBatch merge.

The fully idiomatic Spark rewrite of the reference's streaming graph
(SURVEY.md §3.1): ``readStream.format("synapse_link")`` replaces the ZIO
poll loop, ``foreachBatch`` replaces StagingProcessor→MergeBatchProcessor,
the checkpoint replaces the watermark store (B11 — the folder-name offset
is committed by Spark after each successful micro-batch), and
``Trigger.ProcessingTime(changeCaptureInterval)`` / ``availableNow``
replace change-capture vs batch-backfill scheduling
(crd-microsoft-synapse-link-beta.yaml execution backends).

``StreamRunner`` (runner.py) remains as the driver-side fallback loop the
survey's M3 plan calls for; both share the same transform + merge chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import cdc_merge
from ..sources.stream import register
from ..streaming.runner import StreamRunner, StreamSpec


def read_stream(spark: SparkSession, spec: StreamSpec) -> DataFrame:
    register(spark)
    return (
        spark.readStream.format("synapse_link")
        .option("path", spec.source_root)
        .option("entity", spec.entity_name)
        .load()
    )


def run_structured(
    spark: SparkSession,
    spec: StreamSpec,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Run the CDC stream; returns the StreamingQuery.

    ``available_now=True`` drains everything pending then stops (the test /
    cron-batch mode); ``False`` runs continuously at the change-capture
    interval. Each micro-batch applies the same prepare→dedup→version-
    guarded-merge chain as the batch runner, then commits a snapshot and
    the sink-side watermark — merge idempotency makes replay of an
    uncommitted batch a no-op (exactly-once, SURVEY.md §7 item 4).
    """
    runner = StreamRunner(spark, spec)
    if spec.metrics_path:
        from .observability import jsonl_progress_listener

        spark.streams.addListener(jsonl_progress_listener(spec.metrics_path))

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        if batch_df.isEmpty():
            return
        wm = batch_df.agg(F.max("_batch_folder")).first()[0]
        runner._merge_folder_batch(
            batch_df.drop("_batch_folder"), up_to_folder=wm or f"batch-{batch_id}"
        )

    writer = read_stream(spark, spec).writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{int(spec.change_capture_interval_s)} seconds")
    return writer.start()


def windowed_event_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    delay: str = "30 minutes",
) -> DataFrame:
    """Event-time tumbling-window counts with a late-data watermark
    (SURVEY.md §2.E extension surface — the reference has no windowed
    aggregation; Spark provides it natively).

    On a streaming DataFrame the watermark bounds state (windows older
    than max_event_time - delay are finalized and evicted) and drops rows
    arriving later than the delay; on a batch DataFrame ``withWatermark``
    is a no-op and this is exactly q26's tumbling aggregation — the
    parity test exploits that equivalence.
    """
    from pyspark.sql import functions as F

    return (
        df.withWatermark(ts_col, delay)
        .groupBy(F.window(ts_col, window))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("window.start").alias("ws"), "cnt")
    )


def run_dedup_stream(
    spark: SparkSession,
    source: DataFrame,
    work_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming corpus curation: near-dup-filter every micro-batch of
    documents against the ACCUMULATED band index before admission — the
    streaming twin of ``functions.dedup.incremental_near_duplicates``.

    Per micro-batch (foreachBatch):

    1. sign the batch and probe the stored ``(band, bh, idx_id)`` index
       (only the batch is signed — the accumulated corpus is never
       re-signed, so per-batch cost is O(batch), the property that makes
       continuous intake dedup viable at a growing 100 TB corpus);
    2. exact-Jaccard-verify candidates and record hits (``hits/``);
    3. append survivors to ``corpus/`` and their band rows to
       ``band_index/`` (bucket the index table by ``(band, bh)`` in a
       production layout so step 1's probe prunes partitions).

    Exactly-once caveat: the three appends are not one atomic commit — a
    crash between them can re-admit a batch's rows on replay.  The CDC
    path solves this with snapshot-pointer commits (``VersionedTable``);
    this helper keeps plain appends for the demo pipeline and documents
    the difference.  Returns the started StreamingQuery.
    """
    import os

    from pyspark.sql import functions as F

    from ..functions.dedup import incremental_near_duplicates, minhash_band_index

    idx_dir = os.path.join(work_dir, "band_index")
    corpus_dir = os.path.join(work_dir, "corpus")
    hits_dir = os.path.join(work_dir, "hits")

    def step(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.select(id_col, text_col).localCheckpoint()
        if os.path.isdir(idx_dir):
            index = spark.read.parquet(idx_dir)
            corpus = spark.read.parquet(corpus_dir)
            hits = incremental_near_duplicates(
                batch_df, index, corpus, threshold, text_col, id_col
            ).localCheckpoint()
            hits.write.mode("append").parquet(hits_dir)
            dup_ids = hits.select(F.col("id_a").alias(id_col)).distinct()
            kept = batch_df.join(dup_ids, id_col, "left_anti").localCheckpoint()
        else:
            kept = batch_df
        kept.write.mode("append").parquet(corpus_dir)
        minhash_band_index(kept, text_col, id_col).write.mode("append").parquet(idx_dir)

    return (
        source.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_decontaminate_stream(
    spark: SparkSession,
    source: DataFrame,
    benchmark: DataFrame,
    work_dir: str,
    checkpoint_dir: str,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming decontamination: filter every micro-batch of incoming
    documents against a STATIC benchmark n-gram set before admission —
    the streaming twin of ``functions.dedup.decontaminate`` and the
    intake-side complement of ``run_dedup_stream`` (whose index grows;
    this one's reference set is fixed, so state never accumulates).

    The benchmark grams are computed ONCE, materialized to
    ``bench_grams/`` and re-read per batch (a foreachBatch closure
    holding a broadcast variable would leak it for the stream's
    lifetime; re-reading parquet lets each batch's broadcast be GC'd).
    Per micro-batch: gram-explode the batch, left-semi against the gram
    set (broadcast — an eval suite is tiny next to the intake), append
    contaminated ids to ``hits/`` and survivors to ``clean/``.  Per-batch
    cost is O(batch) with zero cross-batch state — the shape that
    survives an unbounded stream.
    """
    import os

    from pyspark.sql import functions as F

    from ..functions.dedup import words
    from ..functions.text import word_ngram_strings

    grams_dir = os.path.join(work_dir, "bench_grams")
    clean_dir = os.path.join(work_dir, "clean")
    hits_dir = os.path.join(work_dir, "hits")

    def exploded(d: DataFrame) -> DataFrame:
        return d.select(F.col(id_col), words(F.col(text_col)).alias("_w")).select(
            F.col(id_col), F.explode(word_ngram_strings(F.col("_w"), n)).alias("gram")
        )

    # Reuse only a COMPLETE materialization: Spark writes _SUCCESS last, so
    # a crash mid-write leaves a partial directory without it.  Accepting
    # such a directory would silently under-filter every subsequent batch
    # (contaminated docs admitted to clean/); rewriting into a fresh dir
    # and atomically renaming keeps the check crash-safe too.
    if not os.path.exists(os.path.join(grams_dir, "_SUCCESS")):
        import shutil

        tmp_dir = grams_dir + "._tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        exploded(benchmark).select("gram").distinct().write.mode("overwrite").parquet(
            tmp_dir
        )
        shutil.rmtree(grams_dir, ignore_errors=True)
        os.replace(tmp_dir, grams_dir)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.select(id_col, text_col).localCheckpoint()
        bench = F.broadcast(spark.read.parquet(grams_dir))
        hit_ids = (
            exploded(batch_df)
            .join(bench, "gram", "left_semi")
            .select(id_col)
            .distinct()
            .localCheckpoint()
        )
        hit_ids.write.mode("append").parquet(hits_dir)
        batch_df.join(hit_ids, id_col, "left_anti").write.mode("append").parquet(
            clean_dir
        )

    return (
        source.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_media_dedup_stream(
    spark: SparkSession,
    source: DataFrame,
    work_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 6,
    id_col: str = "media_id",
):
    """Streaming MULTIMODAL dedup: perceptual-dHash-filter every
    micro-batch of raw images against the ACCUMULATED hash index before
    admission — the media twin of ``run_dedup_stream`` (text) built from
    the r6 pieces: ``functions.multimodal.perceptual_hashes`` for the
    64-bit signatures, the SimHash-style 8-bit banding for index probes.

    Per micro-batch (foreachBatch):

    1. hash ONLY the batch's rows (Arrow mapInPandas — the accumulated
       corpus is never re-decoded or re-hashed, so per-batch cost is
       O(batch)): images get dHash, audio gets the energy-contour
       fingerprint; the two families live in ONE index separated by a
       ``kind`` column so an image can never match an audio clip;
    2. probe the stored ``(kind, band, chunk, idx_id, idx_phash)`` index
       with the batch's bands, verify exact Hamming ≤ ``max_hamming`` on
       the candidates, record hits (``hits/``: id_a = new, id_b =
       matched);
    3. append surviving media rows to ``corpus/`` (rows with no
       perceptual hash — video here — are admitted untouched) and the
       survivors' band rows to ``phash_index/`` (bucket by
       ``(kind, band, chunk)`` in a production layout so probes prune).

    Same scope notes as ``run_dedup_stream``: the index probe catches
    cross-batch duplicates (within-batch dups of a single micro-batch are
    the batch job ``image_near_duplicates``'s job), and the three appends
    are plain appends, not one atomic commit — the CDC path's
    snapshot-pointer commit is the exactly-once answer.  Returns the
    started StreamingQuery.
    """
    import os

    from pyspark.sql import functions as F

    from ..functions.multimodal import audio_fingerprints, perceptual_hashes

    idx_dir = os.path.join(work_dir, "phash_index")
    corpus_dir = os.path.join(work_dir, "corpus")
    hits_dir = os.path.join(work_dir, "hits")
    band_bits, nbands = 8, 8
    mask = (1 << band_bits) - 1

    def bands(h: DataFrame, id_alias: str, hash_alias: str) -> DataFrame:
        return h.select(
            F.col(id_col).alias(id_alias),
            "kind",
            F.col("phash").alias(hash_alias),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftright(F.col("phash"), b * band_bits)
                            .bitwiseAND(F.lit(mask))
                            .alias("chunk"),
                        )
                        for b in range(nbands)
                    ]
                )
            ).alias("bb"),
        ).select(id_alias, "kind", hash_alias, "bb.band", "bb.chunk")

    def step(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint()
        img_h = perceptual_hashes(batch_df, id_col).select(
            id_col, F.lit("img").alias("kind"), F.col("dhash").alias("phash")
        )
        aud_h = audio_fingerprints(batch_df, id_col=id_col).select(
            id_col, F.lit("aud").alias("kind"), F.col("ahash64").alias("phash")
        )
        h = img_h.unionByName(aud_h).localCheckpoint()
        if os.path.isdir(idx_dir):
            idx = spark.read.parquet(idx_dir)
            hits = (
                bands(h, "id_a", "phash_a")
                .join(idx, ["kind", "band", "chunk"])
                .where(F.col("id_a") != F.col("idx_id"))
                .select(
                    "id_a",
                    F.col("idx_id").alias("id_b"),
                    F.bit_count(
                        F.col("phash_a").bitwiseXOR(F.col("idx_phash"))
                    ).alias("hamming"),
                )
                .where(F.col("hamming") <= max_hamming)
                .distinct()
                .localCheckpoint()
            )
            hits.write.mode("append").parquet(hits_dir)
            dup_ids = hits.select(F.col("id_a").alias(id_col)).distinct()
            kept = batch_df.join(dup_ids, id_col, "left_anti").localCheckpoint()
            kept_h = h.join(dup_ids, id_col, "left_anti")
        else:
            kept, kept_h = batch_df, h
        kept.write.mode("append").parquet(corpus_dir)
        bands(kept_h, "idx_id", "idx_phash").write.mode("append").parquet(idx_dir)

    return (
        source.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_ann_index_stream(
    spark: SparkSession,
    source: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    n_centroids: int = 16,
    m: int = 8,
    codes: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Streaming ANN index maintenance: fold every micro-batch of new
    embeddings into the PERSISTED IVF-PQ index — the streaming form of
    ``similarity.ivfpq_fold_in`` and the serving-side complement of the
    dedup intake streams.

    Per micro-batch (foreachBatch):

    - first batch ever: train the model on it (``ivfpq_build``) and
      persist centroids + codebooks + cell-partitioned codes
      (``ivfpq_save``);
    - every later batch: load the FROZEN model (centroids/codebooks only
      — the historical codes stay on disk untouched), assign +
      residual-encode ONLY the batch, and append its code rows into the
      cell partitioning.  Per-batch cost is O(batch); queries keep
      serving from the same directory via ``ivfpq_load`` +
      ``ivfpq_probe`` between (or during) appends.

    Model staleness is the standard production trade: centroids trained
    on crawl 1 quantize later crawls slightly worse until an offline
    retrain cadence job rebuilds the index — the FAISS deployment shape.
    Returns the started StreamingQuery.
    """
    import os

    from ..functions.similarity import (
        _pq_encode,
        ivf_assign,
        ivfpq_build,
        ivfpq_load,
        ivfpq_save,
    )

    def step(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.select(id_col, vec_col).localCheckpoint()
        if not os.path.exists(os.path.join(index_dir, "params.json")):
            idx = ivfpq_build(
                batch_df, n_centroids=n_centroids, m=m, codes=codes, seed=seed,
                id_col=id_col, vec_col=vec_col,
            )
            ivfpq_save(idx, index_dir)
            return
        idx = ivfpq_load(spark, index_dir)
        assigned = ivf_assign(batch_df, idx.cents_df, id_col, vec_col)
        new_codes = _pq_encode(assigned, idx.cent, idx.cb, id_col, vec_col)
        new_codes.write.mode("append").partitionBy("centroid_id").parquet(
            os.path.join(index_dir, "codes")
        )

    return (
        source.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_curation_stream(
    spark: SparkSession,
    source: DataFrame,
    reference: DataFrame,
    target,
    work_dir: str,
    checkpoint_dir: str,
    min_score_ppm: int = 450000,
    min_dsir_ppm: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    dsir_variant: str = "vocab",
):
    """Streaming curation gate: score every micro-batch of incoming
    documents with BOTH trained curation models — the IRLS quality
    classifier (functions/classifier.py) and the DSIR importance λ table
    (functions/curation.py) — and route to ``accept/`` or ``reject/``
    with the scores attached.  The intake-side twin of
    ``ops_quality_classifier`` + ``ops_importance_weights``: models are
    trained ONCE from the static ``reference`` corpus (``target`` is the
    seed-domain boolean Column over its rows) and persisted under
    ``curation_model/``; every batch after that is a broadcast-join +
    projection — O(batch), zero cross-batch state growth, and a restart
    reuses the persisted model byte-for-byte (same atomic-rename +
    ``_SUCCESS`` discipline as ``run_decontaminate_stream``).

    A doc is accepted when ``score_ppm ≥ min_score_ppm`` AND
    ``dsir_ppm ≥ min_dsir_ppm``; both scores are written either way, so
    downstream can re-threshold rejected docs without re-scoring.

    ``dsir_variant``: ``"vocab"`` persists the learned-bigram λ table;
    ``"hashed"`` persists the fixed 1024-bucket λ (the published DSIR
    form) — the natural choice for unbounded streams, since every future
    bigram already has a bucket and a λ, while an out-of-vocab bigram
    under ``"vocab"`` simply contributes 0."""
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    from ..functions.classifier import (
        classifier_scores,
        irls_train,
        text_feature_frame,
    )
    from ..functions.curation import (
        dsir_lambda_table,
        dsir_score,
        hashed_dsir_score,
        hashed_lambda_table,
    )

    model_dir = os.path.join(work_dir, "curation_model")
    lam_dir = os.path.join(model_dir, "lam")
    beta_path = os.path.join(model_dir, "beta.json")
    accept_dir = os.path.join(work_dir, "accept")
    reject_dir = os.path.join(work_dir, "reject")

    if not (
        os.path.exists(os.path.join(lam_dir, "_SUCCESS")) and os.path.exists(beta_path)
    ):
        tmp_dir = model_dir + "._tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir)
        if dsir_variant == "hashed":
            hashed_lambda_table(reference, target, text_col, id_col).write.mode(
                "overwrite"
            ).parquet(os.path.join(tmp_dir, "lam"))
        else:
            dsir_lambda_table(reference, target, text_col, id_col).write.mode(
                "overwrite"
            ).parquet(os.path.join(tmp_dir, "lam"))
        feat = text_feature_frame(
            reference, text_col, id_col, keep=(target.cast("int").alias("label"),)
        )
        beta = irls_train(feat)
        with open(os.path.join(tmp_dir, "beta.json"), "w") as f:
            json.dump(beta, f)
        shutil.rmtree(model_dir, ignore_errors=True)
        os.replace(tmp_dir, model_dir)

    with open(beta_path) as f:
        beta = json.load(f)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.select(id_col, text_col).localCheckpoint()
        lam = spark.read.parquet(lam_dir)
        feat = text_feature_frame(batch_df, text_col, id_col)
        quality = classifier_scores(feat, beta, id_col=id_col)
        if dsir_variant == "hashed":
            dsir = hashed_dsir_score(batch_df, lam, text_col, id_col)
        else:
            dsir = dsir_score(batch_df, lam, text_col, id_col)
        scored = (
            batch_df.join(quality, id_col)
            .join(dsir.select(id_col, "dsir_ppm"), id_col)
            .localCheckpoint()
        )
        ok = (F.col("score_ppm") >= min_score_ppm) & (
            F.col("dsir_ppm") >= min_dsir_ppm
        )
        scored.where(ok).write.mode("append").parquet(accept_dir)
        scored.where(~ok).write.mode("append").parquet(reject_dir)

    return (
        source.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

