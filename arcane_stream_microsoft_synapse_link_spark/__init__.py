"""arcane_stream_microsoft_synapse_link_spark — a PySpark-native analytics & CDC streaming engine.

A from-scratch rebuild of the capabilities of
`SneaksAndData/arcane-stream-microsoft-synapse-link` (reference surveyed in
SURVEY.md) on idiomatic Spark: DataFrame/SQL for the relational surface,
Structured-Streaming-style micro-batching for change capture, and
Arrow-batched pandas UDFs only where built-in operators cannot express the
semantics.

Layout:
    session      SparkSession factory tuned for scale (AQE, broadcast, Arrow)
    catalog      test-table loading helpers
    config       StreamSpec config model (mirrors the reference CRD shape)
    tables       versioned parquet table with atomic pointer swap (merge sink)
    sources/     CDM model.json schema provider + Synapse Link folder source
    operators/   CDC operators: normalize, cast, merge-key, dedup, merge, ...
    functions/   training-data ops: text stats, dedup (minhash/simhash), ANN
    plans/       declared query library (SURVEY.md §2.D Q1-Q25) + oracles
    streaming/   changelog poll runner / backfill orchestration
"""

__version__ = "0.1.0"
