"""Test-table catalog: lazy parquet loaders for the driver-generated tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet per table under an sf dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .session import tune

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _fix_nanos(df: DataFrame) -> DataFrame:
    """Normalize the events.ts column to plain TIMESTAMP regardless of how
    the corpus was written.

    Two physical encodings have been observed across driver corpus
    regenerations: INT64 TIMESTAMP(NANOS) (read as long via
    ``spark.sql.legacy.parquet.nanosAsLong``) and µs TIMESTAMP with
    ``isAdjustedToUTC=false`` (read as TIMESTAMP_NTZ). Both are normalized
    here to TimestampType; the session timezone is UTC, so the NTZ→TZ cast
    preserves the wall-clock value and matches DuckDB's naive reading.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(field.dataType, TimestampNTZType):
            # any NTZ column (not just ts): future corpus regenerations may
            # re-encode other timestamp columns the same way
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


# DataFrames are immutable logical plans bound to their session — safe to
# share across Tables instances. Keyed by (session app id, dir, table) so
# every declared query stops re-reading parquet footers for schema
# inference (10 tables × N queries of pure listing overhead otherwise).
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}


class Tables:
    """Lazy accessor: ``Tables(spark, sf_dir).lineitem`` → DataFrame."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self._spark = tune(spark)
        self._sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        if name not in TABLE_NAMES:
            raise AttributeError(f"unknown table {name!r}")
        key = (self._spark.sparkContext.applicationId, self._sf_dir, name)
        if key not in _DF_CACHE:
            df = self._spark.read.parquet(os.path.join(self._sf_dir, f"{name}.parquet"))
            _DF_CACHE[key] = _fix_nanos(df)
        return _DF_CACHE[key]

    def view(self, name: str) -> str:
        """Register table as a temp view and return its name (for spark.sql)."""
        getattr(self, name).createOrReplaceTempView(name)
        return name
