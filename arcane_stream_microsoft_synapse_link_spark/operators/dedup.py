"""Latest-version-wins deduplication — the CDC primitive (operator B8).

Reference behavior (inferred from the integration test's observable
contract, StreamRunner.scala:206-233): within a batch, multiple change rows
per merge key collapse to the one with the highest row version; re-uploads
of identical rows merge without effect.

Version ordering: ``versionnumber`` when present (delete rows DO carry it —
a globally higher value, SynapseMetadata.scala:21-22 — so a delete that
arrives after an update in the same batch wins), with ``sysrowversion`` as
a fallback for rows where ``versionnumber`` is absent. [inferred]

Scale note: one shuffle on the merge key (window partition). At 100 TB the
key space is huge but per-key row counts are tiny (change batches), so
there is no skew concern; AQE handles stragglers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_by_version(
    df: DataFrame,
    key: str = "arcane_merge_key",
    version_col: str = "versionnumber",
    fallback_version_col: str | None = "sysrowversion",
) -> DataFrame:
    has_version = version_col in df.columns
    has_fallback = bool(fallback_version_col) and fallback_version_col in df.columns
    order = []
    if has_version and has_fallback:
        order.append(F.desc_nulls_last(F.coalesce(F.col(version_col), F.col(fallback_version_col))))
        order.append(F.desc_nulls_last(fallback_version_col))
    elif has_version:
        order.append(F.desc_nulls_last(version_col))
    elif has_fallback:
        order.append(F.desc_nulls_last(fallback_version_col))
    else:
        # no version column at all: keep the batch as-is so the merge's
        # documented last-write-wins fallback (merge.py) decides
        return df
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
