"""Stream runner: backfill + change-capture micro-batch loop.

The Spark rewrite of the reference's ZIO pipeline (SURVEY.md §3.1-3.2):

    poll changelog (A1) → pending folders (A2/B5) → read+type CSV (A3)
    → normalize (B2) → field selection (B1) → merge key (B4)
    → dedup latest (B8) → CDC merge (B9) + schema evolution (B10)
    → commit snapshot → watermark (B11) → maintenance cadence (C1-C4)

Each batch folder is processed atomically: the snapshot commit lands
before the watermark advances, and the merge is idempotent (dedup makes
re-merge a no-op), so a crash between commit and watermark replays one
folder harmlessly — the exactly-once contract of the reference
(stage→merge→watermark order, StreamRunner.scala:198-233).

Backfill (B13-B17): full-history replay from ``backfill_start`` with
``Overwrite`` (CREATE OR REPLACE analog) or ``Merge`` finalization
(docs/backfill.md:27-47).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import latest_by_version
from ..operators.merge import cdc_merge
from ..operators.transforms import normalize_column_names, select_fields, with_merge_key
from ..sources.synapse import BatchFolder, SynapseLinkSource
from ..tables import VersionedTable


@dataclass
class StreamSpec:
    """Job config — mirrors the reference CRD's meaningful knobs
    (crd-microsoft-synapse.yaml; stream-context-serialized-example.json)."""

    entity_name: str
    source_root: str
    target_root: str
    key_column: str = "Id"
    version_column: str = "versionnumber"
    is_delete_column: str = "IsDelete"
    field_selection_mode: str = "all"  # all | include | exclude
    fields: tuple[str, ...] = ()
    change_capture_interval_s: float = 300.0
    backfill_start: str | None = None
    backfill_behavior: str = "Overwrite"  # Overwrite | Merge
    optimize_batch_threshold: int = 60  # maintenance cadence (C1-C3)
    analyze_batch_threshold: int = 180  # stats cadence (C4)
    snapshots_to_keep: int = 4
    bucket_count: int = 0  # >0 → bucket target snapshots by merge key
    max_folders_per_tick: int = 0  # >0 → B18 static throughput shaping


@dataclass
class RunnerStats:
    batches_merged: int = 0
    folders_seen: list[str] = field(default_factory=list)


class StreamRunner:
    def __init__(self, spark: SparkSession, spec: StreamSpec):
        self.spark = spark
        self.spec = spec
        self.source = SynapseLinkSource(spec.source_root, spec.entity_name)
        self.table = VersionedTable(spec.target_root, bucket_count=spec.bucket_count)
        self.stats = RunnerStats()

    # ---- shared transform chain (B2→B1→B4) -------------------------------
    def _prepare(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        df = normalize_column_names(df)
        df = select_fields(df, self.spec.field_selection_mode, self.spec.fields)
        df = with_merge_key(df, self.spec.key_column)
        # rows without a merge key cannot participate in MERGE; dropping
        # them keeps null-key garbage out of the dedup window
        return df.where(F.col("arcane_merge_key").isNotNull())

    def _target(self) -> DataFrame | None:
        return self.table.read(self.spark) if self.table.exists() else None

    def _merge_folder_batch(self, df: DataFrame, up_to_folder: str) -> None:
        merged = cdc_merge(
            self._target(),
            self._prepare(df),
            version_col=self.spec.version_column,
            is_delete_col=self.spec.is_delete_column,
        )
        self.table.commit(merged)
        self.table.set_watermark(up_to_folder)  # commit THEN watermark
        self.stats.batches_merged += 1
        self._maintenance()

    # ---- backfill (B13-B17) ------------------------------------------------
    def backfill(self) -> int:
        """Full-history replay; returns rows in the finalized target."""
        head = self.source.changelog_head()
        folders = self.source.list_folders(after=self.spec.backfill_start, up_to=head)
        if not folders:
            return 0
        df = self.source.read_folders(self.spark, folders)
        if df is None:
            return 0
        staged = latest_by_version(
            self._prepare(df), version_col=self.spec.version_column
        )
        if self.spec.backfill_behavior == "Overwrite":
            # drop deletes; atomic snapshot replace (B15)
            from pyspark.sql import functions as F

            is_del = F.coalesce(F.col(self.spec.is_delete_column), F.lit(False))
            final = staged.where(~is_del)
            self.table.commit(final)
        else:  # Merge (B16) — non-destructive fold into live target
            final = cdc_merge(
                self._target(),
                staged,
                version_col=self.spec.version_column,
                is_delete_col=self.spec.is_delete_column,
                dedup_staged=False,
            )
            self.table.commit(final)
        self.table.set_watermark(folders[-1].name)
        return self.table.read(self.spark).count()

    # ---- change capture (A1→B11 loop) ---------------------------------------
    def run_once(self) -> int:
        """One poll tick: merge the whole pending folder range as ONE
        deduplicated group, then advance the watermark to the frontier.

        Grouping the range (rather than folder-at-a-time) mirrors the
        reference's observable semantics: a delete and a later stale
        re-upload of the same key inside one capture window must still net
        to a delete (StreamRunner.scala:206-233 — dedup across the group
        picks the delete row via its higher sysrowversion). Per-folder
        schemas survive because folders are read individually and unioned
        by name (watch-list item 3). Returns folders consumed."""
        pending = self.source.pending(self.table.watermark())
        if self.spec.max_folders_per_tick > 0:
            # B18 static admission: cap work per tick (advisedRate analog)
            pending = pending[: self.spec.max_folders_per_tick]
        if not pending:
            return 0
        df = self.source.read_folders(self.spark, pending)
        if df is not None:
            self._merge_folder_batch(df, pending[-1].name)
        else:
            # no data for this entity — still advance the frontier
            self.table.set_watermark(pending[-1].name)
        self.stats.folders_seen.extend(f.name for f in pending)
        return len(pending)

    def run(self, max_ticks: int | None = None, poll_interval_s: float | None = None) -> None:
        """Continuous change capture (trigger analog, 2.E). ``max_ticks``
        bounds the loop for tests — the TimeLimitLifetimeService analog."""
        interval = poll_interval_s if poll_interval_s is not None else self.spec.change_capture_interval_s
        ticks = 0
        while max_ticks is None or ticks < max_ticks:
            self.run_once()
            ticks += 1
            if max_ticks is not None and ticks >= max_ticks:
                break
            time.sleep(interval)

    # ---- maintenance (C1-C4 cadence) ----------------------------------------
    def _maintenance(self) -> None:
        if self.stats.batches_merged % self.spec.optimize_batch_threshold == 0:
            self.table.expire_snapshots(keep_last=self.spec.snapshots_to_keep)
        if self.stats.batches_merged % self.spec.analyze_batch_threshold == 0:
            self.table.analyze(self.spark)
