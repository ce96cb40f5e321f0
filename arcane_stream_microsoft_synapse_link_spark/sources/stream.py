"""Structured Streaming source for Synapse Link exports (operator A1-A3).

A real ``pyspark.sql.datasource.DataSource`` stream reader — the idiomatic
Spark-4 shape for the reference's ``SynapseLinkStreamingSource``
(main.scala:49; SURVEY.md §2.A A1/A2, §7 M3):

* ``latestOffset``  = read ``Changelog/changelog.info`` (the frontier —
  reference polls it every changeCaptureInterval).
* ``partitions(start, end)`` = one input partition per CSV chunk in the
  batch folders named within ``(start, end]`` — folder names are sortable
  timestamps, so the offset range IS the watermark filter (B5), and data
  reads parallelize per chunk exactly like the reference's per-file reads.
* ``read(partition)`` = parse the headerless CSV against the folder's own
  ``model.json`` schema (per-batch schema, watch-list item 3), with the
  same forgiving multi-format timestamp handling as the JVM batch path
  (``cdm.parse_timestamp``).

Offsets live in the streaming checkpoint → exactly-once with an idempotent
sink merge. The Python parse path is the streaming TAIL (small change
batches); bulk backfill goes through the vectorized JVM CSV reader
(``SynapseLinkSource.read_folders``) — same split the reference makes
between change capture and backfill sharding.
"""

from __future__ import annotations

import csv
import os
import re
from collections.abc import Iterator, Sequence
from dataclasses import dataclass
from datetime import datetime, timezone
from decimal import Decimal, InvalidOperation

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition
from pyspark.sql.types import StructType

from .cdm import CdmAttribute, parse_model
from .synapse import FOLDER_RE, SynapseLinkSource

_US12 = re.compile(r"^(\d{1,2})/(\d{1,2})/(\d{4}) (\d{1,2}):(\d{2}):(\d{2}) (AM|PM)$")


def parse_timestamp_py(s: str) -> datetime | None:
    """Python twin of ``cdm.parse_timestamp`` (same wire formats, same
    null-on-unparseable semantics). Offset-aware inputs normalize to UTC;
    zone-less inputs stay naive (session-timezone semantics, matching the
    JVM ``try_to_timestamp`` behavior)."""
    s = s.strip()
    if not s:
        return None
    m = _US12.match(s)
    if m:
        mo, d, y, h, mi, sec, ap = m.groups()
        hour = int(h) % 12 + (12 if ap == "PM" else 0)
        try:
            return datetime(int(y), int(mo), int(d), hour, int(mi), int(sec))
        except ValueError:
            return None
    try:
        dt = datetime.fromisoformat(s)  # 3.11+: handles Z, offsets, 7-digit fractions
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc)
    return dt


def parse_value_py(raw: str | None, attr: CdmAttribute):
    """Python twin of ``cdm.cast_attribute``: empty → null, try-cast else null."""
    if raw is None:
        return None
    dt = attr.data_type.lower()
    if dt in ("guid", "string"):
        return raw  # never truncate, preserve as-is (incl. empty string)
    stripped = raw.strip()
    if stripped == "":
        return None
    try:
        if dt in ("int64", "int32"):
            return int(stripped)
        if dt == "decimal":
            return Decimal(stripped)
        if dt == "double":
            return float(stripped)
        if dt == "boolean":
            low = stripped.lower()
            return True if low in ("true", "1") else False if low in ("false", "0") else None
        if dt in ("datetime", "datetimeoffset"):
            return parse_timestamp_py(raw)
    except (ValueError, InvalidOperation):
        return None
    return raw


@dataclass(frozen=True)
class CsvChunkPartition(InputPartition):
    path: str
    folder: str  # batch folder name = source version (provenance + watermark)
    attributes: tuple[CdmAttribute, ...]


class SynapseLinkStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        root: str,
        entity: str,
        max_folders_per_trigger: int = 0,
        query_columns: tuple[str, ...] = (),
    ):
        self._source = SynapseLinkSource(root, entity)
        self._max_folders = max_folders_per_trigger
        # data columns of the query schema (no _batch_folder): every emitted
        # row is projected onto these — folder-local schemas may lag (null-
        # padded) or lead (extra attrs dropped until a stream restart picks
        # up the widened schema, the Spark file-source evolution contract)
        self._query_columns = query_columns
        # Progress known to THIS reader instance: set by initialOffset (fresh
        # stream) and commit (each finished batch). After a checkpoint
        # restart it is None until the first commit — the API does not hand
        # the reader the restored offset — so the first trigger is uncapped
        # (a restart burst), then steady-state admission capping resumes.
        self._known_progress: str | None = None

    # -- offsets (A1): folder-name frontier from the changelog pointer ----
    def initialOffset(self) -> dict:
        self._known_progress = ""
        return {"folder": ""}

    def latestOffset(self) -> dict:
        """Frontier = changelog pointer, optionally admission-capped to N
        folders past known progress (operator B18, the static throughput
        shaper — the maxFilesPerTrigger idiom for this source)."""
        head = self._source.changelog_head()
        if head and self._max_folders > 0 and self._known_progress is not None:
            pend = self._source.list_folders(after=self._known_progress or None, up_to=head)
            if len(pend) > self._max_folders:
                head = pend[self._max_folders - 1].name
        if head and self._known_progress:
            head = max(head, self._known_progress)  # never regress the frontier
        return {"folder": head or ""}

    # -- planning (A2/B5): folders in (start, end], one partition per CSV --
    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        after = start.get("folder") or None
        up_to = end.get("folder") or None
        if up_to is None:
            return []
        parts: list[CsvChunkPartition] = []
        for folder in self._source.list_folders(after=after, up_to=up_to):
            entity_dir = os.path.join(folder.path, self._source.entity_name)
            if not os.path.isdir(entity_dir):
                continue
            attrs = self._source.entity_schema(folder).attributes
            for f in sorted(os.listdir(entity_dir)):
                if f.endswith(".csv"):
                    parts.append(
                        CsvChunkPartition(
                            path=os.path.join(entity_dir, f),
                            folder=folder.name,
                            attributes=attrs,
                        )
                    )
        return parts

    # -- executor-side read (A3) ------------------------------------------
    def read(self, partition: CsvChunkPartition) -> Iterator[tuple]:
        attrs = partition.attributes
        n = len(attrs)
        # project the folder-local row onto the query schema (B7/B10):
        # query column missing in this folder → None; folder attr unknown
        # to the query → dropped
        by_name = {a.name: i for i, a in enumerate(attrs)}
        cols = self._query_columns or tuple(a.name for a in attrs)
        plan = [(by_name.get(c), attrs[by_name[c]] if c in by_name else None) for c in cols]
        with open(partition.path, newline="") as fh:
            # quoted, quote-escaped-by-doubling — same dialect as the JVM read
            for row in csv.reader(fh):
                padded = (row + [None] * n)[:n]
                yield tuple(
                    parse_value_py(padded[i], a) if i is not None else None
                    for i, a in plan
                ) + (partition.folder,)

    def commit(self, end: dict) -> None:
        # offsets live in the checkpoint; sink-side watermark is B11.
        # Track committed progress so admission capping stays relative.
        f = end.get("folder") or ""
        if f and (self._known_progress is None or f > self._known_progress):
            self._known_progress = f


class SynapseLinkDataSource(DataSource):
    """``spark.readStream.format("synapse_link").option("path", root)
    .option("entity", name).load()``"""

    @classmethod
    def name(cls) -> str:
        return "synapse_link"

    def schema(self) -> StructType:
        root = self.options.get("path")
        entity = self.options.get("entity")
        if not root or not entity:
            raise ValueError("synapse_link source requires 'path' and 'entity' options")
        # Schema is resolved from the NEWEST batch folder's model.json (per-
        # batch schemas, §1.3) falling back to the container-root model.json
        # — a restarted stream picks up mid-stream ADD COLUMNs, matching the
        # reference's staging-vs-target diff (B10) driven from batch schemas.
        src = SynapseLinkSource(root, entity)
        folders = src.list_folders()
        if folders:
            entity_obj = src.entity_schema(folders[-1])
        else:
            with open(os.path.join(root, "model.json")) as fh:
                model = parse_model(fh.read())
            if entity not in model:
                raise ValueError(f"entity {entity!r} not in {root}/model.json")
            entity_obj = model[entity]
        schema = entity_obj.typed_schema()
        # provenance column: which batch folder (source version) each row
        # came from — lets the sink commit a B11 watermark per micro-batch
        return schema.add("_batch_folder", "string", nullable=False)

    def streamReader(self, schema: StructType) -> SynapseLinkStreamReader:
        return SynapseLinkStreamReader(
            self.options["path"],
            self.options["entity"],
            max_folders_per_trigger=int(self.options.get("maxfolderspertrigger", 0)),
            query_columns=tuple(f.name for f in schema.fields if f.name != "_batch_folder"),
        )


def register(spark) -> None:
    """Register the source on a session (idempotent). Call before
    ``readStream.format("synapse_link")``."""
    from ..session import tune

    tune(spark)  # confs + ship package zip so executors can unpickle us
    spark.dataSource.register(SynapseLinkDataSource)


# unused-name guard for FOLDER_RE re-export (folder grammar is shared)
__all__ = [
    "SynapseLinkDataSource",
    "SynapseLinkStreamReader",
    "CsvChunkPartition",
    "parse_timestamp_py",
    "parse_value_py",
    "register",
    "FOLDER_RE",
]
