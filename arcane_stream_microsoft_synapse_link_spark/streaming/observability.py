"""Observability: per-batch intake metrics + streaming-progress capture.

The reference carries an ``observability`` config block (metric tags →
Datadog sidecar, stream-context-serialized-example.json; CRD
``spec.observability``). The Spark-native equivalent is (a) a small
per-batch metrics recorder the runner feeds (rows, wall seconds, rows/s —
the numbers the reference's advisedRate throughput contract is stated in),
persisted as JSONL so any scraper can tail it, and (b) a
``StreamingQueryListener`` that captures Structured Streaming progress
events (batch duration, input rows) for the readStream path.

No driver-side aggregation of data rows happens here — metrics are O(1)
per batch regardless of batch size.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field


@dataclass
class BatchMetric:
    batch_folder: str
    rows: int
    seconds: float
    rows_per_sec: float
    wall_ts: float
    tags: dict[str, str] = field(default_factory=dict)


class MetricsRecorder:
    """Collects per-batch intake metrics; optionally appends JSONL to
    ``path`` (one object per line, crash-safe append)."""

    def __init__(self, path: str | None = None, tags: dict[str, str] | None = None):
        self.path = path
        self.tags = dict(tags or {})
        self.metrics: list[BatchMetric] = []

    def record(self, batch_folder: str, rows: int, seconds: float) -> BatchMetric:
        m = BatchMetric(
            batch_folder=batch_folder,
            rows=rows,
            seconds=round(seconds, 6),
            rows_per_sec=round(rows / seconds, 3) if seconds > 0 else 0.0,
            wall_ts=time.time(),
            tags=self.tags,
        )
        self.metrics.append(m)
        if self.path:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            with open(self.path, "a") as fh:
                fh.write(json.dumps(asdict(m)) + "\n")
        return m

    @property
    def total_rows(self) -> int:
        return sum(m.rows for m in self.metrics)


def jsonl_progress_listener(path: str):
    """StreamingQueryListener that appends every progress event (micro-batch
    id, input rows, duration) to a JSONL file. Attach with
    ``spark.streams.addListener(jsonl_progress_listener(path))``."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _Listener(StreamingQueryListener):
        def onQueryStarted(self, event):
            self._write({"event": "started", "id": str(event.id)})

        def onQueryProgress(self, event):
            p = event.progress
            self._write(
                {
                    "event": "progress",
                    "id": str(p.id),
                    "batchId": p.batchId,
                    "numInputRows": p.numInputRows,
                    "durationMs": dict(p.durationMs or {}),
                }
            )

        def onQueryTerminated(self, event):
            self._write({"event": "terminated", "id": str(event.id)})

        def onQueryIdle(self, event):
            pass

        def _write(self, obj: dict) -> None:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            with open(path, "a") as fh:
                fh.write(json.dumps(obj) + "\n")

    return _Listener()
