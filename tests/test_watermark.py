"""Event-time watermark semantics (SURVEY.md §2.E): streaming windowed
aggregation matches the batch plan on the same data, and rows arriving
beyond the watermark delay are dropped across checkpointed restarts."""

from __future__ import annotations

import datetime as dt

import pytest

from arcane_stream_microsoft_synapse_link_spark.streaming.structured import (
    windowed_event_counts,
)

SCHEMA = "event_id long, ts timestamp"


def _rows(*hhmm: str) -> list[tuple[int, dt.datetime]]:
    return [
        (i, dt.datetime.fromisoformat(f"2024-01-01T{t}:00")) for i, t in enumerate(hhmm)
    ]


def _drain(spark, src_dir: str, ckpt: str, delay: str = "30 minutes") -> list[tuple[str, int]]:
    """availableNow run over the parquet dir; returns update-mode emissions."""
    updates: list[tuple[str, int]] = []

    def capture(batch_df, _bid):
        updates.extend((str(r["ws"]), r["cnt"]) for r in batch_df.collect())

    q = (
        windowed_event_counts(spark.readStream.schema(SCHEMA).parquet(src_dir), delay=delay)
        .writeStream.outputMode("update")
        .foreachBatch(capture)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return updates


def test_streaming_matches_batch(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    rows = _rows("08:10", "08:20", "09:05", "10:00", "10:40")
    spark.createDataFrame(rows, SCHEMA).write.parquet(src)

    updates = _drain(spark, src, ckpt)
    final = dict(updates)  # last update per window wins
    batch = {
        str(r["ws"]): r["cnt"]
        for r in windowed_event_counts(spark.read.schema(SCHEMA).parquet(src)).collect()
    }
    assert final == batch and len(batch) == 3


def test_late_rows_beyond_watermark_dropped_across_restart(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    # run 1: events up to 10:00 -> committed watermark = 09:30 (30 min delay)
    spark.createDataFrame(_rows("08:10", "08:20", "10:00"), SCHEMA).write.parquet(src)
    first = _drain(spark, src, ckpt)
    assert ("2024-01-01 08:00:00", 2) in first

    # run 2 (same checkpoint): one late row inside the 08:00 window (before
    # the 09:30 watermark -> dropped) + one fresh row in the 10:00 window
    spark.createDataFrame(
        [(100, dt.datetime.fromisoformat("2024-01-01T08:30:00")),
         (101, dt.datetime.fromisoformat("2024-01-01T10:10:00"))],
        SCHEMA,
    ).write.mode("append").parquet(src)
    second = _drain(spark, src, ckpt)

    windows = {w for w, _ in second}
    assert "2024-01-01 08:00:00" not in windows, "late row must be dropped"
    assert ("2024-01-01 10:00:00", 2) in second, "on-time row must update its window"


@pytest.mark.parametrize("delay", ["0 seconds"])
def test_zero_delay_watermark_still_counts_in_order_rows(spark, tmp_path, delay):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    spark.createDataFrame(_rows("08:10", "08:20"), SCHEMA).write.parquet(src)
    updates = _drain(spark, src, ckpt, delay=delay)
    assert dict(updates)["2024-01-01 08:00:00"] == 2
