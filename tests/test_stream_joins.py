"""Stream-stream joins and streaming dedup (§2.E extension surface):
watermarked interval self-join parity with batch, and
dropDuplicatesWithinWatermark across micro-batches."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

SCHEMA = "event_id long, user_id long, event_type string, ts timestamp"
T0 = dt.datetime.fromisoformat("2024-01-01T08:00:00")


def _rows(*specs):
    # spec: (event_id, user_id, type, minutes_after_t0)
    return [(e, u, t, T0 + dt.timedelta(minutes=m)) for (e, u, t, m) in specs]


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """purchases joined to views of the same user within the prior 30 min —
    watermarks on both sides bound the join state; results equal the batch
    join on the same data."""
    src = str(tmp_path / "src")
    rows = _rows(
        (1, 10, "view", 0),
        (2, 10, "purchase", 10),   # joins view@0
        (3, 10, "purchase", 45),   # view@0 too old -> no match
        (4, 11, "view", 5),
        (5, 11, "view", 20),
        (6, 11, "purchase", 25),   # joins views @5 and @20
        (7, 12, "purchase", 30),   # no views -> no match
    )
    spark.createDataFrame(rows, SCHEMA).write.parquet(src)

    def join_of(df):
        views = df.where(F.col("event_type") == "view").select(
            F.col("user_id").alias("v_user"), F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        buys = df.where(F.col("event_type") == "purchase").select(
            "user_id", F.col("event_id").alias("buy_id"), "ts"
        )
        return buys.join(
            views,
            (F.col("user_id") == F.col("v_user"))
            & (F.col("v_ts") <= F.col("ts"))
            & (F.col("v_ts") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES")),
        ).select("buy_id", "view_id")

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    views = stream.where(F.col("event_type") == "view").withWatermark("ts", "1 hour").select(
        F.col("user_id").alias("v_user"), F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    buys = stream.where(F.col("event_type") == "purchase").withWatermark("ts", "1 hour").select(
        "user_id", F.col("event_id").alias("buy_id"), "ts"
    )
    joined = buys.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("ts"))
        & (F.col("v_ts") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES")),
    ).select("buy_id", "view_id")

    got: list[tuple[int, int]] = []
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda b, _i: got.extend((r["buy_id"], r["view_id"]) for r in b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = sorted(
        (r["buy_id"], r["view_id"])
        for r in join_of(spark.read.schema(SCHEMA).parquet(src)).collect()
    )
    assert sorted(got) == batch == [(2, 1), (6, 4), (6, 5)]


def test_drop_duplicates_within_watermark_across_batches(spark, tmp_path):
    """The B8 dedup primitive as a streaming operator: a re-delivered
    event_id inside the watermark window is dropped even when it arrives
    in a LATER micro-batch (state remembers seen keys)."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    spark.createDataFrame(_rows((1, 10, "view", 0), (2, 10, "view", 5)), SCHEMA).write.parquet(src)

    def drain():
        out: list[int] = []
        q = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withWatermark("ts", "2 hours")
            .dropDuplicatesWithinWatermark(["event_id"])
            .writeStream.outputMode("append")
            .foreachBatch(lambda b, _i: out.extend(r["event_id"] for r in b.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return out

    first = drain()
    assert sorted(first) == [1, 2]

    # second run, same checkpoint: event 1 re-delivered (duplicate) + new 3
    spark.createDataFrame(
        _rows((1, 10, "view", 0), (3, 10, "view", 10)), SCHEMA
    ).write.mode("append").parquet(src)
    second = drain()
    assert sorted(second) == [3], "re-delivered event_id must be deduplicated"
