"""Structured Streaming behavior: replay parity with batch twins, session
windows, watermark late-data handling, foreachBatch upsert (T10)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from smart_water_management_spark.streaming import jobs
from smart_water_management_spark.streaming.batch_windows import (
    t01_tumbling_hourly,
    t03_sessionization,
)

from .conftest import SF_DIR


def test_streaming_hourly_equals_batch(spark):
    stream_result = jobs.t05_streaming_hourly(spark, SF_DIR)
    batch_result = t01_tumbling_hourly(spark, SF_DIR).drop("n_users")
    s = {tuple(r) for r in stream_result.collect()}
    b = {tuple(r) for r in batch_result.collect()}
    assert s == b


def test_streaming_sessions_subset_of_batch(spark):
    stream_sessions = jobs.t06_streaming_session_windows(spark, SF_DIR)
    batch_sessions = t03_sessionization(spark, SF_DIR)
    s = {(r.user_id, r.session_start) for r in stream_sessions.collect()}
    b_rows = batch_sessions.collect()
    b = {(r.user_id, r.session_start) for r in b_rows}
    # append mode only emits sessions already expired by the 24h watermark:
    # emitted ⊆ batch, and every batch session that ended >24h+gap before
    # the stream's max event time must have been emitted.
    assert s.issubset(b)
    max_end = max(r.session_end for r in b_rows)
    import datetime

    cutoff = (
        datetime.datetime.strptime(max_end, "%Y-%m-%d %H:%M:%S")
        - datetime.timedelta(hours=24, minutes=31)
    ).strftime("%Y-%m-%d %H:%M:%S")
    must_emit = {
        (r.user_id, r.session_start) for r in b_rows if r.session_end < cutoff
    }
    assert must_emit.issubset(s)


def test_watermark_drops_late_data(spark):
    """An event arriving later than the watermark bound is dropped from an
    already-closed window (capability the reference only flags, T5)."""
    import os

    with tempfile.TemporaryDirectory() as src, tempfile.TemporaryDirectory() as ckpt:
        schema = "ts timestamp, k string, v double"
        batch1 = spark.createDataFrame(
            [("2024-01-01 10:00:00", "a", 1.0), ("2024-01-01 12:00:00", "a", 1.0)],
            "ts string, k string, v double",
        ).select(F.col("ts").cast("timestamp"), "k", "v")
        batch1.write.parquet(os.path.join(src, "b1"))
        # late event: 10:30 arrives after watermark has advanced to 11:00
        late = spark.createDataFrame(
            [("2024-01-01 10:30:00", "a", 100.0)], "ts string, k string, v double"
        ).select(F.col("ts").cast("timestamp"), "k", "v")
        late.write.parquet(os.path.join(src, "b2"))

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"), "k")
            .agg(F.sum("v").alias("total"))
            .select(
                F.date_format("window.start", "HH:mm").alias("w"), "k", "total"
            )
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName("late_test")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = {(r.w, r.total) for r in spark.table("late_test").collect()}
        # the 10:00 window must have closed with total=1.0 (late 100.0 dropped)
        assert ("10:00", 1.0) in rows
        assert ("10:00", 101.0) not in rows


def test_foreachbatch_status_upsert(spark):
    status = jobs.sensor_status_upsert_stream(spark, SF_DIR, "test_sensor_status")
    rows = {r.user_id: r for r in status.collect()}
    from smart_water_management_spark.sources.catalog import load_table

    ev = load_table(spark, SF_DIR, "events")
    expected = {
        r.user_id: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        )
        .collect()
    }
    assert set(rows) == set(expected)
    for uid, exp in expected.items():
        assert rows[uid].n_events == exp.n_events
        assert rows[uid].n_errors == exp.n_errors
