"""Structured Streaming smoke tests: the streaming pipelines must produce
the same aggregates as their batch twins (which are DuckDB-oracle-checked),
plus watermark/late-data and stateful-dedup behavior."""

import pytest
from pyspark.sql import functions as F

from hiero_spark.streaming import pipelines as pl


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    return pl.read_events_stream(spark, sf_dir)


def _batch_events(spark, sf_dir):
    from hiero_spark.catalog import load_table

    return load_table(spark, sf_dir, "events")


def test_tumbling_stream_matches_batch(spark, sf_dir, events_stream):
    pl.run_to_memory(pl.tumbling_counts(events_stream), "t_tumbling")
    got = {
        (r["window_start"], r["event_type"]): r["event_count"]
        for r in spark.table("t_tumbling").collect()
    }
    batch = (
        _batch_events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("w.start").alias("ws"), "event_type", "c")
    )
    expected = {(r["ws"], r["event_type"]): r["c"] for r in batch.collect()}
    assert got == expected


def test_session_stream_matches_batch(spark, sf_dir, events_stream):
    pl.run_to_memory(pl.session_counts(events_stream), "t_session")
    got = spark.table("t_session")
    batch = (
        _batch_events(spark, sf_dir)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("event_count"))
    )
    assert got.count() == batch.count()
    assert got.agg(F.sum("event_count")).collect()[0][0] == _batch_events(
        spark, sf_dir
    ).count()


def test_stream_dedup_no_duplicates(spark, sf_dir, events_stream):
    pl.run_to_memory(
        pl.dedup_stream(events_stream), "t_dedup", output_mode="append"
    )
    out = spark.table("t_dedup")
    n = out.count()
    assert n == out.select("event_id").distinct().count()


def test_watermark_drops_late_rows(spark, tmp_path):
    """Two micro-batches: the second delivers an event older than the
    watermark horizon behind the max seen ts -> it must NOT open a new
    window (state already finalized)."""
    import datetime as dt

    d = tmp_path / "late_events"
    d.mkdir()
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    batch1 = [(1, base.replace(hour=12)), (2, base.replace(hour=15))]
    batch2 = [(3, base.replace(hour=12, minute=30))]  # 2.5h late vs max(15:00)
    spark.createDataFrame(batch1, "id long, ts timestamp").write.parquet(
        str(d / "b1.parquet")
    )
    spark.createDataFrame(batch2, "id long, ts timestamp").write.parquet(
        str(d / "b2.parquet")
    )
    # FileStreamSource orders micro-batches by file mtime; force b1 first so
    # the watermark has advanced before the late file arrives.
    import os, time

    now = time.time()
    for root, _, files in os.walk(d / "b1.parquet"):
        for f in files:
            os.utime(os.path.join(root, f), (now - 120, now - 120))
    os.utime(d / "b1.parquet", (now - 120, now - 120))
    schema = "id long, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d) + "/*")
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("w.start").alias("ws"), "c")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")  # append emits only watermark-finalized windows
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["ws"]: r["c"] for r in spark.table("t_late").collect()}
    # the 12:00 window was finalized with exactly 1 event; the late event
    # (12:30, arriving after watermark passed 14:00) must not reopen it
    twelve = [c for ws, c in rows.items() if ws.hour == 12]
    assert twelve == [1] or twelve == []  # never 2
