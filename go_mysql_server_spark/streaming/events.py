"""Structured Streaming operators over the events stream.

The reference has no streaming subsystem (SURVEY.md §2.13 — its closest
analogues are binlog replication and the event scheduler); this module is
the additive stream surface: the batch queries in plans/events_catalog.py
re-expressed as incremental streaming plans with event-time watermarks.

Batch/stream parity is the design invariant: each streaming op uses the
same expressions as its batch twin, so running the stream to completion
over a static file source must produce the batch answer — that equivalence
is what tests/test_streaming.py asserts.

Scale notes: all stateful ops are keyed (user_id / window), so state
partitions across executors; watermarks bound state size — without them a
100 TB replay would accumulate unbounded session state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune_session
from ..sources.tables import load


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (file source = replayable stream).

    Schema comes from a batch read (streaming sources need explicit
    schemas); the TIMESTAMP(NANOS) → long → µs-timestamp rescale matches
    sources/tables.py.
    """
    tune_session(spark)
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    # The file stream source requires a *directory*; stage a symlink dir
    # (testdata is read-only). In production this is the landing directory
    # new files arrive into.
    stage = os.path.join(
        "/tmp/gms_spark_stream", sf_dir.strip("/").replace("/", "_")
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    stream = spark.readStream.schema(raw_schema).parquet(stage)
    ts_type = next(
        (f.dataType.simpleString() for f in raw_schema if f.name == "ts"), "")
    if ts_type in ("bigint", "long"):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-day window counts+sums per event_type, late data bounded
    by the watermark. Streaming twin of events_tumbling_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "total_value")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "1 hour") -> DataFrame:
    """Native session windows (F.session_window) — 30-min inactivity gap
    per user. State is (user_id, open session) — bounded by the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select("user_id", F.col("w.start").alias("session_start"),
                "n_events", "session_value")
    )


def dedup_within_watermark(events: DataFrame,
                           watermark: str = "1 hour") -> DataFrame:
    """Keyed dedup with bounded state (dropDuplicatesWithinWatermark):
    first event per (user_id, event_type) within the watermark horizon."""
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type", "event_id", "ts")
    )


def run_to_memory(df: DataFrame, name: str, output_mode: str = "append"):
    """Execute a streaming plan to completion over the (static) file source
    and land results in an in-memory table; returns the query handle."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def view_to_purchase_join(views: DataFrame, purchases: DataFrame,
                          horizon: str = "30 minutes",
                          watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's view events in the preceding `horizon`.

    Both sides carry watermarks, and the join condition bounds event-time
    distance — that pair is what lets Spark expire buffered state (an
    unbounded stream-stream join would hold both streams forever; with the
    interval, state is O(users × horizon)). The attribution-join shape of
    production clickstreams."""
    v = (views.withWatermark("ts", watermark)
         .select(F.col("user_id").alias("v_user"),
                 F.col("event_id").alias("view_id"),
                 F.col("ts").alias("v_ts")))
    p = (purchases.withWatermark("ts", watermark)
         .select(F.col("user_id").alias("p_user"),
                 F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("p_ts"),
                 F.col("value").alias("amount")))
    return v.join(
        p,
        F.expr(f"""
            v_user = p_user AND
            v_ts BETWEEN p_ts - INTERVAL {horizon} AND p_ts
        """),
    ).select("p_user", "purchase_id", "view_id",
             F.col("amount").alias("amount"))
