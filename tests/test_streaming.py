"""Streaming ops: run each incremental plan to completion over the static
events file and assert batch/stream parity (the design invariant of
go_mysql_server_spark/streaming/events.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_mysql_server_spark.sources import load
from go_mysql_server_spark.streaming import events as se

from .conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_counts_matches_batch(spark):
    stream = se.events_stream(spark, SF_DIR)
    se.run_to_memory(se.tumbling_counts(stream), "t_tumble", "complete")
    got = _rows(spark.table("t_tumble"))

    batch = load(spark, SF_DIR, "events")
    want = _rows(
        batch.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "total_value")
    )
    assert got == want and len(got) > 0


def test_session_windows_matches_batch(spark):
    stream = se.events_stream(spark, SF_DIR)
    se.run_to_memory(se.session_windows(stream), "t_sess", "complete")
    got = _rows(spark.table("t_sess"))

    batch = load(spark, SF_DIR, "events")
    want = _rows(
        batch.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("session_value"))
        .select("user_id", F.col("w.start").alias("session_start"),
                "n_events", "session_value")
    )
    assert got == want and len(got) > 0


def test_dedup_within_watermark_keys_unique(spark):
    stream = se.events_stream(spark, SF_DIR)
    se.run_to_memory(se.dedup_within_watermark(stream), "t_dedup", "append")
    out = spark.table("t_dedup")
    n = out.count()
    n_keys = out.select("user_id", "event_type").distinct().count()
    n_batch_keys = (
        load(spark, SF_DIR, "events")
        .select("user_id", "event_type").distinct().count()
    )
    # one surviving row per observed key (watermark horizon ≥ stream span)
    assert n == n_keys
    assert n_keys <= n_batch_keys


def test_stateful_running_user_stats_matches_batch(spark):
    from go_mysql_server_spark.streaming.stateful import running_user_stats

    stream = se.events_stream(spark, SF_DIR)
    se.run_to_memory(running_user_stats(stream), "t_state", "update")
    got = _rows(spark.table("t_state"))

    batch = load(spark, SF_DIR, "events")
    want = _rows(
        batch.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.max("value").alias("max_value"),
        )
    )
    # single availableNow batch → one emission per user with final totals
    assert len(got) == len(want)
    got_by_user = {r[0]: r[1:] for r in got}
    for user_id, n, total, mx in want:
        gn, gt, gm = got_by_user[user_id]
        assert gn == n and gm == mx
        assert abs(gt - total) < 1e-6


def test_stream_stream_interval_join_matches_batch(spark):
    stream = se.events_stream(spark, SF_DIR)
    views_s = stream.filter(F.col("event_type") == "view")
    buys_s = stream.filter(F.col("event_type") == "purchase")
    se.run_to_memory(
        se.view_to_purchase_join(views_s, buys_s), "t_ssj", "append")
    got = _rows(spark.table("t_ssj"))

    batch = load(spark, SF_DIR, "events")
    v = (batch.filter(F.col("event_type") == "view")
         .select(F.col("user_id").alias("v_user"),
                 F.col("event_id").alias("view_id"),
                 F.col("ts").alias("v_ts")))
    p = (batch.filter(F.col("event_type") == "purchase")
         .select(F.col("user_id").alias("p_user"),
                 F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("p_ts"),
                 F.col("value").alias("amount")))
    want = _rows(
        v.join(p, F.expr(
            "v_user = p_user AND "
            "v_ts BETWEEN p_ts - INTERVAL 30 minutes AND p_ts"))
        .select("p_user", "purchase_id", "view_id", "amount"))
    assert got == want and len(got) > 0


def test_streaming_corpus_ingest_matches_batch(spark):
    from go_mysql_server_spark.streaming import corpus as sc

    stream = sc.documents_stream(spark, SF_DIR)
    se.run_to_memory(sc.corpus_ingest(stream), "t_corpus", "update")
    got = _rows(spark.table("t_corpus")
                .select("source", "lang_pred", "kept_docs", "kept_tokens"))

    batch = load(spark, SF_DIR, "documents")
    want = _rows(sc.corpus_ingest_batch_twin(batch))
    assert got == want and len(got) > 0


def test_streaming_neardup_suppress_matches_batch(spark):
    """Near-dup suppression keyed on the min-shingle fingerprint must keep
    exactly one document per fingerprint — the same survivor set (by
    fingerprint) as the batch groupBy twin."""
    from go_mysql_server_spark.streaming import corpus as sc

    stream = sc.documents_stream(spark, SF_DIR)
    se.run_to_memory(sc.neardup_suppress(stream), "t_neardup", "append")
    got = spark.table("t_neardup")

    batch = load(spark, SF_DIR, "documents")
    want = sc.neardup_suppress_batch_twin(batch)
    got_fps = sorted(r[0] for r in got.select("fp_shingle").collect())
    want_fps = sorted(r[0] for r in want.select("fp_shingle").collect())
    assert got_fps == want_fps and len(got_fps) > 0
    # one survivor per fingerprint, never more
    assert got.count() == len(set(got_fps))
