"""Event-stream operators over the `events` table (batch form).

The reference has no streaming subsystem (SURVEY.md §2.13) — these are the
additive stream-analytics surface: tumbling/sliding/session windows and
keyed dedup, written so the same logic runs under Structured Streaming
(go_mysql_server_spark/streaming/ wires the readStream variants with
watermarks; the batch forms here are oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import t
from .registry import query


@query(
    "events_tumbling_window",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM events
GROUP BY date_trunc('day', ts), event_type
ORDER BY window_start, event_type
""",
)
def events_tumbling_window(spark, sf_dir):
    """Tumbling event-time window: F.window(ts, '1 day'). In streaming mode
    the identical expression runs incrementally behind a watermark."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "total_value")
        .orderBy("window_start", "event_type")
    )


@query(
    "events_sliding_window",
    oracle="""
SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n_events
FROM (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) - (o.off * INTERVAL 1 DAY) AS window_start, event_id
  FROM events, (VALUES (0), (1)) o(off)
)
GROUP BY window_start
ORDER BY window_start
""",
)
def events_sliding_window(spark, sf_dir):
    """Sliding window (2-day window, 1-day slide): every event lands in two
    windows — F.window(ts, '2 days', '1 day')."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
        .orderBy("window_start")
    )


@query(
    "events_sessionization",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE OR
                   LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, event_id, value,
         SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS session_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
)
def events_sessionization(spark, sf_dir):
    """Sessionization with a 30-min inactivity gap — the lag/cumsum batch
    formulation; the streaming twin is F.session_window (streaming/events.py).
    Reference analogue: none (GMS has no session semantics) — additive."""
    e = t(spark, sf_dir, "events")
    t(spark, sf_dir, "events").createOrReplaceTempView("v_events_sess")
    return spark.sql(
        """
        WITH marked AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTES OR
                           LAG(ts) OVER w IS NULL
                      THEN 1 ELSE 0 END AS is_new_session
          FROM v_events_sess
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
          SELECT user_id, event_id, value,
                 SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     AS session_id
          FROM marked
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS session_value
        FROM sessions
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
        """
    )


@query(
    "events_keyed_dedup",
    oracle="""
SELECT user_id, event_type,
       ARG_MIN(event_id, ts) AS first_event_id,
       MIN(ts) AS first_ts
FROM events
GROUP BY user_id, event_type
ORDER BY user_id, event_type
""",
)
def events_keyed_dedup(spark, sf_dir):
    """Keyed dedup keep-earliest (streaming twin: dropDuplicates within
    watermark). min_by on ts; ts ties broken by event_id monotonicity —
    the synthetic stream has unique (user_id, ts)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", "event_type")
        .agg(
            F.min_by("event_id", "ts").alias("first_event_id"),
            F.min("ts").alias("first_ts"),
        )
        .orderBy("user_id", "event_type")
    )


@query(
    "events_type_pivot",
    oracle="""
SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS n_view,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       ROUND(COALESCE(SUM(value) FILTER (WHERE event_type = 'purchase'), 0.0), 4)
           AS purchase_value
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def events_type_pivot(spark, sf_dir):
    """Pivot-style conditional aggregation (MySQL idiom: SUM(IF(...)))."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("n_view"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchase"),
            F.round(
                F.coalesce(
                    F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))),
                    F.lit(0.0),
                ),
                4,
            ).alias("purchase_value"),
        )
        .orderBy("user_id")
    )
