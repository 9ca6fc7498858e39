"""Round-4: Structured Streaming executions as driver-verifiable oracles.

Until now the streaming twins (streaming/events.py) were only
parity-tested in pytest; these entries run the REAL streaming plan —
readStream file source → watermark → windowed/keyed state → memory sink,
`trigger(availableNow=True)` — to completion inside the query function
and return the sink table, so the driver hash-checks the streaming
engine's own output against the DuckDB batch oracle.

availableNow is the production backfill trigger: the same query that
would run continuously against a landing directory drains the existing
files and stops — identical state machinery, bounded run. At 100 TB the
file source shards by file; state stores scale with (key × open-window)
cardinality bounded by the watermark, not with input size.

Reference analogue: none (the reference has no streaming subsystem —
SURVEY.md §2.13); these are the additive Spark-first capability, held to
the same oracle discipline as everything else.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query


def _drained(spark, sf_dir, build, name, mode):
    """Build a streaming DF via `build(stream)`, drain it availableNow
    into a memory sink, return the sink table."""
    from ..streaming import events as se

    stream = se.events_stream(spark, sf_dir)
    se.run_to_memory(build(stream), name, mode)
    return spark.table(name)


@query(
    "stream_tumbling_window_exec",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM events
GROUP BY date_trunc('day', ts), event_type
ORDER BY window_start, event_type
""",
)
def stream_tumbling_window_exec(spark, sf_dir):
    """Streaming tumbling window EXECUTED by the streaming engine
    (readStream → watermark → window agg → memory sink, availableNow),
    not the batch twin: the sink contents must equal the batch GROUP BY."""
    from ..streaming import events as se

    df = _drained(spark, sf_dir, se.tumbling_counts,
                  "drv_stream_tumble", "complete")
    return df.orderBy("window_start", "event_type")


@query(
    "stream_sessionization_exec",
    oracle="""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE OR
                   LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id,
         SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts)
             AS session_id,
         ts
  FROM marked
)
SELECT user_id, CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
)
def stream_sessionization_exec(spark, sf_dir):
    """Native F.session_window (30-min gap) executed by the streaming
    engine; sessions must coincide with the batch lag/cumsum formulation:
    same (user, first-event-ts, count) triples."""
    from ..streaming import events as se

    df = _drained(
        spark, sf_dir,
        lambda s: se.session_windows(s).select(
            "user_id", "session_start", "n_events"),
        "drv_stream_sess", "complete")
    return df.orderBy("user_id", "session_start")


@query(
    "stream_keyed_dedup_exec",
    oracle="""
SELECT DISTINCT user_id, event_type
FROM events
ORDER BY user_id, event_type
""",
)
def stream_keyed_dedup_exec(spark, sf_dir):
    """dropDuplicatesWithinWatermark executed by the streaming engine:
    WHICH row survives per key depends on arrival order (engine-specific),
    but the key SET is deterministic — exactly the distinct
    (user_id, event_type) pairs."""
    from ..streaming import events as se

    df = _drained(
        spark, sf_dir,
        lambda s: se.dedup_within_watermark(s).select(
            "user_id", "event_type"),
        "drv_stream_dedup", "append")
    return df.orderBy("user_id", "event_type")
