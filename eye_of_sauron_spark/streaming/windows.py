"""Event-time windowed aggregations (tumbling / sliding / session).

These are the engine's replacement for the reference's ad-hoc
count-based frame buffer (web/views.py:22, a 600-frame window) and
its wall-clock latency accounting (src/prediction_producer.py:
355-361): proper event-time semantics on the ``events.ts`` column.

The same ``window()`` / ``session_window()`` expressions run in batch
and in Structured Streaming; the registered queries here execute in
batch (so the DuckDB oracle can verify the window algebra), and
tests/test_streaming.py re-runs them through a real multi-micro-batch
stream with a watermark and asserts the results are identical.

Scale notes: windowed group-bys are partial+final aggregates keyed on
(key, window) — shuffle volume O(groups). Session windows need a
per-key sort-merge; Spark plans them as a single shuffle on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load_table

TUMBLE = "1 hour"
SLIDE_SIZE, SLIDE_STEP = "1 hour", "30 minutes"
SESSION_GAP = "10 minutes"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def tumbling_agg(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows per event_type (streaming-safe plan)."""
    return (
        events.groupBy(F.window("ts", TUMBLE).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_agg(events: DataFrame) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes (each event lands in 2)."""
    return (
        events.groupBy(F.window("ts", SLIDE_SIZE, SLIDE_STEP).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            # sum, not avg: avg's extra division manufactures digits right
            # at round()'s boundary, where Spark/DuckDB ULP noise flips the
            # last decimal (observed at sf0.01).
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
            "n_users",
            "sum_value",
        )
    )


def session_agg(events: DataFrame) -> DataFrame:
    """Per-user session windows with a 10-minute inactivity gap."""
    return (
        events.groupBy("user_id", F.session_window("ts", SESSION_GAP).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "stream_tumbling_window",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w_start,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) + INTERVAL 1 HOUR AS w_end,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY w_start, w_end, event_type
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation (A8/A11 analog: per-hour
    stream rollup). Batch execution of the streaming plan."""
    return tumbling_agg(_events(spark, sf_dir))


@query(
    "stream_sliding_window",
    oracle="""
    WITH assigned AS (
        SELECT epoch_ms(CAST((floor(epoch(ts) / 1800) - o.o) * 1800000 AS BIGINT))
                   AS w_start,
               user_id, value
        FROM events, unnest([0, 1]) AS o(o)
    )
    SELECT w_start,
           w_start + INTERVAL 1 HOUR AS w_end,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           round(sum(value), 2) AS sum_value
    FROM assigned
    GROUP BY w_start
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) event-time windows: 1-hour span, 30-minute
    step — every event belongs to exactly 2 windows. The oracle
    materializes the same window assignment arithmetic explicitly
    (epoch-aligned starts at floor(epoch/step)*step - k*step)."""
    return sliding_agg(_events(spark, sf_dir))


@query(
    "stream_session_window",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING
               ) AS sid
        FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 10 MINUTE AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (10-minute gap) — the principled
    version of the reference's per-camera activity buffers. The
    oracle derives identical sessions with the classic
    gaps-and-islands construction: a session closes when the next
    event is >= gap away (session end is exclusive: last_ts + gap)."""
    return session_agg(_events(spark, sf_dir))
