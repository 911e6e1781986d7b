"""Declared queries: event-time window aggregations (SURVEY.md
§2.10 extended surface).

Spark's window()/session_window() work identically over batch
DataFrames, so the same expressions the streaming layer uses
(streaming/windows.py) are oracle-checked here against DuckDB
time_bucket / gap-sessionization SQL. The streaming layer's tests
then assert stream-vs-batch equality, closing the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from afg_data_pipeline_spark.functions.numeric import dsum, sql_dsum
from afg_data_pipeline_spark.io import read_star_table
from afg_data_pipeline_spark.plans.registry import register
from afg_data_pipeline_spark.streaming.joins import (
    attribution_join,
    enrich_with_dimension,
)


@register(
    "stream_static_enrich",
    oracle="""
        SELECT e.event_id, e.user_id, e.event_type, e.value,
               c.c_name, c.c_mktsegment
        FROM events e
        JOIN customer c ON e.user_id = c.c_custkey
    """,
    ops=("STREAM", "J1"),
)
def stream_static_enrich_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-static enrichment, batch-twin oracle: events stamped
    with customer dimension attributes through a broadcast join —
    per-micro-batch lookup with zero join state when the same
    function runs over readStream (tests/test_streaming.py)."""
    ev = read_star_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    cust = read_star_table(spark, "customer", sf_dir)
    return enrich_with_dimension(
        ev, cust, "user_id", "c_custkey", ["c_name", "c_mktsegment"]
    )
from afg_data_pipeline_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)


@register(
    "stream_attribution_join",
    oracle="""
        SELECT v.event_id AS view_id, c.event_id AS click_id,
               v.user_id, v.ts AS view_ts, c.ts AS click_ts
        FROM events v
        JOIN events c
          ON c.user_id = v.user_id
         AND c.ts >= v.ts
         AND c.ts <= v.ts + INTERVAL 4 HOUR
        WHERE v.event_type = 'view' AND c.event_type = 'click'
    """,
    ops=("STREAM", "J1"),
)
def stream_attribution_join_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-stream interval join, batch-twin oracle: per-user
    view→click pairs within a 4-hour attribution window. The same
    function runs over two readStream inputs in
    tests/test_streaming.py (stream == batch)."""
    ev = read_star_table(spark, "events", sf_dir)
    return attribution_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "click"),
    )


@register(
    "tumbling_window_agg",
    oracle=f"""
        SELECT event_type,
               time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
               time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR
                 AS window_end,
               count(*) AS n_events,
               {sql_dsum("value", "total_value")}
        FROM events
        GROUP BY 1, 2
    """,
    ops=("STREAM",),
)
def tumbling_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type."""
    ev = read_star_table(spark, "events", sf_dir)
    return tumbling_window_agg(ev, "1 hour", ["event_type"])


@register(
    "sliding_window_agg",
    oracle=f"""
        WITH starts AS (
            SELECT event_type, value,
                   time_bucket(INTERVAL 30 MINUTE, ts) AS window_start
            FROM events
            UNION ALL
            SELECT event_type, value,
                   time_bucket(INTERVAL 30 MINUTE, ts)
                     - INTERVAL 30 MINUTE AS window_start
            FROM events
        )
        SELECT event_type, window_start,
               window_start + INTERVAL 1 HOUR AS window_end,
               count(*) AS n_events,
               {sql_dsum("value", "total_value")}
        FROM starts
        GROUP BY 1, 2
    """,
    ops=("STREAM",),
)
def sliding_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes.

    Each event lands in exactly 2 windows (length/slide = 2); the
    oracle enumerates both start offsets explicitly.
    """
    ev = read_star_table(spark, "events", sf_dir)
    return sliding_window_agg(ev, "1 hour", "30 minutes", ["event_type"])


@register(
    "session_window_agg",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY ts ASC, event_id ASC)
        ),
        sessions AS (
            SELECT user_id, ts, value,
                   CAST(SUM(is_new) OVER (
                       PARTITION BY user_id
                       ORDER BY ts ASC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
            FROM flagged
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events
        FROM sessions
        GROUP BY user_id, sid
    """,
    ops=("STREAM",),
)
def session_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(ts, 30 min) per user — gap-merged sessions.

    Spark's session end = last event + gap; the lag-gap oracle
    reproduces that exactly. (sessionize_lag_gap is the pure
    window-algebra twin; this one exercises the native
    session_window operator the streaming layer shares.)
    """
    ev = read_star_table(spark, "events", sf_dir)
    return session_window_agg(ev, "30 minutes", ["user_id"])
