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
    "stream_attribution_outer",
    oracle="""
        SELECT v.event_id AS view_id, c.event_id AS click_id,
               v.user_id, v.ts AS view_ts, c.ts AS click_ts
        FROM (SELECT * FROM events
              WHERE event_type = 'view') v
        LEFT JOIN (SELECT * FROM events
                   WHERE event_type = 'click') c
          ON c.user_id = v.user_id
         AND c.ts >= v.ts
         AND c.ts <= v.ts + INTERVAL 4 HOUR
    """,
    ops=("STREAM", "J1", "A4"),
)
def stream_attribution_outer_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LEFT OUTER stream-stream interval join, batch-twin oracle:
    every view row survives — converted views with their clicks,
    unconverted views null-extended (the rows a funnel bills
    against). Streaming semantics (null emission only after the
    watermark passes view_ts + window) are pinned stream==batch in
    tests/test_streaming.py with a watermark-flush sentinel."""
    ev = read_star_table(spark, "events", sf_dir)
    from afg_data_pipeline_spark.streaming.joins import (
        attribution_join_outer,
    )

    return attribution_join_outer(
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


@register(
    "watermarked_tumbling_counts",
    oracle=f"""
        SELECT event_type,
               time_bucket(INTERVAL 2 HOUR, ts) AS window_start,
               time_bucket(INTERVAL 2 HOUR, ts) + INTERVAL 2 HOUR
                 AS window_end,
               count(*) AS n_events,
               {sql_dsum("value", "total_value")}
        FROM events
        GROUP BY 1, 2
    """,
    ops=("STREAM",),
)
def watermarked_tumbling_counts_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch twin of the watermarked streaming aggregation: the
    SAME streaming/windows.watermarked_tumbling_counts function run
    over the batch events table (withWatermark is a no-op on batch
    frames, and with availableNow over a finite backlog nothing is
    late — the stream test asserts total equality on exactly this
    plan). 2-hour windows keep it distinct from the 1-hour
    tumbling_window_agg query; window bounds cast back to NTZ (the
    LTZ cast the watermark requires is an identity under the pinned
    UTC session)."""
    from afg_data_pipeline_spark.streaming.windows import (
        watermarked_tumbling_counts,
    )

    ev = read_star_table(spark, "events", sf_dir)
    out = watermarked_tumbling_counts(
        ev, width="2 hours", delay="2 hours", keys=["event_type"]
    )
    return out.select(
        "event_type",
        F.col("window_start").cast("timestamp_ntz").alias(
            "window_start"
        ),
        F.col("window_end").cast("timestamp_ntz").alias(
            "window_end"
        ),
        "n_events",
        "total_value",
    )


@register(
    "dedup_within_watermark",
    oracle="""
        SELECT user_id, event_type, ts AS first_ts,
               event_id AS first_event_id
        FROM (
            SELECT user_id, event_type, ts, event_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts ASC, event_id ASC
                   ) AS rn
            FROM events)
        WHERE rn = 1
    """,
    ops=("STREAM", "DEDUP"),
)
def dedup_within_watermark_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch twin of streaming dedup-within-watermark:
    dropDuplicatesWithinWatermark is STREAM-ONLY (Spark raises on
    batch frames) and keeps the first-arriving row per key, so the
    oracle-checkable twin is streaming/windows.dedup_first_event —
    the earliest (ts, event_id) row per (user_id, event_type),
    which is exactly what the streaming operator emits for an
    event-time-ordered replay with every duplicate inside the
    watermark delay (stream == batch asserted on that feed in
    tests/test_streaming.py)."""
    from afg_data_pipeline_spark.streaming.windows import (
        dedup_first_event,
    )

    ev = read_star_table(spark, "events", sf_dir)
    out = dedup_first_event(
        ev, ["user_id", "event_type"], "ts", "event_id"
    )
    return out.select(
        "user_id",
        "event_type",
        F.col("ts").alias("first_ts"),
        F.col("event_id").alias("first_event_id"),
    )


def _geofence_oracle() -> str:
    """Brute ray-cast replica over the events-derived point feed
    (same parity expression as plans/reference_semantics._pip_oracle
    — the certified containment arithmetic)."""
    from afg_data_pipeline_spark.operators.spatial import _ring_edges
    from afg_data_pipeline_spark.plans.reference_semantics import (
        _PIP_POLYGONS,
    )

    rows = ", ".join(
        f"('{pid}', {x1!r}, {y1!r}, {x2!r}, {y2!r})"
        for pid, rings in _PIP_POLYGONS
        for x1, y1, x2, y2 in _ring_edges(rings)
    )
    return f"""
        WITH pts AS (
            SELECT event_id, user_id, event_type,
                   CAST(event_id % 997 AS DOUBLE) AS px,
                   CAST((event_id * 31) % 991 AS DOUBLE) AS py
            FROM events
        ),
        edges(poly_id, x1, y1, x2, y2) AS (VALUES {rows}),
        crossed AS (
            SELECT p.event_id, e.poly_id, count(*) AS n_cross
            FROM pts p
            JOIN edges e
              ON ((e.y1 > p.py) <> (e.y2 > p.py))
             AND p.px < e.x1 + (p.py - e.y1) * (e.x2 - e.x1)
                                / (e.y2 - e.y1)
            GROUP BY 1, 2
        )
        SELECT p.event_id, p.user_id, p.event_type, c.poly_id
        FROM pts p
        JOIN crossed c
          ON c.event_id = p.event_id AND c.n_cross % 2 = 1
    """


@register(
    "stream_geofence_enrich",
    oracle=_geofence_oracle(),
    ops=("STREAM", "J3", "M5"),
)
def stream_geofence_enrich_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch twin of streaming/geofence.geofence_enrich: the event
    stream's synthetic positions containment-joined to the admin
    polygon layer. The r10 fold rewrite made the containment
    operator STATELESS (broadcast join + F.aggregate fold, no
    parity groupBy), so the IDENTICAL function runs over
    readStream in append mode with no watermark and no state —
    pinned stream==batch in tests/test_streaming.py. The ts
    column is deliberately untouched (no INT64-nanos exposure;
    the enrichment keys on event_id alone)."""
    from afg_data_pipeline_spark.plans.reference_semantics import (
        _PIP_POLYGONS,
    )
    from afg_data_pipeline_spark.streaming.geofence import (
        geofence_enrich,
    )

    ev = read_star_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type"
    )
    pts = ev.select(
        "event_id",
        "user_id",
        "event_type",
        (F.col("event_id") % 997).cast("double").alias("px"),
        ((F.col("event_id") * 31) % 991)
        .cast("double")
        .alias("py"),
    )
    return geofence_enrich(
        pts, _PIP_POLYGONS, id_col="event_id"
    ).select("event_id", "user_id", "event_type", "poly_id")
