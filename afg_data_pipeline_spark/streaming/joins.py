"""Stream-stream joins (SURVEY.md §2.10 extended surface).

View→click attribution: each click joins the views of the same user
in the preceding attribution window. The join condition brackets
click time into [view_ts, view_ts + window] — the event-time
constraint Structured Streaming needs to bound state on BOTH sides:
a buffered view is evicted once the click watermark passes
view_ts + window (no future click can match it), and vice versa.
Without the bracket, a stream-stream join would buffer both streams
forever.

withWatermark is a no-op on batch DataFrames, so the very same
function is oracle-checked against DuckDB SQL in batch
(plans/streaming_batch.py) and asserted stream == batch in
tests/test_streaming.py — the same close-the-loop pattern as the
windowed aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    views: DataFrame,
    clicks: DataFrame,
    window: str = "4 hours",
    delay: str = "2 hours",
) -> DataFrame:
    """Per-user view→click pairs within the attribution window.

    Works on batch and streaming inputs; streaming requires both
    sides watermarked (done here) and emits inner-join results
    incrementally as matches arrive.
    """
    # Watermarks require TIMESTAMP (LTZ); NTZ -> LTZ is an identity
    # under the engine's pinned UTC session timezone.
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").cast("timestamp").alias("view_ts"),
    ).withWatermark("view_ts", delay)
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").cast("timestamp").alias("click_ts"),
    ).withWatermark("click_ts", delay)
    cond = (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (
            F.col("click_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {window}")
        )
    )
    return v.join(c, cond, "inner").select(
        "view_id",
        "click_id",
        F.col("v_user").alias("user_id"),
        "view_ts",
        "click_ts",
    )


def attribution_join_outer(
    views: DataFrame,
    clicks: DataFrame,
    window: str = "4 hours",
    delay: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER view→click attribution: every view appears —
    matched views with their click(s), unconverted views with NULL
    click columns. The unconverted rows are what a funnel actually
    bills against, and they are the semantically hard half of a
    stream-stream join: Structured Streaming can only emit a
    null-extended row once the CLICK watermark has passed
    view_ts + window (no future click can match anymore), so
    unconverted views surface with watermark latency, not
    immediately. In batch the same function is a plain left join,
    which is how the oracle checks it; the stream==batch test
    drives the watermark past the last real view with a flush
    sentinel (the production heartbeat pattern — without it the
    tail's unmatched views stay buffered forever on a quiet
    stream).
    """
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").cast("timestamp").alias("view_ts"),
    ).withWatermark("view_ts", delay)
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").cast("timestamp").alias("click_ts"),
    ).withWatermark("click_ts", delay)
    cond = (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (
            F.col("click_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {window}")
        )
    )
    return v.join(c, cond, "leftOuter").select(
        "view_id",
        "click_id",
        F.col("v_user").alias("user_id"),
        "view_ts",
        "click_ts",
    )


def enrich_with_dimension(
    events: DataFrame,
    dim: DataFrame,
    event_key: str,
    dim_key: str,
    dim_cols: list[str],
) -> DataFrame:
    """Stream-static dimension enrichment: each micro-batch joins
    against the (broadcast) static table — no watermark and no join
    state, because the static side is re-read per batch rather than
    buffered. The canonical "stamp the event with its customer
    attributes" production shape; works identically on a batch
    DataFrame, which is how the oracle checks it.
    """
    d = dim.select(
        F.col(dim_key).alias("__dk"),
        *[F.col(c) for c in dim_cols],
    )
    return events.join(
        F.broadcast(d), events[event_key] == F.col("__dk"), "inner"
    ).drop("__dk")
