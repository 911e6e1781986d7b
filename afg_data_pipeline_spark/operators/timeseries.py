"""Time-series scaffolding: regular per-group grids from event data.

The reference's imputation family (temperaturas_rm.py:157-243)
operates on a per-comuna daily series that has holes. The star-schema
analogue built here: a per-user hourly grid from `events`, with null
cells where a user had no events that hour — the same shape
(group × regular time index, nullable measure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from afg_data_pipeline_spark.io import read_star_table

_DEC = "decimal(18,6)"


def hourly_user_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """users × hours grid with nullable avg_value per cell.

    hidx = epoch-seconds div 3600 (integer hour since epoch);
    computed identically by the DuckDB oracles as
    epoch_us(ts) // 3600000000. The spine is data-driven
    (min..max hour across the table), so it is deterministic and
    scale-independent.

    Scale shape: the grid is |users| × |hours| — a crossJoin of two
    *derived small* sides (distinct users, a spark.range of hours),
    then one shuffle joining cells back. The events fact table is
    aggregated before any join, never expanded.
    """
    ev = read_star_table(spark, "events", sf_dir)
    # NTZ -> LTZ (identity under UTC session tz) -> epoch seconds,
    # then integer-divide to hours. Matches epoch_us // 3.6e9.
    with_h = ev.withColumn(
        "hidx",
        F.expr("cast(cast(ts as timestamp) as bigint) div 3600"),
    )
    cells = with_h.groupBy("user_id", "hidx").agg(
        (
            F.sum(F.col("value").cast(_DEC)).cast("double")
            / F.count("value").cast("double")
        ).alias("avg_value")
    )
    bounds = cells.agg(
        F.min("hidx").alias("mn"), F.max("hidx").alias("mx")
    ).collect()[0]
    hours = spark.range(bounds.mn, bounds.mx + 1).withColumnRenamed(
        "id", "hidx"
    )
    users = cells.select("user_id").distinct()
    # Expansion-side choice matters: the distinct-users exchange
    # carries ~1 row per user, so AQE coalesces it to 1 partition
    # and a users×hours crossJoin would inherit that — the whole
    # |users|·|hours| grid (and the downstream windows, which would
    # reuse the partitioning exchange-free) would execute in one
    # task. Streaming the Range instead keeps its native splits
    # (defaultParallelism, no exchange for AQE to shrink) and
    # broadcasts the small users list, so the expansion itself is
    # parallel; the window's own user_id shuffle then sees the
    # *expanded* size and coalesces proportionally.
    spine = hours.crossJoin(F.broadcast(users))
    # cells: no broadcast hint — small at bench scale (auto-BHJ),
    # shuffle join at real scale; AQE picks per run.
    return spine.join(cells, ["user_id", "hidx"], "left")


# SQL twin of hourly_user_grid for oracle CTEs.
GRID_SQL = """
    cells AS (
        SELECT user_id,
               epoch_us(ts) // 3600000000 AS hidx,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(COUNT(value) AS DOUBLE) AS avg_value
        FROM events
        GROUP BY 1, 2
    ),
    bounds AS (SELECT min(hidx) AS mn, max(hidx) AS mx FROM cells),
    spine AS (
        SELECT u.user_id, g.hidx
        FROM (SELECT DISTINCT user_id FROM cells) u
        CROSS JOIN (
            SELECT unnest(generate_series(
                (SELECT mn FROM bounds), (SELECT mx FROM bounds)
            )) AS hidx
        ) g
    ),
    series AS (
        SELECT s.user_id, s.hidx, c.avg_value
        FROM spine s
        LEFT JOIN cells c
          ON s.user_id = c.user_id AND s.hidx = c.hidx
    )
"""
