"""Window-function declared queries (SURVEY.md §2.6, §2.8 scaffolds).

Top-K per group, analytic lag/lead frames, windowed row-sum
normalization (the reference's "softmax" that is actually row-share,
F7 note), and lag-gap sessionization. Window float sums use decimal
accumulation so frame-order evaluation matches DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from afg_data_pipeline_spark.io import read_star_table
from afg_data_pipeline_spark.plans.registry import register

_DEC = "decimal(18,6)"


@register(
    "ranking_functions",
    oracle="""
        SELECT o_custkey, o_orderkey,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               percent_rank() OVER w AS prnk,
               cume_dist() OVER w AS cdist,
               ntile(4) OVER w AS quartile
        FROM orders
        WINDOW w AS (
            PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC
        )
    """,
    ops=("O1", "A6"),
)
def ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking family over one window spec: rank,
    dense_rank, percent_rank, cume_dist, ntile.

    All five share a single (partition, order) sort, so Spark
    evaluates them in one Window node — one shuffle + one sort per
    partition, however many ranking columns ride on it. The order
    key carries a unique tie-break (o_orderkey), which is what
    makes ntile bucket membership and percent_rank exact across
    engines.
    """
    o = read_star_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "topk_per_group",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC
                   ) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    ops=("O3",),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (top-1-per-group generalized).

    Reference: the argmin/top-1 per comuna at
    temperaturas_rm.py:125-126. row_number over (partition, order)
    with a unique tie-break column keeps it deterministic. At scale
    this is one hash-partitioned sort per group — skew on a hot key
    is the risk; AQE skew handling plus the narrow projection keep
    it bounded.
    """
    o = read_star_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_analytics",
    oracle=f"""
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               lag(o_totalprice) OVER w AS prev_price,
               lead(o_totalprice) OVER w AS next_price,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS moving_sum3,
               ROW_NUMBER() OVER w AS order_seq
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
    ops=("O1", "A6"),
)
def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/moving-frame analytics over per-customer order time.

    Reference: the per-group date-ordered series walk that W1
    interpolation is built on (temperaturas_rm.py:185,200). The
    ordering folds into the window spec — no global sort.
    """
    o = read_star_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    wf = w.rowsBetween(-2, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.sum(F.col("o_totalprice").cast(_DEC))
        .over(wf)
        .cast("double")
        .alias("moving_sum3"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "row_share_normalize",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))) OVER (
                   PARTITION BY l_orderkey
               ) AS DOUBLE) AS order_revenue,
               (l_extendedprice * (1 - l_discount)) /
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))) OVER (
                   PARTITION BY l_orderkey
               ) AS DOUBLE) AS revenue_share
        FROM lineitem
    """,
    ops=("A6", "M3", "F7"),
)
def row_share_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-sum normalization — the reference's mislabeled "softmax".

    Reference: funcion_normalizacion, matriz_movilidad.ipynb cells
    31-32 (nb:369-390): labeled softmax, computes exp(x - rowmax)
    but never uses it, returns matrix / rowsum (SURVEY.md F7 note).
    Faithful semantics = plain row share:
    value / sum(value) OVER (PARTITION BY row). Implemented as a
    windowed sum — the partition-local aggregate never collapses
    rows, so no second join is needed.
    """
    li = read_star_table(spark, "lineitem", sf_dir)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    w = Window.partitionBy("l_orderkey")
    order_rev = (
        F.sum(revenue.cast(_DEC)).over(w).cast("double")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        order_rev.alias("order_revenue"),
        (revenue / order_rev).alias("revenue_share"),
    )


@register(
    "sessionize_lag_gap",
    oracle="""
        SELECT user_id, session_id,
               count(*) AS n_events,
               min(ts) AS session_start,
               max(ts) AS session_end
        FROM (
            SELECT user_id, ts,
                   CAST(SUM(is_new) OVER (
                       PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_id
            FROM (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER (
                                PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC
                            ) IS NULL
                         OR ts - lag(ts) OVER (
                                PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC
                            ) > INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS is_new
                FROM events
            )
        )
        GROUP BY user_id, session_id
    """,
    ops=("O1", "A1"),
)
def sessionize_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag(ts) gap > 30 min starts a session.

    The batch twin of streaming session_window (SURVEY.md §2.10):
    classic lag + cumulative-sum-of-boundaries. One window shuffle
    on user_id; the streaming variant lives in
    streaming/windows.py.
    """
    ev = read_star_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    # NTZ has no direct long cast; NTZ -> LTZ is value-preserving
    # under the UTC session timezone, then LTZ -> epoch seconds.
    secs = F.col("ts").cast("timestamp").cast("long")
    prev = F.lag("ts").over(w)
    prev_secs = prev.cast("timestamp").cast("long")
    is_new = F.when(
        prev.isNull() | ((secs - prev_secs) > 30 * 60), F.lit(1)
    ).otherwise(F.lit(0))
    sessions = ev.select(
        "user_id",
        "ts",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "range_frame_window",
    oracle="""
        SELECT user_id, event_id, ts, value,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts) // 1000000
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS rolling_1h_sum,
               CAST(COUNT(*) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts) // 1000000
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS rolling_1h_n
        FROM events
    """,
    ops=("O1", "A6"),
)
def range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-user rolling 1-hour sum/count.

    The value-based frame (all rows within 3600s of the current
    row's event time) — the frame spec rowsBetween can't express;
    ordering on epoch seconds so the frame bound is numeric in both
    engines.
    """
    ev = read_star_table(spark, "events", sf_dir)
    secs = F.col("ts").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(secs)
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.sum(F.col("value").cast(_DEC))
        .over(w)
        .cast("double")
        .alias("rolling_1h_sum"),
        F.count(F.lit(1)).over(w).alias("rolling_1h_n"),
    )
