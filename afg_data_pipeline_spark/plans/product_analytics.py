"""Product-analytics query shapes over the events table: funnel
conversion and cohort retention — the two canonical event-log
aggregations a large-scale analytics engine must express well.

Both stay in conditional-aggregate + equi-join algebra (no window
over the full event stream, no per-user UDF): every stage shuffles
on user_id, so AQE aligns the exchanges, and the per-user state is
a handful of timestamps — the shape that survives a 100 TB event
log with billions of users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from afg_data_pipeline_spark.functions.numeric import (
    dsum_expr,
    sql_dsum,
)
from afg_data_pipeline_spark.io import read_star_table
from afg_data_pipeline_spark.plans.registry import register


@register(
    "funnel_conversion",
    oracle="""
        WITH s AS (
            SELECT user_id, min(ts) AS s_ts
            FROM events WHERE event_type = 'signup'
            GROUP BY user_id
        ), v AS (
            SELECT e.user_id, min(e.ts) AS v_ts
            FROM events e JOIN s ON s.user_id = e.user_id
            WHERE e.event_type = 'view' AND e.ts > s.s_ts
            GROUP BY e.user_id
        ), p AS (
            SELECT e.user_id, min(e.ts) AS p_ts
            FROM events e JOIN v ON v.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > v.v_ts
            GROUP BY e.user_id
        )
        SELECT (SELECT count(*) FROM s) AS n_signup,
               (SELECT count(*) FROM v) AS n_view_after_signup,
               (SELECT count(*) FROM p) AS n_purchase_after_view
    """,
    ops=("A1", "J1", "STREAM"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: signup → first view after signup → first
    purchase after that view, counted per stage.

    Each stage is min-timestamp conditional aggregation joined to
    the previous stage's per-user anchor — strictly sequential
    semantics (a view before the signup does not count) without
    sorting the event stream. Three shuffles, all on user_id; the
    per-user state never exceeds one timestamp per stage.
    """
    ev = read_star_table(spark, "events", sf_dir).select(
        "user_id", "event_type", "ts"
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    counts = [
        s.agg(F.count(F.lit(1)).alias("n_signup")),
        v.agg(F.count(F.lit(1)).alias("n_view_after_signup")),
        p.agg(F.count(F.lit(1)).alias("n_purchase_after_view")),
    ]
    out = counts[0].crossJoin(counts[1]).crossJoin(counts[2])
    return out


@register(
    "cohort_retention",
    oracle="""
        WITH cohort AS (
            SELECT user_id,
                   CAST(date_trunc('week', min(ts)) AS TIMESTAMP)
                       AS cohort_week
            FROM events GROUP BY user_id
        ), activity AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS TIMESTAMP)
                       AS active_week
            FROM events
        )
        SELECT c.cohort_week,
               CAST(date_diff('day', c.cohort_week, a.active_week)
                    / 7 AS BIGINT) AS weeks_since,
               count(*) AS n_active_users
        FROM cohort c
        JOIN activity a ON a.user_id = c.user_id
        GROUP BY c.cohort_week, weeks_since
    """,
    ops=("A1", "J1", "P12"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention grid: users bucketed by first-seen
    week, counted in each subsequent week they were active.

    cohort and activity both reduce the raw log before the join —
    the join carries (user, week) pairs, never events. The
    week-difference is exact integer arithmetic on dates, so the
    grid is bit-stable. (user, week) dedup is a partial-aggregable
    distinct; at 100 TB it collapses billions of events to at most
    users × weeks rows map-side.
    """
    ev = read_star_table(spark, "events", sf_dir).select(
        "user_id", "ts"
    )
    week = lambda c: F.date_trunc("week", c)  # noqa: E731
    cohort = ev.groupBy("user_id").agg(
        week(F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", week(F.col("ts")).alias("active_week")
    ).distinct()
    return (
        cohort.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week"))
                / 7
            )
            .cast("long")
            .alias("weeks_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


@register(
    "cdc_upsert_snapshot",
    oracle="""
        SELECT user_id, event_id, event_type, value, ts
        FROM (
            SELECT user_id, event_id, event_type, value, ts,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    ops=("A5", "J1"),
)
def cdc_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply: current state per user — a first-half-of-month
    base snapshot upserted with the second half's changes via
    latest-wins merge (operators/cdc.py).

    The merge is one grouped max_by (partial-aggregable: each map
    task pre-collapses to one candidate per key), not the
    window/row_number formulation the oracle uses — same result,
    no per-group sort of the full history.
    """
    from afg_data_pipeline_spark.operators.cdc import merge_latest

    ev = read_star_table(spark, "events", sf_dir).select(
        "user_id", "event_id", "event_type", "value", "ts"
    )
    cut = F.lit("2024-01-15").cast("timestamp_ntz")
    base = ev.filter(F.col("ts") < cut)
    updates = ev.filter(F.col("ts") >= cut)
    return merge_latest(
        base,
        updates,
        keys=["user_id"],
        ts_col="ts",
        tie_col="event_id",
    )


@register(
    "scd2_history",
    oracle="""
        SELECT user_id, event_id, value AS state_value,
               ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               CAST(CASE WHEN lead(ts) OVER w IS NULL
                         THEN 1 ELSE 0 END AS INTEGER) AS is_current
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        )
    """,
    ops=("O1", "A6"),
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing history: every change record becomes
    a validity interval [valid_from, valid_to) closed by the next
    change of the same key; the open interval is the current row.

    One window (lead over the per-key change order) builds the
    whole history — the warehousing twin of the CDC latest-wins
    merge: merge_latest keeps only the current row, this keeps them
    all with their validity ranges.
    """
    from pyspark.sql import Window

    ev = read_star_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.col("value").alias("state_value"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("int").alias(
            "is_current"
        ),
    )


@register(
    "audience_overlap",
    oracle="""
        WITH a AS (
            SELECT DISTINCT event_type, user_id FROM events
        )
        SELECT x.event_type AS type_a, y.event_type AS type_b,
               count(*) AS n_shared_users
        FROM a x JOIN a y
          ON x.user_id = y.user_id
         AND x.event_type < y.event_type
        GROUP BY type_a, type_b
    """,
    ops=("A1", "A7", "J1"),
)
def audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience intersection: for every pair of event types, how
    many distinct users do both — the segment-overlap analytic.

    The raw log first collapses to distinct (type, user) pairs (a
    partial-aggregable dedup), so the self-join multiplies segment
    memberships, never events: with k types a user contributes at
    most k(k-1)/2 pair rows. Both sides shuffle on user_id; the
    per-pair count needs no second distinct because the joined
    rows are already unique per (pair, user).
    """
    ev = read_star_table(spark, "events", sf_dir)
    a = ev.select("event_type", "user_id").distinct()
    x = a.select(
        F.col("event_type").alias("type_a"), "user_id"
    )
    y = a.select(
        F.col("event_type").alias("type_b"), "user_id"
    )
    return (
        x.join(
            y,
            (x.user_id == y.user_id)
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_shared_users"))
    )


@register(
    "activity_by_dow_hour",
    oracle="""
        SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
               CAST(hour(ts) AS INTEGER) AS hod,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY dow, hod
    """,
    ops=("A1", "P12"),
)
def activity_by_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-of-week activity matrix (day-of-week × hour): the
    standard usage-heatmap aggregation — pure date-part extraction
    into a ≤168-group partial-aggregable count.

    Convention trap: Spark's dayofweek is 1=Sunday..7, DuckDB's is
    0=Sunday..6 — the oracle adds 1. Both evaluate under the
    pinned UTC session timezone.
    """
    ev = read_star_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.dayofweek("ts").cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


@register(
    "running_user_balance",
    oracle="""
        SELECT event_id, user_id, ts,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
                   PARTITION BY user_id
                   ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_total
        FROM events
    """,
    ops=("A6", "O1"),
)
def running_user_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running total over event time — the cumulative-sum
    window, accumulated in DECIMAL inside the frame so every prefix
    sum (not just the final one) is bit-stable across engines and
    partitionings. The frame is unbounded-PRECEDING (incremental
    evaluation); the ordering carries the event-id tie-break.
    """
    from pyspark.sql import Window

    ev = read_star_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@register(
    "user_value_anomalies",
    oracle="""
        WITH stats AS (
            SELECT user_id,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                       AS s1,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))
                            * CAST(value AS DECIMAL(18,6)))
                        AS DOUBLE) AS s2,
                   CAST(count(*) AS DOUBLE) AS n
            FROM events GROUP BY user_id
        )
        SELECT e.event_id, e.user_id, e.value,
               (e.value - s.s1 / s.n)
               / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1.0))
                   AS zscore
        FROM events e JOIN stats s ON s.user_id = e.user_id
        WHERE s.n > 1.0
          AND abs((e.value - s.s1 / s.n)
                  / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1.0)))
              > CAST(2.5 AS DOUBLE)
    """,
    ops=("A1", "J1", "F6"),
)
def user_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score anomaly flags: events more than 2.5 sample
    standard deviations from their user's mean.

    The variance comes from explicitly decimal-accumulated Σv and
    Σv² — NOT the engines' stddev() aggregates, whose streaming
    (Welford) updates are order-dependent and differ between
    engines. From identical sums, mean/variance/z are the same
    IEEE expression on both sides, so even the > 2.5 boundary rows
    match exactly. One shuffle for the stats, one for the join —
    both on user_id, so AQE aligns the layouts.
    """
    ev = read_star_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "value"
    )
    dec = F.col("value").cast("decimal(18,6)")
    stats = ev.groupBy("user_id").agg(
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec * dec).cast("double").alias("s2"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    s1, s2, n = F.col("s1"), F.col("s2"), F.col("n")
    z = (F.col("value") - s1 / n) / F.sqrt(
        (s2 - s1 * s1 / n) / (n - 1.0)
    )
    return (
        ev.join(stats, "user_id")
        .filter((n > 1.0) & (F.abs(z) > 2.5))
        .select("event_id", "user_id", "value", z.alias("zscore"))
    )


@register(
    "value_histogram",
    oracle=f"""
        SELECT CAST(least(floor(value / 50.0), 9) AS INTEGER)
                   AS bucket,
               count(*) AS n,
               {sql_dsum("value", "bucket_total")}
        FROM events
        GROUP BY bucket
    """,
    ops=("A1", "F6"),
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values (10 × 50-unit buckets,
    top bucket open) — the one-pass distribution profile: bucket
    assignment is a scalar expression, so the whole histogram is a
    single partial-aggregable groupBy with at most n_buckets output
    rows regardless of input size.

    floor(value/50) is the same IEEE operation in both engines, so
    bucket membership — and the decimal-accumulated per-bucket
    sums — match the oracle exactly.
    """
    ev = read_star_table(spark, "events", sf_dir)
    bucket = F.least(
        F.floor(F.col("value") / 50.0), F.lit(9)
    ).cast("int")
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum_expr(F.col("value"), "bucket_total"),
        )
    )


@register(
    "winsorized_user_spend",
    oracle=f"""
        WITH q AS (
            SELECT quantile_cont(value, 0.05) AS lo,
                   quantile_cont(value, 0.95) AS hi
            FROM events
        )
        SELECT e.user_id,
               {sql_dsum(
                   "least(greatest(e.value, q.lo), q.hi)",
                   "total_clipped")},
               count(*) AS n_events
        FROM events e, q
        GROUP BY e.user_id
    """,
    ops=("A1", "A2", "F2"),
)
def winsorized_user_spend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Winsorized (outlier-clipped) per-user totals: values clamped
    to the global [p05, p95] before aggregation — the robust-sum
    pattern that keeps one fat-finger event from dominating a
    metric.

    The exact percentiles are a 1-row aggregate broadcast back via
    cross join (no .collect() round-trip); Spark's percentile and
    DuckDB's quantile_cont share the linear-interpolation formula,
    verified bit-identical, so the clip boundaries — and therefore
    every clipped value — match exactly.
    """
    ev = read_star_table(spark, "events", sf_dir).select(
        "user_id", "value"
    )
    q = ev.agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    clipped = F.least(
        F.greatest(F.col("value"), F.col("lo")), F.col("hi")
    )
    return (
        ev.crossJoin(F.broadcast(q))
        .groupBy("user_id")
        .agg(
            dsum_expr(clipped, "total_clipped"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "data_quality_report",
    oracle="""
        SELECT 'orders_pk_unique' AS check_name,
               CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
                   AS violations
        FROM orders
        UNION ALL
        SELECT 'orders_custkey_not_null',
               CAST(count(*) - count(o_custkey) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orders_status_accepted',
               CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P')
                             THEN 0 ELSE 1 END) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'lineitem_orderkey_fk',
               CAST(count(*) AS BIGINT)
        FROM lineitem l
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_orderkey = l.l_orderkey
        )
    """,
    ops=("A1", "A7", "J1"),
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (operators/quality.py):
    primary-key uniqueness, not-null, accepted values, and
    referential integrity compiled to scan-aggregates — a 100 TB
    audit is a handful of partial-aggregable jobs, not a
    row-by-row validator."""
    from afg_data_pipeline_spark.operators.quality import (
        accepted_values_check,
        foreign_key_check,
        not_null_check,
        run_checks,
        unique_key_check,
    )

    o = read_star_table(spark, "orders", sf_dir)
    li = read_star_table(spark, "lineitem", sf_dir)
    return run_checks(
        [
            unique_key_check(o, ["o_orderkey"], "orders_pk_unique"),
            not_null_check(o, "o_custkey", "orders_custkey_not_null"),
            accepted_values_check(
                o,
                "o_orderstatus",
                ["O", "F", "P"],
                "orders_status_accepted",
            ),
            foreign_key_check(
                li, o, "l_orderkey", "o_orderkey", "lineitem_orderkey_fk"
            ),
        ]
    )


@register(
    "fuzzy_part_names",
    oracle="""
        WITH p AS (SELECT DISTINCT p_name FROM part)
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS INTEGER)
                   AS distance
        FROM p a JOIN p b
          ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
         AND abs(length(a.p_name) - length(b.p_name)) <= 1
         AND a.p_name < b.p_name
         AND levenshtein(a.p_name, b.p_name) <= 3
    """,
    ops=("J1", "F1"),
)
def fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy self-match over part names: edit
    distance ≤ 3 under first-character blocking + length band
    (operators/joins.fuzzy_join_blocked) — the dedup-adjacent
    string-matching shape, without enumerating all pairs."""
    from afg_data_pipeline_spark.operators.joins import (
        fuzzy_join_blocked,
    )

    p = read_star_table(spark, "part", sf_dir)
    return fuzzy_join_blocked(p, p, "p_name", "p_name")


@register(
    "cusum_changepoint",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   CAST(sum(CAST(round(CAST(value AS DOUBLE)
                                       * 100) AS BIGINT))
                        AS BIGINT) AS v
            FROM events GROUP BY 1, 2
        ),
        stats AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_days,
                   CAST(sum(v) AS BIGINT) AS total
            FROM daily GROUP BY 1
        ),
        cum AS (
            SELECT d.event_type, d.d,
                   SUM(d.v) OVER (PARTITION BY d.event_type
                                  ORDER BY d.d
                                  ROWS UNBOUNDED PRECEDING)
                       AS pref,
                   row_number() OVER (PARTITION BY d.event_type
                                      ORDER BY d.d) AS t,
                   s.n_days, s.total
            FROM daily d JOIN stats s USING (event_type)
        ),
        dev AS (
            SELECT event_type, d, n_days,
                   CAST(n_days AS HUGEINT) * pref
                       - CAST(t AS HUGEINT) * total AS c
            FROM cum
        ),
        best AS (
            SELECT event_type, d, n_days, c,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY abs(c) DESC, d ASC) AS rk
            FROM dev
        )
        SELECT event_type,
               d AS changepoint_day,
               CAST(n_days AS BIGINT) AS n_days,
               CAST(c AS DOUBLE) / CAST(n_days AS DOUBLE)
                   / 100.0 AS cusum_peak_value
        FROM best WHERE rk = 1
    """,
    ops=("O1", "A1"),
)
def cusum_changepoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CUSUM CHANGEPOINT detection per event type: the day where
    the cumulative deviation of daily value from the series mean
    peaks in magnitude — the classic single-changepoint locator of
    monitoring pipelines (a level shift puts the |CUSUM| maximum
    at the shift). Reported with the peak's signed value.

    Exactness: the statistic is computed SCALED by n_days —
    C'_t = n·prefix_t − t·total — so the argmax runs on exact
    integers (DECIMAL(38,0): n·prefix has no provable 2^63 bound,
    rule 11) and only the REPORTED peak divides back to value
    units once. Ties break to the earliest day. Scale: the corpus
    collapses to the (type, day) table in one map-side-combinable
    pass; windows run over days-per-type only (value-space
    bounded)."""
    from pyspark.sql import Window

    ev = read_star_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(
        F.sum(
            F.round(F.col("value").cast("double") * 100).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("v")
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("v").cast("bigint").alias("total"),
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wr = Window.partitionBy("event_type").orderBy("d")
    cum = (
        daily.withColumn("pref", F.sum("v").over(wp))
        .withColumn("t", F.row_number().over(wr))
        .join(stats, "event_type")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    dev = cum.select(
        "event_type",
        "d",
        "n_days",
        (dec("n_days") * dec("pref") - dec("t") * dec("total"))
        .cast("decimal(38,0)")
        .alias("c"),
    )
    best = dev.groupBy("event_type").agg(
        F.min(
            F.struct(
                (-F.abs(F.col("c"))).alias("negabs"),
                F.col("d").alias("d"),
                F.col("c").alias("c"),
                F.col("n_days").alias("n_days"),
            )
        ).alias("b")
    )
    return best.select(
        "event_type",
        F.col("b.d").alias("changepoint_day"),
        F.col("b.n_days").alias("n_days"),
        (
            F.col("b.c").cast("double")
            / F.col("b.n_days").cast("double")
            / F.lit(100.0)
        ).alias("cusum_peak_value"),
    )


@register(
    "gini_user_spend",
    oracle="""
        WITH totals AS (
            SELECT event_type, user_id,
                   CAST(sum(CAST(round(CAST(value AS DOUBLE)
                                       * 100) AS BIGINT))
                        AS BIGINT) AS v
            FROM events GROUP BY 1, 2
        ),
        counts AS (
            SELECT event_type, v,
                   CAST(count(*) AS BIGINT) AS c
            FROM totals GROUP BY 1, 2
        ),
        cum AS (
            SELECT event_type, v, c,
                   SUM(c) OVER (PARTITION BY event_type
                                ORDER BY v
                                ROWS UNBOUNDED PRECEDING)
                       AS cum
            FROM counts
        ),
        blocks AS (
            SELECT event_type, c, v,
                   CAST(v AS HUGEINT)
                       * ((CAST(cum AS HUGEINT) * (cum + 1)) // 2
                          - (CAST(cum - c AS HUGEINT)
                             * (cum - c + 1)) // 2) AS s_block,
                   CAST(v AS HUGEINT) * c AS t_block
            FROM cum
        ),
        g AS (
            SELECT event_type,
                   CAST(sum(c) AS HUGEINT) AS n,
                   CAST(sum(t_block) AS HUGEINT) AS t,
                   CAST(sum(s_block) AS HUGEINT) AS s
            FROM blocks GROUP BY 1
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_users,
               CAST(t AS DOUBLE) / 100.0 AS total_value,
               (2.0 * CAST(s AS DOUBLE)
                - (CAST(n AS DOUBLE) + 1.0) * CAST(t AS DOUBLE))
                   / nullif(CAST(n AS DOUBLE)
                            * CAST(t AS DOUBLE), 0.0) AS gini
        FROM g
    """,
    ops=("A1", "O1"),
)
def gini_user_spend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GINI concentration of per-user spend within each event
    type — the inequality measure behind "do 1% of users drive 90%
    of volume" dashboards (and, in corpus curation, "do 1% of
    domains contribute 90% of documents"). Computed exactly from
    the classic rank identity G = (2·Σ iᐧxᵢ − (n+1)·Σx)/(n·Σx)
    with ties collapsed: equal totals contribute their rank-range
    sum in closed form (rank-block arithmetic on the
    value-compressed count table — tie order provably cancels),
    so there is never a per-user global sort. All sums are exact
    integers in DECIMAL(38,0) (rule 11); one double division at
    the end, NULL when total spend is zero.

    Scale: corpus → per-user totals (map-side combinable) →
    per-(type, value) counts → a cumulative window over the
    value-compressed table only (the quantiles-operator shape)."""
    from pyspark.sql import Window

    ev = read_star_table(spark, "events", sf_dir)
    cents = F.round(F.col("value").cast("double") * 100).cast(
        "bigint"
    )
    totals = ev.select(
        "event_type", "user_id", cents.alias("cents")
    ).groupBy("event_type", "user_id").agg(
        F.sum("cents").cast("bigint").alias("v")
    )
    counts = totals.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cum = counts.withColumn("cum", F.sum("c").over(w))
    blocks = cum.select(
        "event_type",
        "c",
        (
            dec(F.col("v"))
            * (
                (dec(F.col("cum")) * dec(F.col("cum") + 1)).cast(
                    "decimal(38,0)"
                )
                - (
                    dec(F.col("cum") - F.col("c"))
                    * dec(F.col("cum") - F.col("c") + 1)
                ).cast("decimal(38,0)")
            )
            / 2
        ).cast("decimal(38,0)").alias("s_block"),
        (dec(F.col("v")) * dec(F.col("c"))).alias("t_block"),
    )
    g = blocks.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum("t_block").cast("decimal(38,0)").alias("t"),
        F.sum("s_block").cast("decimal(38,0)").alias("s"),
    )
    n = F.col("n").cast("double")
    t = F.col("t").cast("double")
    s = F.col("s").cast("double")
    return g.select(
        "event_type",
        F.col("n").alias("n_users"),
        (t / F.lit(100.0)).alias("total_value"),
        (
            (F.lit(2.0) * s - (n + F.lit(1.0)) * t)
            / F.nullif(n * t, F.lit(0.0))
        ).alias("gini"),
    )


@register(
    "funnel_step_latency",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type, ts,
                   lead(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id) AS to_type,
                   lead(ts) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id) AS to_ts
            FROM events
        ),
        trans AS (
            SELECT event_type || '>' || to_type AS transition,
                   date_diff('microsecond', ts, to_ts) AS delta
            FROM seq WHERE to_ts IS NOT NULL
        ),
        counts AS (
            SELECT transition AS g, delta AS v, count(*) AS c
            FROM trans GROUP BY 1, 2
        ),
        cum AS (
            SELECT g, v,
                   SUM(c) OVER (PARTITION BY g ORDER BY v
                                ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(c) OVER (PARTITION BY g) AS n
            FROM counts
        ),
        pct AS (
            SELECT g AS transition,
                   CAST(max(n) AS BIGINT) AS n,
                   CAST(min(CASE WHEN cum >= (n * 1 + 1) // 2
                                 THEN v END) AS BIGINT)
                       AS p50_usec,
                   CAST(min(CASE WHEN cum >= (n * 9 + 9) // 10
                                 THEN v END) AS BIGINT)
                       AS p90_usec
            FROM cum GROUP BY g
        ),
        mu AS (
            SELECT transition,
                   CAST(sum(CAST(delta AS HUGEINT)) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE)
                       AS mean_delta_usec
            FROM trans GROUP BY 1
        )
        SELECT p.transition, p.n, m.mean_delta_usec,
               p.p50_usec, p.p90_usec
        FROM pct p JOIN mu m USING (transition)
    """,
    ops=("O1", "A2"),
)
def funnel_step_latency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TIME-TO-NEXT-STEP latency per event-type transition: for
    every consecutive (from>to) pair in each user's stream, the
    exact microsecond gap — count, mean, and discrete p50/p90 per
    transition. The product-analytics companion to
    event_transition_matrix (WHICH step follows) and
    funnel_conversion (whether) — this is HOW LONG it takes.

    Exactness: gaps are exact µs integers (unix_micros under the
    pinned-UTC session, the time_weighted_value convention); the
    mean divides a DECIMAL(38,0) sum once (rule 11 — µs gaps over
    a year-long trace have no provable 2^63 sum bound); p50/p90
    use ceil(q·n) ranks in exact integer arithmetic
    (operators/quantiles.grouped_percentile_disc). Scale: one
    user-partitioned lead window over the corpus, then everything
    runs on the (transition, delta)-distinct count table."""
    from pyspark.sql import Window

    from afg_data_pipeline_spark.operators.quantiles import (
        grouped_percentile_disc,
    )

    ev = read_star_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        "ts",
        F.lead("event_type").over(w).alias("to_type"),
        F.lead("ts").over(w).alias("to_ts"),
    ).filter(F.col("to_ts").isNotNull())
    trans = seq.select(
        F.concat(
            F.col("event_type"), F.lit(">"), F.col("to_type")
        ).alias("transition"),
        (
            F.unix_micros(F.col("to_ts").cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("delta_usec"),
    ).localCheckpoint(eager=False)
    pct = grouped_percentile_disc(
        trans, "transition", "delta_usec", [0.5, 0.9]
    ).select(
        "transition",
        "n",
        F.col("p50").cast("bigint").alias("p50_usec"),
        F.col("p90").cast("bigint").alias("p90_usec"),
    )
    mu = trans.groupBy("transition").agg(
        (
            F.sum(F.col("delta_usec").cast("decimal(38,0)"))
            .cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_delta_usec")
    )
    return pct.join(mu, "transition").select(
        "transition", "n", "mean_delta_usec", "p50_usec",
        "p90_usec",
    )


@register(
    "correlation_matrix",
    oracle="""
        WITH pts AS (
            SELECT event_type,
                   date_trunc('hour', ts) AS h,
                   CAST(round(CAST(value AS DOUBLE) * 100)
                        AS BIGINT) AS cents
            FROM events
        ),
        buckets AS (
            SELECT event_type, h,
                   CAST(sum(cents) AS BIGINT) AS v
            FROM pts GROUP BY 1, 2
        ),
        hours AS (SELECT DISTINCT h FROM pts),
        types AS (SELECT DISTINCT event_type FROM pts),
        series AS (
            SELECT t.event_type, hh.h,
                   COALESCE(b.v, 0) AS v
            FROM types t CROSS JOIN hours hh
            LEFT JOIN buckets b
              ON b.event_type = t.event_type AND b.h = hh.h
        ),
        s AS (
            SELECT a.event_type AS type_a,
                   b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_buckets,
                   CAST(SUM(CAST(a.v AS HUGEINT)) AS HUGEINT)
                       AS sx,
                   CAST(SUM(CAST(b.v AS HUGEINT)) AS HUGEINT)
                       AS sy,
                   SUM(CAST(a.v AS HUGEINT) * a.v) AS sxx,
                   SUM(CAST(b.v AS HUGEINT) * b.v) AS syy,
                   SUM(CAST(a.v AS HUGEINT) * b.v) AS sxy
            FROM series a
            JOIN series b
              ON a.h = b.h AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT type_a, type_b, n_buckets,
               CASE WHEN (CAST(n_buckets AS DOUBLE)
                              * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE)
                              * CAST(sx AS DOUBLE))
                         * (CAST(n_buckets AS DOUBLE)
                                * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE)
                                * CAST(sy AS DOUBLE)) = 0.0
                    THEN NULL
                    ELSE (CAST(n_buckets AS DOUBLE)
                              * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE)
                              * CAST(sy AS DOUBLE))
                         / sqrt((CAST(n_buckets AS DOUBLE)
                                     * CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE)
                                     * CAST(sx AS DOUBLE))
                                * (CAST(n_buckets AS DOUBLE)
                                       * CAST(syy AS DOUBLE)
                                   - CAST(sy AS DOUBLE)
                                       * CAST(sy AS DOUBLE)))
               END AS pearson_r
        FROM s
    """,
    ops=("A1", "J4", "F10"),
)
def correlation_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise Pearson CORRELATION MATRIX of the event types'
    hourly value series (zero-filled over the common hour grid) —
    the co-movement table behind metric dashboards and redundant-
    signal pruning. Exactness: hourly sums are exact BIGINT cents;
    all five moment sums accumulate in DECIMAL(38,0) (an hourly
    cell's square has no provable 2^63 bound at corpus scale,
    rule 11); Pearson is the textbook closed form evaluated once
    in doubles (sqrt is IEEE correctly-rounded — portable, the
    value_hour_correlation convention), NULL for zero variance.

    Scale shape: the corpus collapses FIRST to the (type, hour)
    bucket table (map-side combinable); the zero-filled grid and
    the pair join live entirely in (|types| x hours) value space —
    the |types|^2/2 pair fan-out never touches event rows."""
    ev = read_star_table(spark, "events", sf_dir)
    pts = ev.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("h"),
        F.round(F.col("value").cast("double") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    # ONE corpus aggregate, checkpointed (rule 12): the bucket
    # table feeds the hour grid, the type list, AND both sides of
    # the pair self-join — without truncation the events scan
    # re-runs six times (plan-audited r7: 6 scans → 1).
    buckets = (
        pts.groupBy("event_type", "h")
        .agg(F.sum("cents").cast("bigint").alias("v"))
        .localCheckpoint(eager=False)
    )
    hours = buckets.select("h").distinct()
    types = buckets.select("event_type").distinct()
    series = (
        types.crossJoin(hours)
        .join(buckets, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            F.coalesce(F.col("v"), F.lit(0)).alias("v"),
        )
    )
    a, b = series.alias("a"), series.alias("b")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.sum(dec(F.col("a.v"))).alias("sx"),
            F.sum(dec(F.col("b.v"))).alias("sy"),
            F.sum(dec(F.col("a.v")) * dec(F.col("a.v"))).alias(
                "sxx"
            ),
            F.sum(dec(F.col("b.v")) * dec(F.col("b.v"))).alias(
                "syy"
            ),
            F.sum(dec(F.col("a.v")) * dec(F.col("b.v"))).alias(
                "sxy"
            ),
        )
    )
    n = F.col("n_buckets").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    return s.select(
        "type_a",
        "type_b",
        "n_buckets",
        F.when(varx * vary == 0.0, F.lit(None)).otherwise(
            (n * sxy - sx * sy) / F.sqrt(varx * vary)
        ).alias("pearson_r"),
    )


@register(
    "value_hour_correlation",
    oracle="""
        WITH pts AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS x,
                   CAST(hour(ts) AS BIGINT) AS y
            FROM events
        ),
        s AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM pts GROUP BY event_type
        )
        SELECT event_type, n,
               CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                         = 0.0
                    THEN NULL
                    ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / sqrt((CAST(n AS DOUBLE)
                                 * CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE)
                                   * CAST(sx AS DOUBLE))
                                * (CAST(n AS DOUBLE)
                                   * CAST(syy AS DOUBLE)
                                   - CAST(sy AS DOUBLE)
                                     * CAST(sy AS DOUBLE)))
               END AS corr_value_hour
        FROM s
    """,
    ops=("A1", "F10"),
)
def value_hour_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-event-type Pearson correlation between transaction value
    and hour-of-day — the engagement-seasonality diagnostic, and
    the registry's group-wise second-moment showcase.

    Determinism: events.value is 2-decimal money, so x =
    round(value·100) is an EXACT BIGINT (the lsum trick); y =
    hour(ts) is an integer. All five moment sums are then exact
    integer arithmetic — associative, partitioning-invariant,
    identical in DuckDB — and the correlation is one mirrored
    double expression over them (zero-variance groups -> NULL).
    One shuffle (groupBy event_type, partial-aggregated map-side);
    no window, no second pass — the classic one-pass moments
    formulation, safe here because the integer sums can't lose
    precision the way naive float moment accumulation does.
    """
    ev = read_star_table(spark, "events", sf_dir)
    pts = ev.select(
        "event_type",
        F.round(F.col("value") * 100, 0)
        .cast("bigint")
        .alias("x"),
        F.hour("ts").cast("bigint").alias("y"),
    )
    s = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )

    def d(c: str):
        return F.col(c).cast("double")

    vx = d("n") * d("sxx") - d("sx") * d("sx")
    vy = d("n") * d("syy") - d("sy") * d("sy")
    num = d("n") * d("sxy") - d("sx") * d("sy")
    return s.select(
        "event_type",
        "n",
        F.when(vx * vy == F.lit(0.0), F.lit(None).cast("double"))
        .otherwise(num / F.sqrt(vx * vy))
        .alias("corr_value_hour"),
    )


@register(
    "robust_outlier_counts",
    oracle="""
        WITH med AS (
            SELECT event_type,
                   quantile_cont(value, 0.5) AS med
            FROM events GROUP BY event_type
        ),
        dev AS (
            SELECT e.event_type,
                   abs(e.value - m.med) AS dev, m.med
            FROM events e JOIN med m USING (event_type)
        ),
        mad AS (
            SELECT event_type, quantile_cont(dev, 0.5) AS mad
            FROM dev GROUP BY event_type
        )
        SELECT d.event_type,
               CAST(count(*) AS BIGINT) AS n,
               min(d.med) AS median_value,
               min(m.mad) AS mad,
               CAST(count(*) FILTER (
                   WHERE d.dev > 4.4478 * m.mad
               ) AS BIGINT) AS n_outliers
        FROM dev d JOIN mad m USING (event_type)
        GROUP BY d.event_type
    """,
    ops=("A2", "A4"),
)
def robust_outlier_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Median/MAD robust outlier detection per event type — the
    heavy-tail-safe sibling of the z-score anomaly query
    (`user_value_anomalies`): flag |value − median| > 3·1.4826·MAD
    (literal 4.4478 on BOTH engines — folding 3·1.4826 separately
    can differ in the last ulp).

    Two exact interpolating percentiles (Spark `percentile` ≡
    DuckDB quantile_cont bit-for-bit, the agg_median convention)
    + equi-joins back on event_type; every derived value is the
    same IEEE expression on both engines. At 100 TB the exact
    percentile is a per-group sort — approx_percentile is the
    documented scale escape, same as agg_median.
    """
    ev = read_star_table(spark, "events", sf_dir).select(
        "event_type", "value"
    )
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(med, "event_type").select(
        "event_type",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
        "med",
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("dev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("med").alias("median_value"),
            F.min("mad").alias("mad"),
            F.count(
                F.when(
                    F.col("dev")
                    > F.lit(4.4478) * F.col("mad"),
                    F.lit(1),
                )
            ).alias("n_outliers"),
        )
    )


@register(
    "user_event_paths",
    oracle="""
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               string_agg(event_type, '->'
                          ORDER BY ts, event_id) AS path
        FROM events
        GROUP BY user_id
    """,
    ops=("A1", "U4", "O1"),
)
def user_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user chronological event-type path (the path-mining /
    journey-analysis reshape): user_id, event count, and the
    '->'-joined sequence ordered by (ts, event_id) — the unique
    event_id tie-break makes the string deterministic on both
    engines.

    Spark has no ordered string_agg; the equivalent without any
    HOF lambda (CLAUDE.md rule 10) is collect_list of
    (ts, event_id, event_type) structs → array_sort (lexicographic
    by field order = the ORDER BY) → `.getField` to project the
    array of event_types → array_join. collect_list is bounded by
    per-user event cardinality — the same per-key state contract
    as any sessionization; users with pathological event counts
    would need a path-length cap, noted here rather than hidden.
    """
    ev = read_star_table(spark, "events", sf_dir)
    arr = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                arr.getField("event_type"), "->"
            ).alias("path"),
        )
        .select("user_id", "n_events", "path")
    )


@register(
    "value_quartiles_by_type",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               quantile_cont(value, 0.25) AS p25,
               quantile_cont(value, 0.50) AS p50,
               quantile_cont(value, 0.75) AS p75,
               quantile_cont(value, 0.95) AS p95
        FROM events
        GROUP BY event_type
    """,
    ops=("A2",),
)
def value_quartiles_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quartile + tail bands of transaction value per event type —
    the distribution summary behind pricing/limit decisions. Exact
    interpolating percentiles (Spark `percentile` ≡ DuckDB
    quantile_cont bit-for-bit, the agg_median convention); at
    100 TB approx_percentile is the documented scale escape."""
    ev = read_star_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("value", F.lit(0.25)).alias("p25"),
        F.percentile("value", F.lit(0.50)).alias("p50"),
        F.percentile("value", F.lit(0.75)).alias("p75"),
        F.percentile("value", F.lit(0.95)).alias("p95"),
    )


@register(
    "incremental_agg_maintenance",
    oracle="""
        SELECT o_custkey,
               CAST(sum(CAST(round(
                   CAST(o_totalprice AS DOUBLE) * 100)
                   AS BIGINT)) AS BIGINT) AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM orders
        WHERE o_orderkey % 7 = 0 OR o_orderkey % 5 <> 0
        GROUP BY o_custkey
    """,
    ops=("A1", "J1"),
)
def incremental_agg_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental maintenance of a materialized revenue-per-
    customer aggregate (operators/cdc.incremental_agg_apply): the
    base aggregate (orders with key % 7 ≠ 0, standing in for the
    already-materialized 100 TB GROUP BY) is folded with one CDC
    delta batch — late-arriving inserts (key % 7 = 0) plus
    corrections deleting every base row with key % 5 = 0 — via a
    delta-sized partial aggregate and ONE key merge join; the
    corpus-sized input is never re-aggregated. The oracle simply
    recomputes the final state from scratch, so the hash-exact row
    PROVES incremental == full recompute, deletions included
    (keys whose count reaches zero drop out on both sides).
    Revenue rides an exact cents grid (rule 1b)."""
    from afg_data_pipeline_spark.operators.cdc import (
        incremental_agg_apply,
    )

    orders = read_star_table(spark, "orders", sf_dir)
    cents = F.round(
        F.col("o_totalprice").cast("double") * 100
    ).cast("bigint")
    rows = orders.select(
        "o_custkey", cents.alias("cents"), "o_orderkey"
    )
    k = F.col("o_orderkey")
    base = (
        rows.filter(k % 7 != 0)
        .groupBy("o_custkey")
        .agg(
            F.sum("cents").cast("bigint").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    delta = (
        rows.filter(k % 7 == 0)
        .withColumn("op", F.lit("I"))
        .unionByName(
            rows.filter((k % 7 != 0) & (k % 5 == 0)).withColumn(
                "op", F.lit("D")
            )
        )
    )
    return incremental_agg_apply(
        base,
        delta,
        keys=["o_custkey"],
        sum_cols={"revenue_cents": "cents"},
        count_col="n_rows",
    )


@register(
    "snapshot_cdc_extract",
    oracle="""
        WITH base AS (
            SELECT o_orderkey AS k,
                   CAST(round(CAST(o_totalprice AS DOUBLE) * 100)
                        AS BIGINT) AS cents,
                   o_orderstatus AS status
            FROM orders
        ),
        old AS (
            SELECT k,
                   CASE WHEN k % 11 = 0 THEN cents + 1000
                        ELSE cents END AS cents,
                   status
            FROM base WHERE k % 9 <> 0
            UNION ALL
            SELECT -k, cents, status FROM base WHERE k % 13 = 0
        ),
        new AS (SELECT k, cents, status FROM base)
        SELECT COALESCE(n.k, o.k) AS o_orderkey,
               CASE WHEN o.k IS NULL THEN 'I'
                    WHEN n.k IS NULL THEN 'D'
                    ELSE 'U' END AS op,
               o.cents AS old_cents, n.cents AS new_cents,
               o.status AS old_o_orderstatus,
               n.status AS new_o_orderstatus
        FROM old o FULL OUTER JOIN new n ON o.k = n.k
        WHERE o.k IS NULL OR n.k IS NULL
           OR (o.cents IS DISTINCT FROM n.cents)
           OR (o.status IS DISTINCT FROM n.status)
    """,
    ops=("J1", "U1"),
)
def snapshot_cdc_extract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CDC *capture*: derive the changelog between two snapshot
    versions of the orders table (operators/cdc.snapshot_diff) —
    the inverse of cdc_upsert_snapshot/incremental_agg_maintenance,
    which CONSUME changelogs. The old snapshot is deterministically
    derived: key%9=0 rows absent (→ inserts), key%11=0 rows carry
    a stale price (→ updates), and negated key%13=0 rows exist
    only in old (→ deletes). One full-outer key join, null-safe
    column compare; unchanged keys emit nothing. Prices ride the
    exact cents grid (rule 1b)."""
    from afg_data_pipeline_spark.operators.cdc import snapshot_diff

    orders = read_star_table(spark, "orders", sf_dir)
    k = F.col("o_orderkey")
    base = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice").cast("double") * 100)
        .cast("bigint")
        .alias("cents"),
        "o_orderstatus",
    )
    old = (
        base.filter(k % 9 != 0)
        .select(
            "o_orderkey",
            F.when(k % 11 == 0, F.col("cents") + 1000)
            .otherwise(F.col("cents"))
            .alias("cents"),
            "o_orderstatus",
        )
        .unionByName(
            base.filter(k % 13 == 0).select(
                (-k).alias("o_orderkey"), "cents", "o_orderstatus"
            )
        )
    )
    return snapshot_diff(
        old,
        base,
        keys=["o_orderkey"],
        compare_cols=["cents", "o_orderstatus"],
    )


@register(
    "frequent_item_pairs",
    oracle="""
        WITH b AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        s AS (
            SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
            FROM b GROUP BY l_partkey
        ),
        f AS (SELECT l_partkey, c FROM s WHERE c >= 3),
        fb AS (
            SELECT b.l_orderkey, b.l_partkey
            FROM b JOIN f USING (l_partkey)
        ),
        p AS (
            SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
                   CAST(count(*) AS BIGINT) AS pair_support
            FROM fb x JOIN fb y
              ON x.l_orderkey = y.l_orderkey
             AND x.l_partkey < y.l_partkey
            GROUP BY 1, 2
        )
        SELECT p.part_a, p.part_b, p.pair_support,
               sa.c AS support_a, sb.c AS support_b,
               CAST(p.pair_support *
                    (SELECT count(DISTINCT l_orderkey) FROM b)
                    AS DOUBLE) / (sa.c * sb.c) AS lift
        FROM p
        JOIN f sa ON sa.l_partkey = p.part_a
        JOIN f sb ON sb.l_partkey = p.part_b
        WHERE p.pair_support >= 3
    """,
    ops=("A1", "J4"),
)
def frequent_item_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Market-basket mining: part pairs co-ordered in >= 3 orders,
    with supports and lift (operators/itemsets.py). The a-priori
    singleton prune broadcasts the frequent-item set ahead of the
    basket self-join, so the quadratic pair expansion only sees
    survivors; pair counting shuffles on the many-valued order key
    — naturally parallel, no salting needed."""
    from afg_data_pipeline_spark.operators.itemsets import (
        frequent_item_pairs as mine_pairs,
    )

    li = read_star_table(spark, "lineitem", sf_dir)
    return mine_pairs(
        li, basket_col="l_orderkey", item_col="l_partkey",
        min_support=3,
    )


@register(
    "incremental_join_maintenance",
    oracle="""
        SELECT c_mktsegment,
               CAST(sum(CAST(round(
                   CAST(o_totalprice AS DOUBLE) * 100)
                   AS BIGINT)) AS BIGINT) AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c_mktsegment
    """,
    ops=("A1", "J1"),
)
def incremental_join_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental maintenance of an aggregate OVER A JOIN
    (revenue per market segment from customer ⋈ orders) when BOTH
    join sides receive insert batches — the join half of IVM,
    composing operators/cdc.join_insert_deltas with
    incremental_agg_apply.

    The materialized state is the base-only aggregate
    (A₀ = customers with key % 4 ≠ 0 joined to B₀ = orders with
    key % 3 ≠ 0, standing in for the already-computed 100 TB
    view). The delta fold joins ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB with the
    delta side of every term broadcast — the base tables never
    shuffle — then folds the delta-sized partial aggregate into
    the stored state with one key merge. The oracle recomputes
    the full join from scratch, so the hash-exact row PROVES the
    three-term delta decomposition. Revenue rides the exact cents
    grid (rule 1b)."""
    from afg_data_pipeline_spark.operators.cdc import (
        incremental_agg_apply,
        join_insert_deltas,
    )

    cust = read_star_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_mktsegment"
    )
    orders = read_star_table(spark, "orders", sf_dir).select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice").cast("double") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    a0 = cust.filter(F.col("c_custkey") % 4 != 0)
    da = cust.filter(F.col("c_custkey") % 4 == 0)
    b0 = orders.filter(F.col("o_orderkey") % 3 != 0)
    db = orders.filter(F.col("o_orderkey") % 3 == 0)
    base = (
        a0.join(b0, a0.c_custkey == b0.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("cents").cast("bigint").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    delta = (
        join_insert_deltas(
            a0, da, b0, db, on=[("c_custkey", "o_custkey")]
        )
        .select("c_mktsegment", "cents")
        .withColumn("op", F.lit("I"))
    )
    return incremental_agg_apply(
        base,
        delta,
        keys=["c_mktsegment"],
        sum_cols={"revenue_cents": "cents"},
        count_col="n_rows",
    )


@register(
    "event_transition_matrix",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        ),
        t AS (
            SELECT event_type AS from_type,
                   next_type AS to_type,
                   CAST(count(*) AS BIGINT) AS n_transitions
            FROM ordered WHERE next_type IS NOT NULL
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT from_type,
                   CAST(sum(n_transitions) AS BIGINT)
                       AS from_total
            FROM t GROUP BY 1
        )
        SELECT t.from_type, t.to_type, t.n_transitions,
               tot.from_total,
               CAST(t.n_transitions AS DOUBLE)
                   / CAST(tot.from_total AS DOUBLE) AS prob
        FROM t JOIN tot USING (from_type)
    """,
    ops=("O1", "A1"),
)
def event_transition_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current), the behavioral model
    behind next-action prediction and anomaly scoring. Sequencing
    is a per-user lead() window (users are a many-valued key —
    parallel, no salting per rule 13); the transition counts are
    one map-side-combinable aggregate; row normalization joins the
    BROADCAST per-from-type totals instead of a 5-partition hot
    window (rule 19). Counts exact BIGINTs; each probability is
    one correctly-rounded double division."""
    from pyspark.sql import Window

    ev = read_star_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    tot = t.groupBy("from_type").agg(
        F.sum("n_transitions").alias("from_total")
    )
    return t.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        "from_total",
        (
            F.col("n_transitions").cast("double")
            / F.col("from_total").cast("double")
        ).alias("prob"),
    )


@register(
    "association_rules",
    oracle="""
        WITH b AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        s AS (
            SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
            FROM b GROUP BY l_partkey
        ),
        f AS (SELECT l_partkey, c FROM s WHERE c >= 3),
        fb AS (
            SELECT b.l_orderkey, b.l_partkey
            FROM b JOIN f USING (l_partkey)
        ),
        p AS (
            SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
                   CAST(count(*) AS BIGINT) AS pair_support
            FROM fb x JOIN fb y
              ON x.l_orderkey = y.l_orderkey
             AND x.l_partkey < y.l_partkey
            GROUP BY 1, 2
        ),
        n AS (
            SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT)
                AS nb FROM b
        ),
        pr AS (
            SELECT p.part_a, p.part_b, p.pair_support,
                   sa.c AS support_a, sb.c AS support_b
            FROM p
            JOIN f sa ON sa.l_partkey = p.part_a
            JOIN f sb ON sb.l_partkey = p.part_b
            WHERE p.pair_support >= 3
        ),
        rules AS (
            SELECT part_a AS antecedent, part_b AS consequent,
                   pair_support,
                   support_a AS antecedent_support,
                   support_b AS consequent_support
            FROM pr
            UNION ALL
            SELECT part_b, part_a, pair_support,
                   support_b, support_a
            FROM pr
        )
        SELECT antecedent, consequent, pair_support,
               antecedent_support, consequent_support,
               CAST(pair_support AS DOUBLE)
                   / CAST(antecedent_support AS DOUBLE)
                   AS confidence,
               CAST(pair_support * nb AS DOUBLE)
                   / (antecedent_support * consequent_support)
                   AS lift
        FROM rules, n
        WHERE CAST(pair_support AS DOUBLE)
                  / CAST(antecedent_support AS DOUBLE) >= 0.1
    """,
    ops=("A1", "J4"),
)
def association_rules(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Directed association rules from the frequent-pair miner:
    a -> b with confidence = P(b | a) and lift, both directions of
    every frequent pair, filtered at confidence >= 0.25. All
    factors are the miner's exact BIGINTs (< 2^53), so each
    confidence/lift is one correctly-rounded double expression —
    the rule emission is a pure projection over the mined pairs
    (two rows per pair via a literal-array explode; no new
    shuffle)."""
    from afg_data_pipeline_spark.operators.itemsets import (
        frequent_item_pairs as mine_pairs,
    )

    li = read_star_table(spark, "lineitem", sf_dir)
    pairs = mine_pairs(
        li, basket_col="l_orderkey", item_col="l_partkey",
        min_support=3,
    )
    rules = pairs.select(
        F.col("lift"),
        F.explode(
            F.array(
                F.struct(
                    F.col("part_a").alias("antecedent"),
                    F.col("part_b").alias("consequent"),
                    F.col("support_a").alias(
                        "antecedent_support"
                    ),
                    F.col("support_b").alias(
                        "consequent_support"
                    ),
                ),
                F.struct(
                    F.col("part_b").alias("antecedent"),
                    F.col("part_a").alias("consequent"),
                    F.col("support_b").alias(
                        "antecedent_support"
                    ),
                    F.col("support_a").alias(
                        "consequent_support"
                    ),
                ),
            )
        ).alias("r"),
        "pair_support",
    ).select(
        "r.antecedent",
        "r.consequent",
        "pair_support",
        "r.antecedent_support",
        "r.consequent_support",
        (
            F.col("pair_support").cast("double")
            / F.col("r.antecedent_support").cast("double")
        ).alias("confidence"),
        "lift",
    )
    return rules.filter(F.col("confidence") >= 0.1)


@register(
    "rfm_segments",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey,
                   date_diff('day',
                             max(CAST(o_orderdate AS DATE)),
                             (SELECT max(CAST(o_orderdate AS DATE))
                              FROM orders)) AS r,
                   CAST(count(*) AS BIGINT) AS f,
                   CAST(sum(CAST(round(
                       CAST(o_totalprice AS DOUBLE) * 100)
                       AS BIGINT)) AS BIGINT) AS m
            FROM orders GROUP BY o_custkey
        ),
        cuts AS (
            SELECT
                min(CASE WHEN rc >= (n * 20 + 99) // 100
                         THEN rv END) AS r20,
                min(CASE WHEN rc >= (n * 40 + 99) // 100
                         THEN rv END) AS r40,
                min(CASE WHEN rc >= (n * 60 + 99) // 100
                         THEN rv END) AS r60,
                min(CASE WHEN rc >= (n * 80 + 99) // 100
                         THEN rv END) AS r80
            FROM (
                SELECT r AS rv,
                       SUM(c) OVER (ORDER BY r
                           ROWS UNBOUNDED PRECEDING) AS rc,
                       SUM(c) OVER () AS n
                FROM (SELECT r, count(*) AS c
                      FROM per_cust GROUP BY r)
            )
        ),
        cutf AS (
            SELECT
                min(CASE WHEN rc >= (n * 20 + 99) // 100
                         THEN rv END) AS f20,
                min(CASE WHEN rc >= (n * 40 + 99) // 100
                         THEN rv END) AS f40,
                min(CASE WHEN rc >= (n * 60 + 99) // 100
                         THEN rv END) AS f60,
                min(CASE WHEN rc >= (n * 80 + 99) // 100
                         THEN rv END) AS f80
            FROM (
                SELECT f AS rv,
                       SUM(c) OVER (ORDER BY f
                           ROWS UNBOUNDED PRECEDING) AS rc,
                       SUM(c) OVER () AS n
                FROM (SELECT f, count(*) AS c
                      FROM per_cust GROUP BY f)
            )
        ),
        cutm AS (
            SELECT
                min(CASE WHEN rc >= (n * 20 + 99) // 100
                         THEN rv END) AS m20,
                min(CASE WHEN rc >= (n * 40 + 99) // 100
                         THEN rv END) AS m40,
                min(CASE WHEN rc >= (n * 60 + 99) // 100
                         THEN rv END) AS m60,
                min(CASE WHEN rc >= (n * 80 + 99) // 100
                         THEN rv END) AS m80
            FROM (
                SELECT m AS rv,
                       SUM(c) OVER (ORDER BY m
                           ROWS UNBOUNDED PRECEDING) AS rc,
                       SUM(c) OVER () AS n
                FROM (SELECT m, count(*) AS c
                      FROM per_cust GROUP BY m)
            )
        )
        SELECT
            CAST(1 + CAST(r > r20 AS INTEGER)
                 + CAST(r > r40 AS INTEGER)
                 + CAST(r > r60 AS INTEGER)
                 + CAST(r > r80 AS INTEGER) AS INTEGER)
                AS r_band,
            CAST(1 + CAST(f > f20 AS INTEGER)
                 + CAST(f > f40 AS INTEGER)
                 + CAST(f > f60 AS INTEGER)
                 + CAST(f > f80 AS INTEGER) AS INTEGER)
                AS f_band,
            CAST(1 + CAST(m > m20 AS INTEGER)
                 + CAST(m > m40 AS INTEGER)
                 + CAST(m > m60 AS INTEGER)
                 + CAST(m > m80 AS INTEGER) AS INTEGER)
                AS m_band,
            CAST(count(*) AS BIGINT) AS n_customers,
            CAST(sum(m) AS BIGINT) AS total_monetary_cents
        FROM per_cust, cuts, cutf, cutm
        GROUP BY 1, 2, 3
    """,
    ops=("A1", "A2"),
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every ordering customer banded into
    recency/frequency/monetary quintiles (exact discrete
    percentile cuts — operators/quantiles machinery: the heavy
    pass is a map-side-combinable value-count, the cumulative
    window runs over distinct VALUES, never customer rows), then
    rolled up to segment cells with customer counts and total
    spend. All three metrics are exact integers (days, counts,
    cents: per-customer cent sums are provable BIGINTs — 6e7 cents
    max per order needs > 1.5e11 orders per customer to overflow),
    so banding is pure integer comparison against the broadcast
    cut points. Customers with no orders are out of scope (RFM is
    defined on purchasers)."""
    from afg_data_pipeline_spark.operators.quantiles import (
        grouped_percentile_disc,
    )

    o = read_star_table(spark, "orders", sf_dir)
    dmax = o.agg(
        F.max(F.to_date("o_orderdate")).alias("dmax")
    )
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_order"),
            F.count(F.lit(1)).alias("f"),
            F.sum(
                F.round(
                    F.col("o_totalprice").cast("double") * 100
                ).cast("bigint")
            ).alias("m"),
        )
        .crossJoin(F.broadcast(dmax))
        .withColumn(
            "r", F.datediff(F.col("dmax"), F.col("last_order"))
        )
        .localCheckpoint(eager=False)
    )
    qs = [0.2, 0.4, 0.6, 0.8]

    def cuts(col, prefix):
        c = grouped_percentile_disc(
            per_cust.withColumn("g0", F.lit(0)), "g0", col, qs
        )
        return c.select(
            *[
                F.col(f"p{int(q * 100)}").alias(
                    f"{prefix}{int(q * 100)}"
                )
                for q in qs
            ]
        )

    banded = (
        per_cust.crossJoin(F.broadcast(cuts("r", "r")))
        .crossJoin(F.broadcast(cuts("f", "f")))
        .crossJoin(F.broadcast(cuts("m", "m")))
    )

    def band(v, p):
        return (
            F.lit(1)
            + (F.col(v) > F.col(f"{p}20")).cast("int")
            + (F.col(v) > F.col(f"{p}40")).cast("int")
            + (F.col(v) > F.col(f"{p}60")).cast("int")
            + (F.col(v) > F.col(f"{p}80")).cast("int")
        ).cast("int")

    return (
        banded.select(
            band("r", "r").alias("r_band"),
            band("f", "f").alias("f_band"),
            band("m", "m").alias("m_band"),
            "m",
        )
        .groupBy("r_band", "f_band", "m_band")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("m").alias("total_monetary_cents"),
        )
    )


@register(
    "purchase_attribution",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id, ts, event_type, value,
                   max(CASE WHEN event_type = 'click'
                            THEN ts END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS last_click_ts,
                   min(CASE WHEN event_type = 'view'
                            THEN ts END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS first_view_ts
            FROM events
        )
        SELECT
            CAST(count(*) AS BIGINT) AS n_purchases,
            CAST(sum(CASE WHEN last_click_ts IS NOT NULL
                          THEN 1 ELSE 0 END) AS BIGINT)
                AS n_click_attributed,
            CAST(sum(CASE WHEN first_view_ts IS NOT NULL
                          THEN 1 ELSE 0 END) AS BIGINT)
                AS n_view_attributed,
            CAST(sum(CASE WHEN last_click_ts IS NOT NULL
                          THEN CAST(round(
                              CAST(value AS DOUBLE) * 100)
                              AS BIGINT)
                          ELSE 0 END) AS BIGINT)
                AS click_attributed_cents
        FROM seq WHERE event_type = 'purchase'
    """,
    ops=("O1", "A1"),
)
def purchase_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Marketing attribution rollup: for every purchase, the
    last-touch click and first-touch view STRICTLY BEFORE it in
    the user's event sequence (running max/min over a bounded
    1-PRECEDING frame — never an unbounded-FOLLOWING frame, rule
    2), rolled up to attributed counts and exact-cent attributed
    revenue. Per-user windows parallelize over the many-valued
    user key; the rollup is one map-side-combinable aggregate."""
    from pyspark.sql import Window

    ev = read_star_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "event_type",
        "value",
        F.max(
            F.when(F.col("event_type") == "click", F.col("ts"))
        ).over(w).alias("last_click_ts"),
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts"))
        ).over(w).alias("first_view_ts"),
    ).filter(F.col("event_type") == "purchase")
    cents = F.round(F.col("value").cast("double") * 100).cast(
        "bigint"
    )
    return seq.agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(
            F.when(F.col("last_click_ts").isNotNull(), 1)
            .otherwise(0)
        ).cast("bigint").alias("n_click_attributed"),
        F.sum(
            F.when(F.col("first_view_ts").isNotNull(), 1)
            .otherwise(0)
        ).cast("bigint").alias("n_view_attributed"),
        F.sum(
            F.when(
                F.col("last_click_ts").isNotNull(), cents
            ).otherwise(0)
        ).cast("bigint").alias("click_attributed_cents"),
    )


@register(
    "time_weighted_value",
    oracle="""
        WITH seq AS (
            SELECT user_id, ts, value,
                   lead(ts) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id) AS next_ts
            FROM events
        ),
        seg AS (
            SELECT user_id,
                   CAST(round(CAST(value AS DOUBLE) * 100)
                        AS BIGINT)
                       * date_diff('microsecond', ts, next_ts)
                       AS wv,
                   date_diff('microsecond', ts, next_ts) AS dur
            FROM seq WHERE next_ts IS NOT NULL
        )
        SELECT user_id,
               CAST(CAST(sum(CAST(wv AS DECIMAL(38,0)))
                         AS DECIMAL(38,0)) AS VARCHAR)
                   AS weighted_cents_usec,
               CAST(sum(dur) AS BIGINT) AS total_usec,
               CAST(sum(CAST(wv AS DECIMAL(38,0))) AS DOUBLE)
                   / CAST(sum(dur) AS DOUBLE) AS twap_cents
        FROM seg GROUP BY user_id
    """,
    ops=("O1", "A1"),
)
def time_weighted_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-user TIME-WEIGHTED average value (TWAP): each event's
    value held until the user's next event, weighted by the exact
    microsecond duration — the standard interval-weighted mean of
    finance/IoT, where a plain AVG over-weights bursts. All
    integer arithmetic: cent values × µs durations accumulate in
    DECIMAL(38,0) (cents·µs has no provable 2^63 bound over a
    year-long trace, rule 11); the final TWAP is one double
    division of two exact sums. Per-user lead() windows, one
    aggregate."""
    from pyspark.sql import Window

    ev = read_star_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "value",
        F.lead("ts").over(w).alias("next_ts"),
    ).filter(F.col("next_ts").isNotNull())
    cents = F.round(F.col("value").cast("double") * 100).cast(
        "bigint"
    )
    # timestamp cast to long yields SECONDS; unix_micros gives the
    # exact µs the parquet stores (matches DuckDB's
    # date_diff('microsecond'))
    # NTZ -> LTZ cast first (identity under the pinned-UTC
    # session, rule 6): unix_micros rejects TIMESTAMP_NTZ
    dur = (
        F.unix_micros(F.col("next_ts").cast("timestamp"))
        - F.unix_micros(F.col("ts").cast("timestamp"))
    )
    seg = seq.select(
        "user_id",
        # decimal BEFORE the multiply: cents x µs-over-a-year is
        # ~3e18 - no safety margin under the driver's ANSI session
        # (rule 11)
        (cents.cast("decimal(38,0)") * dur)
        .cast("decimal(38,0)")
        .alias("wv"),
        dur.alias("dur"),
    )
    return seg.groupBy("user_id").agg(
        # decimal accumulation (rule 11), STRING exposure: the
        # driver's two pandas paths render raw decimals unequally
        # (r6 join_key_skew class) and ~3e18 exceeds 2^53 so a
        # double cast would be lossy -- cast VARCHAR on both sides
        F.sum("wv")
        .cast("decimal(38,0)")
        .cast("string")
        .alias("weighted_cents_usec"),
        F.sum("dur").cast("bigint").alias("total_usec"),
        (
            F.sum("wv").cast("double")
            / F.sum("dur").cast("double")
        ).alias("twap_cents"),
    )


@register(
    "sequence_pattern_counts",
    oracle="""
        WITH spans AS (
            SELECT user_id, event_type,
                   min(ts) AS first_ts, max(ts) AS last_ts
            FROM events GROUP BY 1, 2
        ),
        tot AS (
            SELECT CAST(count(DISTINCT user_id) AS BIGINT)
                       AS n_total FROM events
        ),
        pat AS (
            SELECT a.event_type AS antecedent,
                   b.event_type AS consequent,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM spans a
            JOIN spans b ON a.user_id = b.user_id
                        AND a.event_type <> b.event_type
            WHERE a.first_ts < b.last_ts
            GROUP BY 1, 2
        )
        SELECT antecedent, consequent, n_users,
               CAST(n_users AS DOUBLE)
                   / CAST(n_total AS DOUBLE) AS support
        FROM pat, tot
    """,
    ops=("A1", "J4"),
)
def sequence_pattern_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sequential-pattern mining, 2-sequences: for every ordered
    event-type pair (a, b), how many users did SOME a strictly
    before SOME b (the PrefixSpan L2 table — 'a then b, not
    necessarily adjacent', unlike event_transition_matrix's
    adjacent bigrams). 'Exists a before b' is exactly
    min_ts(a) < max_ts(b), so the corpus collapses FIRST to one
    row per (user, type) — a map-side-combinable min/max
    aggregate — and the pair test is a per-user self-join of at
    most |types| rows a side (bounded fan-out, millions of user
    keys of natural parallelism; never an event-level pair join).
    Support = users-with-pattern / total-users, one correctly
    rounded division."""
    ev = read_star_table(spark, "events", sf_dir)
    spans = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    tot = ev.agg(
        F.countDistinct("user_id").alias("n_total")
    )
    a = spans.alias("a")
    b = spans.alias("b")
    pat = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") != F.col("b.event_type"))
            & (F.col("a.first_ts") < F.col("b.last_ts")),
        )
        .groupBy(
            F.col("a.event_type").alias("antecedent"),
            F.col("b.event_type").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )
    return pat.crossJoin(F.broadcast(tot)).select(
        "antecedent",
        "consequent",
        "n_users",
        (
            F.col("n_users").cast("double")
            / F.col("n_total").cast("double")
        ).alias("support"),
    )


@register(
    "top_event_paths",
    oracle="""
        WITH ranked AS (
            SELECT user_id, event_type,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id
                   ) AS rn,
                   ts, event_id
            FROM events
        ),
        paths AS (
            SELECT user_id,
                   string_agg(event_type, '>'
                              ORDER BY ts, event_id) AS path
            FROM ranked WHERE rn <= 5
            GROUP BY 1
        ),
        counts AS (
            SELECT path, CAST(count(*) AS BIGINT) AS n_users
            FROM paths GROUP BY 1
        )
        SELECT path, n_users, rnk FROM (
            SELECT path, n_users,
                   CAST(row_number() OVER (
                       ORDER BY n_users DESC, path ASC
                   ) AS INTEGER) AS rnk
            FROM counts
        ) WHERE rnk <= 20
    """,
    ops=("O3", "A1"),
)
def top_event_paths(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-20 user journeys: each user's first five events (by
    ts, event_id — every ranking tie-broken) joined into a '>'
    path string, counted across users. The funnel-discovery query
    of product analytics.

    Scale: the row_number window is user-partitioned (full
    parallelism); path assembly is sort_array(collect_list) of at
    most 5 structs per user; the final top-20 ranks the path-count
    table, whose size is bounded by the TYPE-SEQUENCE value space
    (sum of |types|^k for k<=5), constant in corpus size — so the
    global window is bounded work at any scale (same argument as
    pareto_frontier)."""
    from pyspark.sql import Window

    ev = read_star_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first5 = (
        ev.select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )
    paths = first5.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct("rn", "event_type")
                    )
                ),
                lambda s: s.event_type,
            ),
            ">",
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    wtop = Window.orderBy(
        F.col("n_users").desc(), F.col("path").asc()
    )
    return (
        counts.withColumn(
            "rnk", F.row_number().over(wtop).cast("int")
        )
        .filter(F.col("rnk") <= 20)
    )


@register(
    "survival_curve_km",
    oracle="""
        WITH s AS (
            SELECT user_id, min(ts) AS s_ts
            FROM events WHERE event_type = 'signup'
            GROUP BY 1
        ),
        p AS (
            SELECT e.user_id, min(e.ts) AS p_ts
            FROM events e JOIN s USING (user_id)
            WHERE e.event_type = 'purchase'
              AND e.ts >= s.s_ts
            GROUP BY 1
        ),
        obs AS (SELECT max(ts) AS end_ts FROM events),
        durs AS (
            SELECT s.user_id,
                   date_diff('day', CAST(s.s_ts AS DATE),
                             CAST(COALESCE(p.p_ts, o.end_ts)
                                  AS DATE)) AS t,
                   CASE WHEN p.p_ts IS NULL THEN 0 ELSE 1 END
                       AS ev
            FROM s LEFT JOIN p USING (user_id), obs o
        ),
        daily AS (
            SELECT t, CAST(sum(ev) AS BIGINT) AS d,
                   CAST(sum(1 - ev) AS BIGINT) AS c
            FROM durs GROUP BY 1
        ),
        tot AS (
            SELECT CAST(sum(d + c) AS BIGINT) AS n_all
            FROM daily
        ),
        risk AS (
            SELECT t, d, c,
                   n_all - COALESCE(CAST(sum(d + c) OVER (
                       ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING
                   ) AS BIGINT), 0) AS n_at_risk
            FROM daily, tot
        ),
        fac AS (
            SELECT t, d, c, n_at_risk,
                   CASE WHEN d < n_at_risk THEN
                       CAST(round(ln(1.0
                           - CAST(d AS DOUBLE)
                             / CAST(n_at_risk AS DOUBLE))
                           * 1000000000.0) AS BIGINT)
                   ELSE 0 END AS f_q,
                   CASE WHEN d >= n_at_risk THEN 1 ELSE 0 END
                       AS hits_zero
            FROM risk
        ),
        cum AS (
            SELECT t, d, c, n_at_risk,
                   CAST(sum(f_q) OVER (
                       ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW
                   ) AS BIGINT) AS cum_q,
                   max(hits_zero) OVER (
                       ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW
                   ) AS hit
            FROM fac
        )
        SELECT t AS duration_days, n_at_risk,
               d AS n_events, c AS n_censored,
               CASE WHEN hit = 1 THEN 0.0
                    ELSE round(exp(CAST(cum_q AS DOUBLE)
                                   / 1000000000.0)
                               * 1000000000.0)
                         / 1000000000.0 END AS survival
        FROM cum WHERE d > 0
    """,
    ops=("A1", "O1", "W2"),
)
def survival_curve_km(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-first-purchase
    after signup, right-censored at the observation end — the
    retention/time-to-event analysis every product team runs.
    One KM step row per event day: (duration_days, n_at_risk,
    n_events, n_censored, survival).

    Scale: the corpus collapses to per-user (duration, event)
    in two aggregates, then to one row per distinct DAY — every
    window after that runs on the day-value-space-bounded table.
    Exactness: each KM factor ln(1 − d/n) is quantized once to
    the 1e9 grid (rule 1c) and summed exactly; survival =
    exp(sum) is snapped back to the same grid on both engines
    (exp's ≤1-ulp engine divergence cannot straddle after the
    snap except with ~1e-7/row probability); a day where the
    whole risk set fails (d = n) pins survival to exactly 0.0
    from that step on — never ln(0)."""
    from pyspark.sql import Window

    ev = read_star_table(spark, "events", sf_dir)
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    obs = ev.agg(F.max("ts").alias("end_ts"))
    durs = (
        s.join(p, "user_id", "left")
        .crossJoin(F.broadcast(obs))
        .select(
            F.datediff(
                F.to_date(
                    F.coalesce(F.col("p_ts"), F.col("end_ts"))
                ),
                F.to_date("s_ts"),
            ).alias("t"),
            F.when(F.col("p_ts").isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .alias("ev"),
        )
    )
    daily = durs.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.sum(1 - F.col("ev")).cast("bigint").alias("c"),
    )
    tot = daily.agg(
        F.sum(F.col("d") + F.col("c"))
        .cast("bigint")
        .alias("n_all")
    )
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = daily.crossJoin(F.broadcast(tot)).withColumn(
        "n_at_risk",
        F.col("n_all")
        - F.coalesce(
            F.sum(F.col("d") + F.col("c")).over(w_prev),
            F.lit(0),
        ).cast("bigint"),
    )
    fac = risk.select(
        "t",
        "d",
        "c",
        "n_at_risk",
        F.when(
            F.col("d") < F.col("n_at_risk"),
            F.round(
                F.log(
                    F.lit(1.0)
                    - F.col("d").cast("double")
                    / F.col("n_at_risk").cast("double")
                )
                * F.lit(1e9)
            ).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("f_q"),
        (F.col("d") >= F.col("n_at_risk"))
        .cast("int")
        .alias("hits_zero"),
    )
    cum = fac.select(
        "t",
        "d",
        "c",
        "n_at_risk",
        F.sum("f_q").over(w_cum).cast("bigint").alias("cum_q"),
        F.max("hits_zero").over(w_cum).alias("hit"),
    )
    return cum.filter(F.col("d") > 0).select(
        F.col("t").alias("duration_days"),
        "n_at_risk",
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.when(F.col("hit") == 1, F.lit(0.0))
        .otherwise(
            F.round(
                F.exp(
                    F.col("cum_q").cast("double") / F.lit(1e9)
                )
                * F.lit(1e9)
            )
            / F.lit(1e9)
        )
        .alias("survival"),
    )


@register(
    "entity_resolution_clusters",
    oracle="""
        WITH RECURSIVE names AS (SELECT DISTINCT p_name FROM part),
        cand AS (
            SELECT a.p_name AS na, b.p_name AS nb
            FROM names a JOIN names b
              ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
             AND abs(length(a.p_name) - length(b.p_name)) <= 1
             AND a.p_name < b.p_name
        ),
        edges AS (
            SELECT na, nb FROM cand
            WHERE levenshtein(na, nb) <= 3
        ),
        sym AS (
            SELECT na AS src, nb AS dst FROM edges
            UNION ALL
            SELECT nb, na FROM edges
        ),
        reach AS (
            SELECT src AS v, src AS r FROM sym
            UNION
            SELECT reach.v, s.dst
            FROM reach JOIN sym s ON reach.r = s.src
        ),
        comp AS (SELECT v, min(r) AS c FROM reach GROUP BY v),
        ent AS (
            SELECT p.p_partkey, p.p_name,
                   COALESCE(comp.c, p.p_name) AS entity_name
            FROM part p LEFT JOIN comp ON comp.v = p.p_name
        ),
        sizes AS (
            SELECT entity_name,
                   CAST(count(*) AS BIGINT) AS entity_size
            FROM ent GROUP BY 1
        )
        SELECT e.p_partkey, e.p_name, e.entity_name,
               s.entity_size
        FROM ent e JOIN sizes s USING (entity_name)
    """,
    ops=("J1", "DEDUP"),
)
def entity_resolution_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """End-to-end entity resolution: blocked fuzzy matching
    (operators/joins.fuzzy_join_blocked — first-char block +
    length band, levenshtein <= 3 on the reduced pair set) feeds
    connected components (operators/graph.py min-label), and every
    part resolves to its cluster's canonical name — the composed
    record-linkage pipeline (pair scoring alone can't collapse
    transitive chains A~B~C). Exact-duplicate names join the same
    entity through the name key itself; unmatched names are their
    own singleton entity.

    Scale: the pair space never materializes (blocking), the
    match graph is name-keyed (distinct values, not rows), and
    component resolution is the O(diameter) min-label loop with
    decimal convergence probes — the corpus only joins the final
    name -> entity map. Verified against the WITH RECURSIVE
    transitive-closure oracle, same contract as
    near_dup_components."""
    from afg_data_pipeline_spark.operators.graph import (
        connected_components,
    )
    from afg_data_pipeline_spark.operators.joins import (
        fuzzy_join_blocked,
    )

    p = read_star_table(spark, "part", sf_dir)
    matches = fuzzy_join_blocked(p, p, "p_name", "p_name")
    comps = connected_components(
        matches, src="name_a", dst="name_b"
    )
    ent = p.join(
        comps,
        p.p_name == comps.vertex,
        "left",
    ).select(
        "p_partkey",
        "p_name",
        F.coalesce(F.col("component"), F.col("p_name")).alias(
            "entity_name"
        ),
    )
    sizes = ent.groupBy("entity_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("entity_size")
    )
    return ent.join(sizes, "entity_name").select(
        "p_partkey", "p_name", "entity_name", "entity_size"
    )


@register(
    "sequence_pattern3_counts",
    oracle="""
        WITH spans AS (
            SELECT user_id, event_type,
                   min(ts) AS first_ts, max(ts) AS last_ts
            FROM events GROUP BY 1, 2
        ),
        tot AS (
            SELECT CAST(count(DISTINCT user_id) AS BIGINT)
                       AS n_total FROM events
        ),
        triples AS (
            SELECT DISTINCT
                   b.user_id,
                   a.event_type AS t1,
                   b.event_type AS t2,
                   c.event_type AS t3
            FROM events b
            JOIN spans a ON a.user_id = b.user_id
                        AND a.event_type <> b.event_type
                        AND a.first_ts < b.ts
            JOIN spans c ON c.user_id = b.user_id
                        AND c.event_type <> b.event_type
                        AND c.event_type <> a.event_type
                        AND b.ts < c.last_ts
        ),
        pat AS (
            SELECT t1, t2, t3,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM triples GROUP BY 1, 2, 3
        )
        SELECT t1, t2, t3, n_users,
               CAST(n_users AS DOUBLE)
                   / CAST(n_total AS DOUBLE) AS support
        FROM pat, tot
    """,
    ops=("A1", "J4"),
)
def sequence_pattern3_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sequential-pattern mining, 3-sequences: users who did SOME
    t1, then SOME t2, then SOME t3 (strictly ordered in time,
    pairwise-distinct types — the PrefixSpan L3 table).
    'exists a<b<c' reduces to: exists a t2-EVENT strictly inside
    the open interval (min_ts(t1), max_ts(t3)) — so only the t2
    occurrence needs event granularity; t1 and t3 collapse to the
    (user, type) span aggregate.

    Scale: events join the per-user span table twice (bounded
    fan-out ≤ (|types|−1)² per event, user-keyed parallelism);
    the DISTINCT collapses to ≤ |types|³ rows per user map-side
    before any shuffle. Support = one correctly-rounded
    division."""
    ev = read_star_table(spark, "events", sf_dir)
    spans = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    tot = ev.agg(
        F.countDistinct("user_id").alias("n_total")
    )
    b = ev.select("user_id", "event_type", "ts").alias("b")
    a = spans.alias("a")
    c = spans.alias("c")
    triples = (
        b.join(
            a,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") != F.col("b.event_type"))
            & (F.col("a.first_ts") < F.col("b.ts")),
        )
        .join(
            c,
            (F.col("c.user_id") == F.col("b.user_id"))
            & (F.col("c.event_type") != F.col("b.event_type"))
            & (F.col("c.event_type") != F.col("a.event_type"))
            & (F.col("b.ts") < F.col("c.last_ts")),
        )
        .select(
            F.col("b.user_id").alias("user_id"),
            F.col("a.event_type").alias("t1"),
            F.col("b.event_type").alias("t2"),
            F.col("c.event_type").alias("t3"),
        )
        .distinct()
    )
    pat = triples.groupBy("t1", "t2", "t3").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    return pat.crossJoin(F.broadcast(tot)).select(
        "t1",
        "t2",
        "t3",
        "n_users",
        (
            F.col("n_users").cast("double")
            / F.col("n_total").cast("double")
        ).alias("support"),
    )


_MSS_GRID = 1_000_000_000_000  # pagerank-convention 1e12 grid
_MSS_ITERS = 20


def _mss_oracle() -> str:
    """Unrolled 20-iteration power-method oracle (AS MATERIALIZED
    per CLAUDE.md rule 5; HUGEINT products — v·c reaches 1e12·c,
    far past BIGINT at corpus scale)."""
    head = """
        WITH ordered AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        ),
        trans AS MATERIALIZED (
            SELECT event_type AS src, next_type AS dst,
                   CAST(count(*) AS BIGINT) AS c
            FROM ordered WHERE next_type IS NOT NULL
            GROUP BY 1, 2
        ),
        rt AS MATERIALIZED (
            SELECT src, CAST(sum(c) AS BIGINT) AS r
            FROM trans GROUP BY 1
        ),
        types AS MATERIALIZED (
            SELECT DISTINCT event_type AS ty FROM events
        ),
        ntypes AS (
            SELECT CAST(count(*) AS BIGINT) AS k FROM types
        ),
        v0 AS MATERIALIZED (
            SELECT ty, CAST(1000000000000 // k AS HUGEINT) AS p
            FROM types, ntypes
        ),
    """
    its = []
    for i in range(1, _MSS_ITERS + 1):
        its.append(
            f"""v{i} AS MATERIALIZED (
            SELECT t.dst AS ty,
                   CAST(sum((v.p * CAST(t.c AS HUGEINT))
                        // CAST(rt.r AS HUGEINT)) AS HUGEINT)
                       AS p
            FROM trans t
            JOIN v{i - 1} v ON v.ty = t.src
            JOIN rt ON rt.src = t.src
            GROUP BY 1
        ),"""
        )
    tail = f"""
        emp AS (
            SELECT event_type AS ty,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n_all
            FROM events
        )
        SELECT e.ty AS event_type,
               CAST(COALESCE(v.p, 0) AS DOUBLE)
                   / 1000000000000.0 AS steady_prob,
               CAST(e.n AS DOUBLE) / CAST(tot.n_all AS DOUBLE)
                   AS empirical_prob,
               CAST(COALESCE(v.p, 0) AS DOUBLE)
                   / 1000000000000.0
               - CAST(e.n AS DOUBLE) / CAST(tot.n_all AS DOUBLE)
                   AS prob_gap
        FROM emp e
        LEFT JOIN v{_MSS_ITERS} v ON v.ty = e.ty, tot
    """
    return head + "\n".join(its) + tail


@register(
    "markov_steady_state",
    oracle=_mss_oracle(),
    ops=("O1", "A1"),
)
def markov_steady_state(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stationary distribution of the first-order event-type
    Markov chain (power method, 20 iterations), compared per type
    against the EMPIRICAL type distribution — 'where does user
    behavior converge vs where is it today', the drift-detection
    companion to event_transition_matrix.

    The pagerank conventions exactly (operators/graph.py): mass on
    the exact 1e12 integer grid, per-edge contributions
    floor((v·c)/r) summed as integers — bit-identical to the
    unrolled AS-MATERIALIZED CTE oracle; types that only ever end
    sequences absorb their mass deterministically (no outgoing
    row). The transition matrix is |types|²-bounded, so the model
    iterates DRIVER-SIDE on collected counts (the kmeans
    literal-model pattern — the corpus pays one lead() window and
    two aggregates; the 20 rounds cost zero jobs)."""
    from pyspark.sql import Window

    ev = read_star_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    trans_rows = (
        seq.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
        # bound-check BEFORE materializing (wordpiece.py pattern):
        # limit(n+1) caps driver memory so an unexpectedly huge
        # type space raises cleanly instead of OOMing first
        .limit(100_001)
        .collect()
    )
    if len(trans_rows) > 100_000:
        raise ValueError(
            "event-type transition matrix exceeds the bounded-"
            f"collect guard ({len(trans_rows)} cells); the "
            "driver-side iteration contract assumes a small "
            "type space"
        )
    types = [
        r["event_type"]
        # collect-bound: event-type value space, guarded above
        for r in ev.select("event_type").distinct().collect()
    ]
    trans = {(r["src"], r["dst"]): r["c"] for r in trans_rows}
    r_tot: dict[str, int] = {}
    for (s, _), c in trans.items():
        r_tot[s] = r_tot.get(s, 0) + c
    v = {t: _MSS_GRID // len(types) for t in types}
    for _ in range(_MSS_ITERS):
        nv: dict[str, int] = {}
        for (s, dst), c in trans.items():
            if s in v:
                nv[dst] = nv.get(dst, 0) + (v[s] * c) // r_tot[s]
        v = nv
    steady = spark.createDataFrame(
        [(t, int(v.get(t, 0))) for t in sorted(types)],
        "event_type string, p long",
    )
    emp = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = ev.agg(F.count(F.lit(1)).alias("n_all"))
    sp = F.col("p").cast("double") / F.lit(float(_MSS_GRID))
    ep = F.col("n").cast("double") / F.col("n_all").cast(
        "double"
    )
    return (
        emp.crossJoin(F.broadcast(tot))
        .join(F.broadcast(steady), "event_type", "left")
        .select(
            "event_type",
            F.coalesce(sp, F.lit(0.0)).alias("steady_prob"),
            ep.alias("empirical_prob"),
            (F.coalesce(sp, F.lit(0.0)) - ep).alias("prob_gap"),
        )
    )


_MRA_CHANNELS = ("click", "error", "signup", "view")
_MRA_ITERS = 20


def _mra_chain_ctes(tag: str, pinned: str | None) -> str:
    """One value-iteration chain (20 unrolled rounds) computing
    P(conversion | state) on the 1e12 grid; ``pinned`` zeroes a
    channel's value everywhere it appears as a destination — the
    removal-effect counterfactual."""
    pin = (
        f"WHEN t.dst = '{pinned}' THEN CAST(0 AS HUGEINT) "
        if pinned
        else ""
    )
    parts = [
        f"""
        v{tag}0 AS (SELECT src AS ty, CAST(0 AS HUGEINT) AS p
                    FROM rt),"""
    ]
    for i in range(1, _MRA_ITERS + 1):
        parts.append(
            f"""
        v{tag}{i} AS MATERIALIZED (
            SELECT t.src AS ty,
                   CAST(sum((CASE
                        WHEN t.dst = 'purchase'
                             THEN CAST(1000000000000 AS HUGEINT)
                        WHEN t.dst = '__END__'
                             THEN CAST(0 AS HUGEINT)
                        {pin}ELSE COALESCE(v.p, 0) END
                        * CAST(t.c AS HUGEINT))
                        // CAST(rt.r AS HUGEINT)) AS HUGEINT)
                       AS p
            FROM trans t
            LEFT JOIN v{tag}{i - 1} v ON v.ty = t.dst
            JOIN rt ON rt.src = t.src
            GROUP BY 1
        ),"""
        )
    return "".join(parts)


def _mra_oracle() -> str:
    """First-purchase journeys -> transition counts -> one base
    chain + one pinned chain per channel -> removal effects."""
    head = """
        WITH ordered AS (
            SELECT user_id, event_type,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id
                   ) AS rn
            FROM events
        ),
        fp AS (
            SELECT user_id, min(rn) AS prn
            FROM ordered WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        j AS MATERIALIZED (
            SELECT o.user_id, o.event_type, o.rn
            FROM ordered o LEFT JOIN fp USING (user_id)
            WHERE fp.prn IS NULL OR o.rn <= fp.prn
        ),
        steps AS (
            SELECT user_id, event_type AS src,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY rn
                   ) AS nxt
            FROM j
        ),
        trans AS MATERIALIZED (
            SELECT src, dst, CAST(count(*) AS BIGINT) AS c
            FROM (
                SELECT src, COALESCE(nxt, '__END__') AS dst
                FROM steps WHERE src <> 'purchase'
                UNION ALL
                SELECT '__START__', event_type FROM j
                WHERE rn = 1
            )
            GROUP BY 1, 2
        ),
        rt AS MATERIALIZED (
            SELECT src, CAST(sum(c) AS BIGINT) AS r
            FROM trans GROUP BY 1
        ),"""
    chains = [_mra_chain_ctes("b", None)]
    for ch in _MRA_CHANNELS:
        chains.append(_mra_chain_ctes(ch, ch))
    starts = ", ".join(
        f"""(SELECT COALESCE((SELECT p FROM v{ch}{_MRA_ITERS}
             WHERE ty = '__START__'), 0)) AS p_{ch}"""
        for ch in _MRA_CHANNELS
    )
    re_rows = " UNION ALL ".join(
        f"""SELECT '{ch}' AS channel, s.p_base,
            s.p_base - s.p_{ch} AS re
            FROM s"""
        for ch in _MRA_CHANNELS
    )
    tail = f"""
        s AS (
            SELECT
            (SELECT COALESCE((SELECT p FROM vb{_MRA_ITERS}
             WHERE ty = '__START__'), 0)) AS p_base,
            {starts}
        ),
        re AS (SELECT * FROM ({re_rows})),
        tot AS (SELECT sum(re) AS t FROM re)
        SELECT re.channel,
               CAST(re.p_base AS DOUBLE) / 1000000000000.0
                   AS p_conv_base,
               CAST(re.p_base - re.re AS DOUBLE)
                   / 1000000000000.0 AS p_conv_removed,
               CAST(re.re AS BIGINT) AS removal_effect_q,
               CASE WHEN tot.t > 0
                    THEN CAST(re.re AS DOUBLE)
                         / CAST(tot.t AS DOUBLE)
                    ELSE 0.0 END AS attribution_share
        FROM re, tot
    """
    return head + "".join(chains) + tail


@register(
    "markov_removal_attribution",
    oracle=_mra_oracle(),
    ops=("O1", "A1"),
)
def markov_removal_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MODEL-BASED marketing attribution (Markov removal effects)
    — the data-driven complement to purchase_attribution's
    rule-based first/last-touch: journeys are each user's events
    up to their FIRST purchase (conversion absorbs; no purchase →
    the journey ends in a failure state), a first-order chain is
    fit on (START, type→type, END) transition counts, and each
    channel's credit is its REMOVAL EFFECT — how much
    P(conversion from START) drops when every transition into the
    channel is redirected to failure. Shares are removal effects
    normalized over channels.

    Exactness: P(conversion|state) by 20 rounds of value iteration
    on the 1e12 grid with per-edge floor contributions
    (markov_steady_state's conventions) — the 5 chains (base + 4
    pinned counterfactuals) run DRIVER-SIDE on the bounded
    collected count matrix (≤(|types|+2)² cells, limit-guarded),
    bit-identical to the unrolled HUGEINT CTE oracle. The corpus
    pays two user-windows (rank, lead) and one combinable
    aggregate; the 100 iteration rounds cost zero Spark jobs."""
    from pyspark.sql import Window

    ev = read_star_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
    )
    fp = (
        o.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    j = o.join(fp, "user_id", "left").filter(
        F.col("prn").isNull() | (F.col("rn") <= F.col("prn"))
    )
    wj = Window.partitionBy("user_id").orderBy("rn")
    steps = j.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(wj).alias("nxt"),
    )
    internal = steps.filter(
        F.col("src") != "purchase"
    ).select(
        "src",
        F.coalesce(F.col("nxt"), F.lit("__END__")).alias("dst"),
    )
    start = j.filter(F.col("rn") == 1).select(
        F.lit("__START__").alias("src"),
        F.col("event_type").alias("dst"),
    )
    # bound-check BEFORE materializing (wordpiece.py pattern)
    rows = (
        internal.unionByName(start)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
        .limit(100_001)
        .collect()
    )
    if len(rows) > 100_000:
        raise ValueError(
            "attribution transition matrix exceeds the bounded-"
            f"collect guard ({len(rows)} cells)"
        )
    grid = 1_000_000_000_000
    c = {(r["src"], r["dst"]): r["c"] for r in rows}
    rt: dict[str, int] = {}
    for (s, _d), n in c.items():
        rt[s] = rt.get(s, 0) + n

    def pconv(pinned: str | None) -> int:
        v = {s: 0 for s in rt}
        for _ in range(_MRA_ITERS):
            nv: dict[str, int] = {}
            for (s, d), n in c.items():
                if d == "purchase":
                    pd = grid
                elif d == "__END__" or d == pinned:
                    pd = 0
                else:
                    pd = v.get(d, 0)
                nv[s] = nv.get(s, 0) + (pd * n) // rt[s]
            v = nv
        return v.get("__START__", 0)

    base = pconv(None)
    res = [(ch, base - pconv(ch)) for ch in _MRA_CHANNELS]
    tot = sum(re for _, re in res)
    out = [
        (
            ch,
            base / 1e12,
            (base - re) / 1e12,
            int(re),
            (float(re) / float(tot)) if tot > 0 else 0.0,
        )
        for ch, re in res
    ]
    return spark.createDataFrame(
        out,
        "channel string, p_conv_base double, "
        "p_conv_removed double, removal_effect_q long, "
        "attribution_share double",
    )


@register(
    "theil_sen_trend",
    oracle="""
        WITH daily AS (
            SELECT date_diff('day', DATE '1970-01-01',
                             CAST(ts AS DATE)) AS d,
                   CAST(sum(CAST(round(value * 100.0, 0)
                                 AS BIGINT)) AS BIGINT) AS v
            FROM events GROUP BY 1
        ),
        pairs AS MATERIALIZED (
            SELECT a.d AS di, b.d AS dj,
                   CAST(b.v - a.v AS DOUBLE)
                       / CAST(b.d - a.d AS DOUBLE) AS slope
            FROM daily a JOIN daily b ON b.d > a.d
        ),
        np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs
               FROM pairs),
        ms AS (
            SELECT slope FROM (
                SELECT slope,
                       row_number() OVER (
                           ORDER BY slope ASC, di ASC, dj ASC
                       ) AS rn
                FROM pairs
            ), np
            WHERE rn = (np.n_pairs + 1) // 2
        ),
        resid AS (
            SELECT daily.d,
                   CAST(daily.v AS DOUBLE)
                       - ms.slope * CAST(daily.d AS DOUBLE)
                       AS r
            FROM daily, ms
        ),
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days
               FROM daily),
        mi AS (
            SELECT r FROM (
                SELECT r, row_number() OVER (
                           ORDER BY r ASC, d ASC) AS rn
                FROM resid
            ), nd
            WHERE rn = (nd.n_days + 1) // 2
        )
        SELECT nd.n_days, np.n_pairs,
               ms.slope AS slope_cents_per_day,
               mi.r AS intercept_cents
        FROM nd, np, ms, mi
    """,
    ops=("A1", "A2"),
)
def theil_sen_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """THEIL-SEN ROBUST TREND of daily total spend — the
    median-of-pairwise-slopes estimator (29% breakdown point; the
    robust answer to ols_forecast's least squares, which one
    outlier day can drag arbitrarily): slope = lower median of
    (v_j-v_i)/(d_j-d_i) over all day pairs, intercept = lower
    median of v_i - slope*d_i.

    Exactness: daily totals are exact integer cents (round half-up
    per rule 1b); each pairwise slope is ONE double division of
    exact integers (portable); medians are INTEGER-rank order
    statistics — floor((n+1)/2), rule 5's rank discipline — with
    full deterministic tie-breaks. Scale shape: the corpus
    collapses to the DAY table in one combinable aggregate; the
    O(days^2) pair table and its rank windows are value-space
    bounded (365 days = 66k pairs), never corpus-sized —
    partitionless windows over bounded tables are the sanctioned
    kind."""
    from pyspark.sql import Window

    ev = read_star_table(spark, "events", sf_dir)
    daily = (
        ev.groupBy(
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("d")
        )
        .agg(
            F.sum(
                F.round(F.col("value") * 100.0, 0).cast("bigint")
            )
            .cast("bigint")
            .alias("v")
        )
        .localCheckpoint(eager=False)
    )
    a = daily.select(
        F.col("d").alias("di"), F.col("v").alias("vi")
    )
    b = daily.select(
        F.col("d").alias("dj"), F.col("v").alias("vj")
    )
    pairs = a.join(b, F.col("dj") > F.col("di")).select(
        "di",
        "dj",
        (
            (F.col("vj") - F.col("vi")).cast("double")
            / (F.col("dj") - F.col("di")).cast("double")
        ).alias("slope"),
    )
    wall = Window.partitionBy()
    ranked = pairs.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy().orderBy(
                F.col("slope").asc(),
                F.col("di").asc(),
                F.col("dj").asc(),
            )
        ),
    ).withColumn("n_pairs", F.count(F.lit(1)).over(wall))
    # integer lower-median rank: floor((n+1)/2), exact — (n+1) and
    # the halving are exact in double at this magnitude, matching
    # DuckDB's (n+1)//2 (rule 5's rank discipline)
    ms = ranked.filter(
        F.col("rn")
        == F.floor(
            (F.col("n_pairs").cast("double") + 1.0) / 2.0
        ).cast("bigint")
    ).select(
        F.col("slope"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
    )
    resid = daily.crossJoin(F.broadcast(ms)).select(
        "d",
        "n_pairs",
        "slope",
        (
            F.col("v").cast("double")
            - F.col("slope") * F.col("d").cast("double")
        ).alias("r"),
    )
    wd = Window.partitionBy().orderBy(
        F.col("r").asc(), F.col("d").asc()
    )
    out = (
        resid.withColumn("rn", F.row_number().over(wd))
        .withColumn("n_days", F.count(F.lit(1)).over(wall))
        .filter(
            F.col("rn")
            == F.floor(
                (F.col("n_days").cast("double") + 1.0) / 2.0
            ).cast("bigint")
        )
        .select(
            F.col("n_days").cast("bigint").alias("n_days"),
            "n_pairs",
            F.col("slope").alias("slope_cents_per_day"),
            F.col("r").alias("intercept_cents"),
        )
    )
    return out
