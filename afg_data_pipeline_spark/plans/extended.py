"""Extended join/set-op surface (SURVEY.md §2.4 closing note: the
reference has no right/full/semi/anti/as-of joins — the engine
exposes them anyway as declared, oracle-checked queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from afg_data_pipeline_spark.functions.numeric import dsum, sql_dsum
from afg_data_pipeline_spark.io import read_star_table
from afg_data_pipeline_spark.operators.joins import (
    asof_join_backward,
    salted_join,
)
from afg_data_pipeline_spark.plans.registry import register


@register(
    "asof_join_last_purchase",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts, e.value,
               p.ts AS asof_ts, p.value AS asof_value
        FROM events e
        ASOF LEFT JOIN (
            SELECT user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        ) p ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    ops=("J-ASOF",),
)
def asof_join_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event annotated with the user's most recent
    purchase at-or-before it.

    Spark lacks a native ASOF JOIN; the union+window formulation
    (operators/joins.py) is one key-partitioned shuffle — compare
    DuckDB's first-class ASOF LEFT JOIN in the oracle.
    """
    ev = read_star_table(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("value").alias("pvalue"),
    )
    out = asof_join_backward(
        ev.select("event_id", "user_id", "ts", "value"),
        purchases.select(
            "user_id", "ts", F.col("pvalue").alias("value")
        ).withColumnRenamed("ts", "pts"),
        key="user_id",
        left_ts="ts",
        right_ts="pts",
        right_values=["pts", "value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("asof_pts").alias("asof_ts"),
        F.col("asof_value").alias("asof_value"),
    )


@register(
    "semi_anti_join",
    oracle="""
        SELECT c.c_custkey, c.c_mktsegment,
               TRUE AS has_order
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
        UNION ALL
        SELECT c.c_custkey, c.c_mktsegment, FALSE AS has_order
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 300000)
    """,
    ops=("J-SEMI", "J-ANTI"),
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti joins, tagged and unioned.

    Semi/anti never materialize the right side's columns — at scale
    this is the difference between shuffling keys and shuffling the
    orders table.
    """
    c = read_star_table(spark, "customer", sf_dir)
    big = (
        read_star_table(spark, "orders", sf_dir)
        .filter(F.col("o_totalprice") > 300000)
        .select("o_custkey")
    )
    semi = c.join(
        big, c.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment", F.lit(True).alias("has_order"))
    anti = c.join(
        big, c.c_custkey == big.o_custkey, "left_anti"
    ).select(
        "c_custkey", "c_mktsegment", F.lit(False).alias("has_order")
    )
    return semi.unionByName(anti)


@register(
    "full_outer_join",
    oracle="""
        SELECT coalesce(b.c_custkey, o.o_custkey) AS custkey,
               b.c_acctbal,
               o.n_orders
        FROM (SELECT c_custkey, c_acctbal FROM customer
              WHERE c_mktsegment = 'BUILDING') b
        FULL OUTER JOIN (
            SELECT o_custkey, count(*) AS n_orders
            FROM orders GROUP BY o_custkey
        ) o ON b.c_custkey = o.o_custkey
    """,
    ops=("J-FULL",),
)
def full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with nulls on both sides."""
    b = (
        read_star_table(spark, "customer", sf_dir)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_acctbal")
    )
    o = (
        read_star_table(spark, "orders", sf_dir)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return b.join(o, b.c_custkey == o.o_custkey, "full").select(
        F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias(
            "custkey"
        ),
        "c_acctbal",
        "n_orders",
    )


@register(
    "intersect_except",
    oracle="""
        SELECT c_custkey, 'both' AS tag FROM (
            SELECT c_custkey FROM customer
            WHERE c_mktsegment = 'BUILDING'
            INTERSECT
            SELECT o_custkey FROM orders
        )
        UNION ALL
        SELECT c_custkey, 'building_only' AS tag FROM (
            SELECT c_custkey FROM customer
            WHERE c_mktsegment = 'BUILDING'
            EXCEPT
            SELECT o_custkey FROM orders
        )
    """,
    ops=("U-SET",),
)
def intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operations (distinct semantics)."""
    b = (
        read_star_table(spark, "customer", sf_dir)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = read_star_table(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("c_custkey")
    )
    both = b.intersect(o).select(
        "c_custkey", F.lit("both").alias("tag")
    )
    only = b.exceptAll(o).distinct().select(
        "c_custkey", F.lit("building_only").alias("tag")
    )
    return both.unionByName(only)


@register(
    "salted_join_revenue",
    oracle=f"""
        SELECT d.flag_name,
               count(*) AS n_items,
               {sql_dsum("l.l_extendedprice * (1 - l.l_discount)",
                         "revenue")}
        FROM lineitem l
        JOIN (VALUES ('R', 'returned'), ('A', 'acknowledged'),
                     ('N', 'none')) d(l_returnflag, flag_name)
          ON l.l_returnflag = d.l_returnflag
        GROUP BY d.flag_name
    """,
    ops=("J-SKEW",),
)
def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join: 3-value join key (maximal skew) spread over
    16 salt buckets; the oracle is the plain join — salting must be
    semantically invisible.
    """
    li = read_star_table(spark, "lineitem", sf_dir)
    dim = li.sparkSession.createDataFrame(
        [("R", "returned"), ("A", "acknowledged"), ("N", "none")],
        schema="l_returnflag string, flag_name string",
    )
    joined = salted_join(li, dim, key="l_returnflag", salt_buckets=16)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy("flag_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(revenue.cast("decimal(18,6)")).cast("double").alias(
            "revenue"
        ),
    )


@register(
    "range_join_bands",
    oracle="""
        SELECT e.event_id, e.value, b.band_id, b.band_name
        FROM events e
        JOIN (VALUES (0, 'low', 0.0, 25.0),
                     (1, 'mid', 25.0, 50.0),
                     (2, 'high', 50.0, 75.0),
                     (3, 'top', 75.0, 1e9))
             b(band_id, band_name, lo, hi)
          ON e.value >= b.lo AND e.value < b.hi
    """,
    ops=("J-RANGE",),
)
def range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval containment) join: each event matched to its
    value band via a non-equi predicate.

    Spark executes this as a broadcast nested-loop join — correct
    and cheap while the band table is small (the usual case). For
    two large interval sets the scale path is binning: add a
    bucket = floor(value/width) key to both sides, equi-join on the
    bucket, then apply the range predicate — same contract, shuffle
    instead of loop (the as-of and 1-D-NN operators in
    operators/joins.py and operators/spatial.py are built
    generalizations of that trick).
    """
    ev = read_star_table(spark, "events", sf_dir)
    bands = spark.createDataFrame(
        [
            (0, "low", 0.0, 25.0),
            (1, "mid", 25.0, 50.0),
            (2, "high", 50.0, 75.0),
            (3, "top", 75.0, 1e9),
        ],
        schema="band_id int, band_name string, lo double, hi double",
    )
    joined = ev.join(
        F.broadcast(bands),
        (ev.value >= bands.lo) & (ev.value < bands.hi),
    )
    return joined.select("event_id", "value", "band_id", "band_name")


@register(
    "key_skew_profile",
    oracle="""
        WITH c AS (
            SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY l_partkey
        ),
        g AS (
            SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
                   CAST(count(*) AS BIGINT) AS n_keys
            FROM c
        )
        SELECT c.key, c.cnt,
               CAST(c.cnt AS DOUBLE) / g.n_rows AS share,
               CAST(c.cnt * g.n_keys AS DOUBLE) / g.n_rows
                   AS skew_ratio,
               g.n_rows, g.n_keys
        FROM c, g
        ORDER BY c.cnt DESC, c.key ASC
        LIMIT 10
    """,
    ops=("A1", "O3"),
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution diagnostic (operators/skew.py): the ten
    hottest lineitem part keys with share-of-rows and skew ratio —
    the measurement a rule-13 salting decision or an AQE skew
    threshold is tuned from. One corpus-sized map-side-combinable
    count; everything downstream is key-cardinality sized, and the
    top-k is TakeOrderedAndProject (per-task partial top-k), never
    a partitionless window."""
    from afg_data_pipeline_spark.operators.skew import (
        key_skew_profile as profile,
    )

    li = read_star_table(spark, "lineitem", sf_dir)
    return profile(li, key_col="l_partkey", top_k=10)


@register(
    "join_key_skew",
    oracle="""
        WITH lc AS (
            SELECT l_partkey AS key,
                   CAST(count(*) AS BIGINT) AS cnt_left
            FROM lineitem GROUP BY l_partkey
        ),
        rc AS (
            SELECT l_partkey AS key,
                   CAST(count(*) AS BIGINT) AS cnt_right
            FROM lineitem GROUP BY l_partkey
        ),
        pk AS (
            SELECT key, cnt_left, cnt_right,
                   CAST(cnt_left AS DECIMAL(19,0))
                   * CAST(cnt_right AS DECIMAL(19,0))
                       AS joined_rows
            FROM lc JOIN rc USING (key)
        ),
        g AS (
            SELECT CAST(sum(joined_rows) AS DECIMAL(38,0))
                       AS predicted_rows,
                   CAST(count(*) AS BIGINT) AS n_join_keys
            FROM pk
        )
        SELECT pk.key, pk.cnt_left, pk.cnt_right,
               CAST(CAST(pk.joined_rows AS DECIMAL(38,0))
                    AS VARCHAR) AS joined_rows,
               CAST(pk.joined_rows AS DOUBLE)
                   / CAST(g.predicted_rows AS DOUBLE)
                   AS contribution_share,
               CAST(g.predicted_rows AS VARCHAR)
                   AS predicted_rows,
               g.n_join_keys
        FROM pk, g
        ORDER BY pk.joined_rows DESC, pk.key ASC
        LIMIT 5
    """,
    ops=("A1", "J4"),
)
def join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality forecast WITHOUT running the join
    (operators/skew.py): |A ⋈ B| = Σ_k cntL(k)·cntR(k) over the
    lineitem part-key self-join — the Σ|group|² diagnostic behind
    every blocking-join design in this repo. The five hottest join
    keys with their share of the predicted output; the total rides
    DECIMAL(38,0) because neither the per-key product nor its sum
    has a provable 2^63 bound at corpus scale (rule 11)."""
    from afg_data_pipeline_spark.operators.skew import join_key_skew

    li = read_star_table(spark, "lineitem", sf_dir)
    out = join_key_skew(
        li, "l_partkey", li, "l_partkey", top_k=5
    )
    # DECIMAL(38,0) stays internal (rule 11 accumulation); the
    # EXPOSED columns are string-cast identically on both engine
    # sides -- raw decimals ride different pandas conversion paths
    # in the driver (decimal.Decimal vs float64) and hash-mismatch
    # even when bit-equal (the r6 join_key_skew red row; values
    # exceed 2^53 at corpus scale so a double cast would be lossy).
    return out.withColumn(
        "joined_rows", F.col("joined_rows").cast("string")
    ).withColumn(
        "predicted_rows", F.col("predicted_rows").cast("string")
    )


@register(
    "zorder_skipping_report",
    oracle="""
        WITH base AS (
            SELECT CAST(l_partkey AS BIGINT) AS x,
                   CAST(l_suppkey AS BIGINT) AS y,
                   CAST(l_orderkey AS BIGINT) AS nk
            FROM lineitem
            WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
        ),
        bounds AS (
            SELECT min(x) AS minx, max(x) AS maxx,
                   min(y) AS miny, max(y) AS maxy
            FROM base
        ),
        r AS (
            SELECT ((x - minx) * 65535)
                       // GREATEST(maxx - minx, 1) AS xr,
                   ((y - miny) * 65535)
                       // GREATEST(maxy - miny, 1) AS yr,
                   nk
            FROM base, bounds
        ),
        z0 AS (SELECT xr, yr, nk, xr AS a, yr AS b FROM r),
        z1 AS (SELECT xr, yr, nk,
                      (a | (a << 8)) & 16711935 AS a,
                      (b | (b << 8)) & 16711935 AS b FROM z0),
        z2 AS (SELECT xr, yr, nk,
                      (a | (a << 4)) & 252645135 AS a,
                      (b | (b << 4)) & 252645135 AS b FROM z1),
        z3 AS (SELECT xr, yr, nk,
                      (a | (a << 2)) & 858993459 AS a,
                      (b | (b << 2)) & 858993459 AS b FROM z2),
        z4 AS (SELECT xr, yr, nk,
                      (a | (a << 1)) & 1431655765 AS a,
                      (b | (b << 1)) & 1431655765 AS b FROM z3),
        k AS (SELECT xr, yr, nk, a | (b << 1) AS zkey FROM z4),
        tagged AS (
            SELECT 'zorder' AS layout, zkey >> 22 AS block,
                   xr, yr FROM k
            UNION ALL
            SELECT 'sort_x', xr >> 6, xr, yr FROM k
            UNION ALL
            SELECT 'natural', nk % 1024, xr, yr FROM k
        ),
        stats AS (
            SELECT layout, block,
                   min(xr) AS bminx, max(xr) AS bmaxx,
                   min(yr) AS bminy, max(yr) AS bmaxy,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM tagged GROUP BY 1, 2
        ),
        hits AS (
            SELECT *,
                   (bmaxx >= 26214 AND bminx <= 29490
                    AND bmaxy >= 19660 AND bminy <= 29490) AS hit
            FROM stats
        )
        SELECT layout,
               CAST(count(*) AS BIGINT) AS blocks_total,
               CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END)
                    AS BIGINT) AS blocks_read,
               CAST(sum(n_rows) AS BIGINT) AS rows_total,
               CAST(sum(CASE WHEN hit THEN n_rows ELSE 0 END)
                    AS BIGINT) AS rows_read,
               CAST(sum(CASE WHEN hit THEN n_rows ELSE 0 END)
                    AS DOUBLE)
                   / CAST(sum(n_rows) AS DOUBLE) AS read_fraction
        FROM hits
        GROUP BY layout
        ORDER BY layout
    """,
    ops=("P10", "A1"),
)
def zorder_skipping_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Zone-map data-skipping effectiveness of three physical
    layouts (Z-order / single-dim sort / natural) for a rectangle
    predicate on (l_partkey, l_suppkey) — operators/layout.py.
    The Morton key is a codegen'd mask-shift projection; blocks
    are key-prefix buckets (value-space, no global row-number
    window); the report is two map-side-combinable aggregates, so
    the only corpus-sized shuffle carries block-level rows. The
    rectangle is ~5% of the part range x ~15% of the supplier
    range in rank space: the Z-order layout should read a small
    multiple of the true selectivity while `natural` reads ~100%
    of blocks - the measurement behind a Delta/Iceberg-style
    OPTIMIZE ZORDER decision at 100 TB."""
    from afg_data_pipeline_spark.operators.layout import (
        zone_map_skipping_report,
    )

    li = read_star_table(spark, "lineitem", sf_dir)
    return zone_map_skipping_report(
        li,
        "l_partkey",
        "l_suppkey",
        x_rank_range=(26214, 29490),
        y_rank_range=(19660, 29490),
        block_bits=10,
        natural_key="l_orderkey",
    )


@register(
    "chisq_independence",
    oracle="""
        WITH cells AS (
            SELECT n.n_name AS nation,
                   o.o_orderstatus AS status,
                   CAST(count(*) AS BIGINT) AS observed
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        rt AS (
            SELECT nation, CAST(sum(observed) AS BIGINT) AS rtot
            FROM cells GROUP BY 1
        ),
        ct AS (
            SELECT status, CAST(sum(observed) AS BIGINT) AS ctot
            FROM cells GROUP BY 1
        ),
        tot AS (
            SELECT CAST(sum(observed) AS BIGINT) AS n FROM cells
        ),
        grid AS (
            SELECT rt.nation, ct.status, rt.rtot, ct.ctot,
                   COALESCE(cells.observed, 0) AS observed
            FROM rt CROSS JOIN ct
            LEFT JOIN cells USING (nation, status)
        ),
        contrib AS (
            SELECT nation, status, observed,
                   CAST(round(
                       (CAST(observed AS DOUBLE)
                        - CAST(rtot AS DOUBLE)
                          * CAST(ctot AS DOUBLE)
                          / CAST(n AS DOUBLE))
                       * (CAST(observed AS DOUBLE)
                          - CAST(rtot AS DOUBLE)
                            * CAST(ctot AS DOUBLE)
                            / CAST(n AS DOUBLE))
                       / (CAST(rtot AS DOUBLE)
                          * CAST(ctot AS DOUBLE)
                          / CAST(n AS DOUBLE))
                       * 1000000.0) AS BIGINT) AS cq
            FROM grid, tot
        )
        SELECT CAST(sum(cq) AS DOUBLE) / 1000000.0 AS chi2,
               CAST((count(DISTINCT nation) - 1)
                    * (count(DISTINCT status) - 1) AS BIGINT)
                   AS dof,
               CAST(sum(observed) AS BIGINT) AS n
        FROM contrib
    """,
    ops=("A1", "J1"),
)
def chisq_independence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pearson chi-square test of independence: is order status
    independent of customer nation? The contingency table is ONE
    map-side-combinable count (cells bounded by |nations|x
    |statuses|); row/column totals and expected counts are
    cell-level arithmetic on the tiny table; each cell's
    (O-E)^2/E contribution is quantized once to the 1e6 grid
    (rule 1c - the division chain is irrational-adjacent) and
    summed exactly, so chi2 is bit-identical across engines; the
    grid is DENSIFIED first (a missing combination is a zero cell
    contributing E). The only corpus-sized work is the
    orders->customer join + count."""
    o = read_star_table(spark, "orders", sf_dir)
    c = read_star_table(spark, "customer", sf_dir)
    n = read_star_table(spark, "nation", sf_dir)
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    rt = cells.groupBy("nation").agg(
        F.sum("observed").alias("rtot")
    )
    ct = cells.groupBy("status").agg(
        F.sum("observed").alias("ctot")
    )
    tot = cells.agg(F.sum("observed").alias("n"))
    e = (
        F.col("rtot").cast("double")
        * F.col("ctot").cast("double")
        / F.col("n").cast("double")
    )
    cq = F.round(
        (F.col("observed").cast("double") - e)
        * (F.col("observed").cast("double") - e)
        / e
        * F.lit(1000000.0)
    ).cast("bigint")
    # densify: a missing (nation, status) combination is a ZERO
    # cell and contributes E to the statistic — dropping it would
    # understate chi2 (caught by the planted diagonal test)
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .join(F.broadcast(cells), ["nation", "status"], "left")
        .withColumn(
            "observed", F.coalesce(F.col("observed"), F.lit(0))
        )
    )
    contrib = grid.crossJoin(F.broadcast(tot)).select(
        "nation", "status", "observed", cq.alias("cq")
    )
    return contrib.agg(
        (F.sum("cq").cast("double") / F.lit(1000000.0)).alias(
            "chi2"
        ),
        (
            (F.countDistinct("nation") - F.lit(1))
            * (F.countDistinct("status") - F.lit(1))
        ).cast("bigint").alias("dof"),
        F.sum("observed").cast("bigint").alias("n"),
    )
