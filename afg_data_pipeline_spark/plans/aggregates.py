"""Aggregation-layer declared queries (SURVEY.md §2.5 + extended).

Medians, multi-level fallback medians, argmin, rollup/cube grouping
sets, and distinct counts. Float sums/avgs use the decimal trick
(functions.numeric); percentile interpolation was verified
bit-identical between Spark `percentile` and DuckDB `quantile_cont`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from afg_data_pipeline_spark.functions.numeric import (
    davg,
    dsum,
    dsum_expr,
    lavg,
    lsum,
    sql_davg,
    sql_dsum,
    sql_lavg,
    sql_lsum,
)
from afg_data_pipeline_spark.io import read_star_table
from afg_data_pipeline_spark.plans.registry import register


@register(
    "pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {sql_lsum("l_quantity", "sum_qty")},
               {sql_dsum("l_extendedprice", "sum_base_price")},
               {sql_dsum("l_extendedprice * (1 - l_discount)",
                         "sum_disc_price")},
               {sql_dsum(
                   "l_extendedprice * (1 - l_discount) * (1 + l_tax)",
                   "sum_charge")},
               {sql_lavg("l_quantity", "avg_qty")},
               {sql_davg("l_extendedprice", "avg_price")},
               {sql_lavg("l_discount", "avg_disc")},
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    ops=("A1", "P2"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: groupBy + 8 aggregates.

    Reference analogue: groupby(['comuna','año']).agg(sum) at
    matriz_movilidad.ipynb cell 6 (nb:73), widened to the classic
    multi-aggregate scan. One pass over the fact table, map-side
    partial aggregation, 6-group output — the canonical
    shuffle-light OLAP shape.

    Aggregate strategy (measured at sf0.1: all-decimal 1.59s vs
    native doubles 0.37s — the JVM BigDecimal buffer is the whole
    gap): quantity and discount ride the lsum/lavg LONG fast path,
    whose 2^63 bound is provable at ANY realistic scale (|qty| ≤
    50·10² scaled → overflow needs 1.8e15 rows; |disc| ≤ 10); the
    money columns stay decimal — their scaled magnitudes (~10⁷/row
    at 2 decimals, ~10⁹ for the 4-decimal charge product) would
    overflow long near 10¹²/10⁹ rows, inside a 100 TB fact table's
    range (CLAUDE.md rule 1: lsum only when provable).
    """
    li = read_star_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        lsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum_expr(disc_price, "sum_disc_price"),
        dsum_expr(disc_price * (1 + F.col("l_tax")), "sum_charge"),
        lavg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        lavg("l_discount", "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "agg_median",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               quantile_cont(l_quantity, 0.5) AS median_qty,
               quantile_cont(l_extendedprice, 0.5) AS median_price,
               min(l_quantity) AS min_qty,
               max(l_quantity) AS max_qty
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    ops=("A2", "A3"),
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact group medians (the reference's seasonal-pattern agg).

    Reference: per-(Comuna, dia_año) median temperature at
    temperaturas_rm.py:202 and fallback medians 213/216. Spark
    `percentile` (exact, interpolating) matches DuckDB
    quantile_cont bit-for-bit — verified on this data. At 100 TB
    exact percentile is a full sort per group; approx_percentile is
    the scale escape hatch (see approx_distinct_counts).
    """
    li = read_star_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("median_qty"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("median_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@register(
    "argmin_per_group",
    oracle="""
        SELECT s_nationkey, s_name AS cheapest_supplier,
               s_acctbal AS min_acctbal
        FROM (
            SELECT s_nationkey, s_name, s_acctbal,
                   ROW_NUMBER() OVER (
                       PARTITION BY s_nationkey
                       ORDER BY s_acctbal ASC, s_suppkey ASC
                   ) AS rn
            FROM supplier
        ) WHERE rn = 1
    """,
    ops=("A5", "O3", "J3"),
)
def argmin_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin per group via min_by (the nearest-station primitive).

    Reference: cdist(...).argmin()/min() per comuna at
    temperaturas_rm.py:125-126. Spark's direct primitive is
    min_by(value, ordering); a struct ordering key gives the
    deterministic tie-break the oracle spells with ROW_NUMBER.
    min_by is a plain aggregate — partial-aggregatable, no window
    shuffle — so it beats row_number at scale.
    """
    s = read_star_table(spark, "supplier", sf_dir)
    ordkey = F.struct(F.col("s_acctbal"), F.col("s_suppkey"))
    return s.groupBy("s_nationkey").agg(
        F.min_by("s_name", ordkey).alias("cheapest_supplier"),
        F.min("s_acctbal").alias("min_acctbal"),
    )


@register(
    "group_rollup",
    oracle=f"""
        SELECT r.r_name, n.n_name,
               count(*) AS n_customers,
               {sql_dsum("c.c_acctbal", "total_acctbal")}
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    ops=("A1",),
)
def group_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP grouping sets.

    Not in the reference (SURVEY.md §2.5 notes rollup/cube come free
    in Spark and are declared extended surface). Rollup computes
    region/nation/grand-total in one shuffle instead of three
    separate aggregations + union.
    """
    c = read_star_table(spark, "customer", sf_dir)
    n = read_star_table(spark, "nation", sf_dir)
    r = read_star_table(spark, "region", sf_dir)
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal", "total_acctbal"),
    )


@register(
    "group_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus, count(*) AS n_items
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    ops=("A1",),
)
def group_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping-set combinations via CUBE (extended surface)."""
    li = read_star_table(spark, "lineitem", sf_dir)
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items")
    )


@register(
    "distinct_counts",
    oracle="""
        SELECT count(*) AS n_rows,
               count(DISTINCT l_orderkey) AS n_orders,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_suppliers
        FROM lineitem
    """,
    ops=("A7", "A8"),
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts (the reference's unique()/len()).

    Reference: unique() at nb:143 / temperaturas_rm.py:183,226 and
    len(df) at temperaturas_rm.py:160. At 100 TB exact
    count-distinct on a high-cardinality key is a full shuffle per
    key; approx_count_distinct (HLL) is the scale path — kept as a
    separate Spark-only query since its value is engine-specific.
    """
    li = read_star_table(spark, "lineitem", sf_dir)
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col("l_orderkey")).alias("n_orders"),
        F.count_distinct(F.col("l_partkey")).alias("n_parts"),
        F.count_distinct(F.col("l_suppkey")).alias("n_suppliers"),
    )


@register(
    "approx_distinct_counts",
    oracle=None,  # HLL sketch values are engine-specific by design.
    ops=("A7",),
)
def approx_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL±5%) — the 100 TB distinct-count.

    No oracle: sketch estimates are engine-specific; the exact twin
    (distinct_counts) is the correctness anchor, and the pytest
    suite asserts the estimate lands within rsd of the exact value.
    """
    li = read_star_table(spark, "lineitem", sf_dir)
    return li.agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias(
            "approx_orders"
        ),
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
    )


@register(
    "approx_quantiles",
    oracle=None,  # KLL-style sketch values are engine-specific.
    ops=("A2", "A7"),
)
def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile quantile sketch per group — the 100 TB
    quantile path (mergeable sketches: one pass, partial-aggregate
    combine, no per-group sort).

    No oracle: sketch outputs are engine-specific by design; the
    exact twin (agg_median) anchors correctness and pytest asserts
    each estimate lands within the sketch's rank-error bound of the
    exact percentile.

    Output is scalar double columns (p25/p50/p75), not an
    array<double> — the driver's rows-only canonicalizer hashes
    scalar cells only (array cells crashed it in round 1).
    """
    li = read_star_table(spark, "lineitem", sf_dir)
    q = li.groupBy("l_returnflag").agg(
        F.approx_percentile(
            "l_extendedprice",
            F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
            F.lit(10_000),
        ).alias("price_quartiles"),
        F.approx_percentile("l_quantity", F.lit(0.5), F.lit(10_000))
        .alias("approx_median_qty"),
    )
    return q.select(
        "l_returnflag",
        F.element_at("price_quartiles", 1).alias("price_p25"),
        F.element_at("price_quartiles", 2).alias("price_p50"),
        F.element_at("price_quartiles", 3).alias("price_p75"),
        "approx_median_qty",
    )


@register(
    "grouping_sets",
    oracle="""
        SELECT lang, source, count(*) AS n_docs,
               CAST(grouping(lang) AS INTEGER) AS g_lang,
               CAST(grouping(source) AS INTEGER) AS g_source
        FROM documents
        GROUP BY GROUPING SETS ((lang), (source), (lang, source))
    """,
    ops=("A1",),
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() indicator columns.

    The indicators disambiguate subtotal rows from genuine-null
    groups — the piece rollup/cube queries omit; one shuffle for
    all three groupings.
    """
    docs = read_star_table(spark, "documents", sf_dir)
    grouped = docs.groupingSets(
        [["lang"], ["source"], ["lang", "source"]], "lang", "source"
    )
    return grouped.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.grouping("lang").cast("int").alias("g_lang"),
        F.grouping("source").cast("int").alias("g_source"),
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
        SELECT l.l_orderkey,
               {sql_dsum("l.l_extendedprice * (1 - l.l_discount)",
                         "revenue")},
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15'
          AND l.l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
        LIMIT 10
    """,
    ops=("A1", "J1", "O2"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-table join, filtered, revenue per order,
    global top-10 — the classic join-agg-topk pipeline. Segment
    filter prunes customer before the join; TakeOrderedAndProject
    avoids the global sort.
    """
    c = read_star_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = read_star_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = read_star_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_expr(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue").desc(),
            F.col("o_orderdate").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(10)
    )


@register(
    "q5_region_volume",
    oracle=f"""
        SELECT n.n_name,
               {sql_dsum("l.l_extendedprice * (1 - l.l_discount)",
                         "revenue")}
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n.n_name
    """,
    ops=("A1", "J1"),
)
def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-table star join filtered to one region and
    a date range, revenue per nation. Region/nation broadcast;
    the fact side streams through hash joins.
    """
    r = read_star_table(spark, "region", sf_dir).filter(
        F.col("r_name") == "ASIA"
    )
    n = read_star_table(spark, "nation", sf_dir)
    c = read_star_table(spark, "customer", sf_dir)
    o = read_star_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = read_star_table(spark, "lineitem", sf_dir)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum_expr(revenue, "revenue"))
    )
