"""TPC-H-classic query shapes over the driver star schema.

Widens the A1/J1 surface (SURVEY.md §2.4-2.6) with the canonical
OLAP join-aggregate patterns: correlated EXISTS / NOT EXISTS
(semi/anti joins), scalar subqueries, conditional-aggregate ratios,
disjunctive pushdown predicates, group-HAVING semi joins, and
top-k with tie-breaks. The driver schema has no partsupp table and
no commit/receipt dates, so Q2/Q4/Q9/Q12/Q16/Q21 are adapted shapes
(noted per query); the join/agg topology is the classic one.

Scale notes common to all: dimension sides broadcast, fact-side
filters pushed to the parquet scan, SUM/AVG via decimal accumulation
(functions/numeric.py) so results are bit-stable under AQE re-plans
and retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from afg_data_pipeline_spark.functions.numeric import (
    davg,
    dsum,
    dsum_expr,
    lsum,
    sql_dsum,
    sql_lsum,
)
from afg_data_pipeline_spark.io import read_star_table
from afg_data_pipeline_spark.plans.registry import register


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp_ntz")


@register(
    "q6_revenue_delta",
    oracle=f"""
        SELECT {sql_dsum("l_extendedprice * l_discount", "revenue")}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN CAST(0.05 AS DOUBLE)
                             AND CAST(0.07 AS DOUBLE)
          AND l_quantity < CAST(24 AS DOUBLE)
    """,
    ops=("A1", "P2"),
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate, zero joins.

    All three predicates (range, between, comparison) push to the
    parquet scan; the single global sum is one partial-agg +
    1-row exchange. The simplest possible 100 TB query — any plan
    other than scan→partial→final is wrong.
    """
    li = read_star_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return li.agg(
        dsum_expr(
            F.col("l_extendedprice") * F.col("l_discount"), "revenue"
        )
    )


@register(
    "q4_priority_exists",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
    """,
    ops=("A1", "J1"),
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape, adapted: correlated EXISTS as a left-semi
    join (the schema has no commit/receipt dates, so "late" is
    shipped >60 days after order date).

    The semi join carries the correlated non-equi predicate in the
    join condition; Spark dedups order keys during the semi probe —
    no DISTINCT pass, no row duplication from multi-lineitem orders.
    """
    o = read_star_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-07-01"))
    )
    li = read_star_table(spark, "lineitem", sf_dir)
    late = li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    return (
        o.join(li, (li.l_orderkey == o.o_orderkey) & late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER)
                   AS l_year,
               {sql_dsum("l.l_extendedprice * (1 - l.l_discount)",
                         "revenue")}
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY supp_nation, cust_nation, l_year
    """,
    ops=("A1", "J1"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume — the same dimension table
    joined twice under different roles (supplier vs customer
    nation), with a disjunctive cross-table predicate.

    Both nation copies broadcast; the pair filter runs after both
    joins (it references columns from each side). Fact-side date
    filter pushes to the scan.
    """
    li = read_star_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    s = read_star_table(spark, "supplier", sf_dir)
    o = read_star_table(spark, "orders", sf_dir)
    c = read_star_table(spark, "customer", sf_dir)
    n = read_star_table(spark, "nation", sf_dir)
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_name").alias("cust_nation"),
    )
    pair = (
        (F.col("supp_nation") == "NATION_1")
        & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2")
        & (F.col("cust_nation") == "NATION_1")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum_expr(revenue, "revenue"))
    )


@register(
    "q8_market_share",
    oracle="""
        SELECT o_year,
               CAST(SUM(CAST(nation_volume AS DECIMAL(18,6)))
                    AS DOUBLE)
               / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE)
                   AS mkt_share
        FROM (
            SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER)
                       AS o_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume,
                   CASE WHEN n1.n_name = 'NATION_3'
                        THEN l.l_extendedprice * (1 - l.l_discount)
                        ELSE 0.0 END AS nation_volume
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
            JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n2.n_regionkey
            WHERE r.r_name = 'EUROPE'
              AND p.p_type = 'PROMO'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
        )
        GROUP BY o_year
    """,
    ops=("A1", "J1", "F6"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — ratio of a conditional sum
    to a total sum per group, over an 8-table star join.

    Both sums accumulate in decimal inside one aggregate pass; the
    ratio is a single IEEE division of two deterministic doubles, so
    it hash-matches the oracle exactly. The CASE branches on the
    supplier-role nation while the region filter applies to the
    customer-role nation — the two roles must stay distinct copies.
    """
    li = read_star_table(spark, "lineitem", sf_dir)
    p = read_star_table(spark, "part", sf_dir).filter(
        F.col("p_type") == "PROMO"
    )
    s = read_star_table(spark, "supplier", sf_dir)
    o = read_star_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    c = read_star_table(spark, "customer", sf_dir)
    n = read_star_table(spark, "nation", sf_dir)
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_regionkey").alias("c_rkey"),
    )
    r = read_star_table(spark, "region", sf_dir).filter(
        F.col("r_name") == "EUROPE"
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_volume = F.when(
        F.col("supp_nation") == "NATION_3", volume
    ).otherwise(F.lit(0.0))
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == r.r_regionkey)
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            dsum_expr(nation_volume, "nation_volume"),
            dsum_expr(volume, "volume"),
        )
        .select(
            "o_year",
            (F.col("nation_volume") / F.col("volume")).alias(
                "mkt_share"
            ),
        )
    )


@register(
    "q9_profit_by_nation_year",
    oracle=f"""
        SELECT n.n_name AS nation,
               CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER)
                   AS o_year,
               {sql_dsum(
                   "l.l_extendedprice * (1 - l.l_discount)"
                   " - 0.1 * p.p_retailprice * l.l_quantity",
                   "sum_profit")}
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%gear%'
        GROUP BY nation, o_year
    """,
    ops=("A1", "J1", "F5"),
)
def q9_profit_by_nation_year(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q9 shape, adapted: product-line profit by supplier
    nation and order year (no partsupp table, so supply cost is
    modeled as 10% of retail price).

    The part filter is a LIKE containment — not sargable as a
    parquet min/max predicate, but the broadcast of the filtered
    part side keeps the fact scan joined without a shuffle.
    """
    li = read_star_table(spark, "lineitem", sf_dir)
    p = read_star_table(spark, "part", sf_dir).filter(
        F.col("p_name").like("%gear%")
    )
    s = read_star_table(spark, "supplier", sf_dir)
    o = read_star_table(spark, "orders", sf_dir)
    n = read_star_table(spark, "nation", sf_dir)
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum_expr(profit, "sum_profit"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
        SELECT c.c_custkey, c.c_name,
               {sql_dsum("l.l_extendedprice * (1 - l.l_discount)",
                         "revenue")},
               c.c_acctbal, n.n_name
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-07-01'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, c.c_custkey ASC
        LIMIT 20
    """,
    ops=("A1", "J1", "O2"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in a
    quarter. Join-agg-topk with a wide grouping key (all output
    dimension attributes fold into the groupBy, avoiding a second
    join to re-attach them).
    """
    c = read_star_table(spark, "customer", sf_dir)
    o = read_star_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-07-01"))
    )
    li = read_star_table(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag") == "R"
    )
    n = read_star_table(spark, "nation", sf_dir)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum_expr(revenue, "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "q14_promo_effect",
    oracle="""
        SELECT CAST(100.0 AS DOUBLE)
               * CAST(SUM(CAST(promo_volume AS DECIMAL(18,6)))
                      AS DOUBLE)
               / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE)
                   AS promo_revenue
        FROM (
            SELECT l.l_extendedprice * (1 - l.l_discount) AS volume,
                   CASE WHEN p.p_type = 'PROMO'
                        THEN l.l_extendedprice * (1 - l.l_discount)
                        ELSE 0.0 END AS promo_volume
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
              AND l.l_shipdate < TIMESTAMP '1996-04-01'
        )
    """,
    ops=("A1", "J1", "F6"),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion revenue share for one month — the
    conditional-aggregate-ratio pattern on a 2-table join.

    (100.0 * num) / den is evaluated left-to-right on both sides so
    the float result is bit-identical.
    """
    li = read_star_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= _ts("1996-03-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    p = read_star_table(spark, "part", sf_dir)
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", volume).otherwise(
        F.lit(0.0)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            dsum_expr(promo, "promo_volume"),
            dsum_expr(volume, "volume"),
        )
        .select(
            (
                F.lit(100.0)
                * F.col("promo_volume")
                / F.col("volume")
            ).alias("promo_revenue")
        )
    )


@register(
    "q16_supplier_cnt",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#3'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    ops=("A1", "A7", "J1"),
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape, adapted: distinct supplier count per part
    attribute triple, with a NOT IN exclusion subquery (lineitem is
    the part↔supplier bridge; the schema has no partsupp).

    NOT IN over a nullable-free key is a left-anti join; the
    exclusion side is tiny and broadcasts. count(DISTINCT) expands
    to a two-phase aggregate — partial distinct then merge — which
    is the scalable plan (no global de-dup shuffle of raw rows).
    """
    li = read_star_table(spark, "lineitem", sf_dir)
    p = read_star_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    bad = read_star_table(spark, "supplier", sf_dir).filter(
        F.col("s_acctbal") < 0
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            F.broadcast(bad),
            li.l_suppkey == bad.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
        WITH brand_li AS (
            SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand = 'Brand#13'
        ), part_avg AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
                        AS DOUBLE)
                   / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty
            FROM brand_li
            GROUP BY l_partkey
        )
        SELECT CAST(SUM(CAST(b.l_extendedprice AS DECIMAL(18,6)))
                    AS DOUBLE) / CAST(7.0 AS DOUBLE) AS avg_yearly
        FROM brand_li b
        JOIN part_avg a ON a.l_partkey = b.l_partkey
        WHERE b.l_quantity < CAST(0.2 AS DOUBLE) * a.avg_qty
    """,
    ops=("A1", "A5", "J1"),
)
def q17_small_qty_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q17: revenue from small-quantity orders — a correlated
    scalar aggregate (per-part average) decorrelated into an
    aggregate + self-join, the standard Catalyst rewrite.

    The brand filter shrinks the bridge before the per-part average,
    so the self-join is between two already-small sides; the average
    uses decimal accumulation to keep the 0.2*avg threshold (and
    hence row membership) deterministic.
    """
    li = read_star_table(spark, "lineitem", sf_dir)
    p = read_star_table(spark, "part", sf_dir).filter(
        F.col("p_brand") == "Brand#13"
    )
    brand_li = li.join(
        F.broadcast(p), li.l_partkey == p.p_partkey
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    part_avg = brand_li.groupBy(
        F.col("l_partkey").alias("pa_partkey")
    ).agg(davg("l_quantity", "avg_qty"))
    joined = brand_li.join(
        F.broadcast(part_avg),
        F.col("l_partkey") == F.col("pa_partkey"),
    ).filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    return joined.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
            .cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly")
    )


@register(
    "q18_large_volume",
    oracle=f"""
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, big.sum_qty
        FROM (
            SELECT l_orderkey,
                   {sql_lsum("l_quantity", "sum_qty")}
            FROM lineitem
            GROUP BY l_orderkey
            HAVING sum_qty > CAST(300 AS DOUBLE)
        ) big
        JOIN orders o ON o.o_orderkey = big.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
        LIMIT 100
    """,
    ops=("A1", "J1", "O2"),
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders — aggregate-then-filter
    (HAVING) feeding a join, the inverse of filter-then-aggregate.

    The per-order quantity sum uses the long fast path (quantities
    are 2-decimal bounded); the HAVING shrinks the driving side to
    a handful of orders, after which both joins are effectively
    lookups. orderBy+limit compiles to TakeOrderedAndProject.
    """
    li = read_star_table(spark, "lineitem", sf_dir)
    o = read_star_table(spark, "orders", sf_dir)
    c = read_star_table(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(lsum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > 300.0)
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
        )
        .limit(100)
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
        SELECT {sql_dsum("l.l_extendedprice * (1 - l.l_discount)",
                         "revenue")}
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12'
               AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity >= CAST(1 AS DOUBLE)
               AND l.l_quantity <= CAST(11 AS DOUBLE))
           OR (p.p_brand = 'Brand#23'
               AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity >= CAST(10 AS DOUBLE)
               AND l.l_quantity <= CAST(20 AS DOUBLE))
           OR (p.p_brand = 'Brand#3'
               AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity >= CAST(20 AS DOUBLE)
               AND l.l_quantity <= CAST(30 AS DOUBLE))
    """,
    ops=("A1", "J1", "P2"),
)
def q19_disjunctive_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q19: disjunctive multi-table predicate — three OR-ed
    conjunctions spanning both join sides.

    Catalyst factors the part-only disjuncts (brand ∪ size ranges)
    into a pre-join filter on the broadcast side and keeps the
    cross-side residual on the join; the fact scan still prunes to
    the 3 quantity ranges' union via OR-pushdown.
    """
    li = read_star_table(spark, "lineitem", sf_dir)
    p = read_star_table(spark, "part", sf_dir)
    q = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & (q >= 1.0)
            & (q <= 11.0)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & (q >= 10.0)
            & (q <= 20.0)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & (q >= 20.0)
            & (q <= 30.0)
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(dsum_expr(revenue, "revenue"))
    )


@register(
    "q21_waiting_supplier",
    oracle="""
        SELECT s.s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE l1.l_returnflag = 'R'
          AND o.o_orderstatus = 'F'
          AND n.n_name = 'NATION_5'
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_returnflag = 'R'
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name ASC
        LIMIT 100
    """,
    ops=("A1", "J1", "O2"),
)
def q21_waiting_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q21 shape, adapted: the sole-blame supplier — EXISTS
    plus NOT EXISTS correlated self-joins on the fact table (the
    schema has no commit/receipt dates, so "failed" is a returned
    lineitem in a finished multi-supplier order).

    Each correlated quantifier becomes one self semi/anti join on
    the order key with the inequality as a residual condition; both
    shuffle on l_orderkey, so AQE coalesces them into the same
    exchange layout. At 100 TB the pre-filter to returnflag='R'
    shrinks the probe side ~3x before either self-join.
    """
    li = read_star_table(spark, "lineitem", sf_dir)
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    s = read_star_table(spark, "supplier", sf_dir)
    o = read_star_table(spark, "orders", sf_dir).filter(
        F.col("o_orderstatus") == "F"
    )
    n = read_star_table(spark, "nation", sf_dir).filter(
        F.col("n_name") == "NATION_5"
    )
    sole = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        sole.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


@register(
    "q22_idle_customers",
    oracle="""
        WITH thresh AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6)))
                        AS DOUBLE)
                   / CAST(COUNT(c_acctbal) AS DOUBLE) AS avg_bal
            FROM customer
            WHERE c_acctbal > CAST(0.0 AS DOUBLE)
        )
        SELECT right(c.c_name, 1) AS cntrycode,
               count(*) AS numcust,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6)))
                    AS DOUBLE) AS totacctbal
        FROM customer c, thresh t
        WHERE c.c_acctbal > t.avg_bal
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '1998-01-01'
          )
        GROUP BY cntrycode
    """,
    ops=("A1", "J1", "F2"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape, adapted: wealthy customers with no RECENT
    orders (the driver data has no order-less customers, so "idle"
    is no order since 1998) — a scalar subquery (global average)
    plus NOT EXISTS anti join, grouped by a name-derived code.

    The scalar aggregate is a 1-row DataFrame cross-joined in as a
    broadcast: no .collect(), no driver round-trip, and the plan
    stays a single job. The anti join shuffles customer vs orders
    on custkey — at 100 TB the orders side can pre-project to the
    distinct key set to cut the shuffle payload.
    """
    c = read_star_table(spark, "customer", sf_dir)
    o = (
        read_star_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderdate") >= _ts("1998-01-01"))
        .select("o_custkey")
    )
    thresh = c.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal", "avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.expr("right(c_name, 1)").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
        WITH cost AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice) AS supplycost
            FROM lineitem
            GROUP BY l_partkey, l_suppkey
        ), euro AS (
            SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
            FROM supplier s
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'EUROPE'
        )
        SELECT e.s_acctbal, e.s_name, e.n_name,
               p.p_partkey, p.p_name, c.supplycost
        FROM part p
        JOIN cost c ON c.l_partkey = p.p_partkey
        JOIN euro e ON e.s_suppkey = c.l_suppkey
        WHERE p.p_size = 15
          AND c.supplycost = (
              SELECT min(c2.supplycost)
              FROM cost c2
              JOIN euro e2 ON e2.s_suppkey = c2.l_suppkey
              WHERE c2.l_partkey = p.p_partkey
          )
        ORDER BY e.s_acctbal DESC, e.n_name ASC, e.s_name ASC,
                 p.p_partkey ASC
        LIMIT 100
    """,
    ops=("A1", "A5", "J1", "O2"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape, adapted: cheapest regional supplier per part —
    a correlated scalar MIN decorrelated into a per-part aggregate
    rejoined on equality (no partsupp table, so "supply cost" is
    the minimum observed sale price per part-supplier pair in
    lineitem).

    The per-part minimum is computed once over the already
    region-filtered cost side and broadcast back; membership is an
    equality on MIN of raw doubles — no arithmetic, so exact.

    Two manual pushdowns Catalyst cannot do itself (measured
    together: 1.39s → 1.18s min-of-4 at sf0.1 — modest locally
    where the scan is cheap, structural at a 100 TB fact table
    where the pre-aggregate semi-join is the difference between
    aggregating 2% and 100% of lineitem):
    - the p_size predicate is applied BELOW the cost aggregate as a
      broadcast semi-join of lineitem against the ~2% surviving
      part keys — per-part minima are independent across parts, so
      pre-filtering is semantics-preserving, and the fact-table
      aggregate shrinks ~50×;
    - ``euro_cost`` feeds two branches (the per-part min and the
      membership join), so it is localCheckpoint()ed once — the
      lazy form re-ran the lineitem aggregate per branch.
    """
    li = read_star_table(spark, "lineitem", sf_dir)
    s = read_star_table(spark, "supplier", sf_dir)
    n = read_star_table(spark, "nation", sf_dir)
    r = read_star_table(spark, "region", sf_dir).filter(
        F.col("r_name") == "EUROPE"
    )
    p = read_star_table(spark, "part", sf_dir).filter(
        F.col("p_size") == 15
    )
    euro = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pkeys = p.select(F.col("p_partkey").alias("__pk"))
    cost = (
        li.join(
            F.broadcast(pkeys),
            li.l_partkey == F.col("__pk"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("supplycost"))
    )
    euro_cost = cost.join(
        F.broadcast(euro), cost.l_suppkey == euro.s_suppkey
    ).localCheckpoint(eager=True)
    best = euro_cost.groupBy(
        F.col("l_partkey").alias("best_partkey")
    ).agg(F.min("supplycost").alias("min_cost"))
    return (
        euro_cost.join(
            F.broadcast(best),
            (F.col("l_partkey") == F.col("best_partkey"))
            & (F.col("supplycost") == F.col("min_cost")),
        )
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "supplycost",
        )
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(100)
    )


@register(
    "q11_important_parts",
    oracle=f"""
        WITH nat_li AS (
            SELECT l.l_partkey, l.l_extendedprice
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE n.n_name = 'NATION_7'
        )
        SELECT l_partkey AS p_partkey,
               {sql_dsum("l_extendedprice", "part_value")}
        FROM nat_li
        GROUP BY l_partkey
        HAVING part_value > CAST(0.001 AS DOUBLE) * (
            SELECT {sql_dsum("l_extendedprice", "total")}
            FROM nat_li
        )
    """,
    ops=("A1", "J1", "F2"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape, adapted: parts that concentrate a nation's
    trade value — per-group aggregate filtered against a scalar
    fraction of the global aggregate (no partsupp, so "value" is
    summed sale price through the nation's suppliers).

    One shuffled scan feeds both aggregates; the global total is a
    1-row broadcast cross join, so the threshold compare never
    leaves the executors. Both sums accumulate in decimal — the
    HAVING boundary is deterministic, which is what makes row
    membership (not just values) reproducible.
    """
    li = read_star_table(spark, "lineitem", sf_dir)
    s = read_star_table(spark, "supplier", sf_dir)
    n = read_star_table(spark, "nation", sf_dir).filter(
        F.col("n_name") == "NATION_7"
    )
    nat_li = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("l_partkey", "l_extendedprice")
    )
    total = nat_li.agg(dsum("l_extendedprice", "total"))
    return (
        nat_li.groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(dsum("l_extendedprice", "part_value"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > 0.001 * F.col("total"))
        .select("p_partkey", "part_value")
    )


@register(
    "q12_priority_by_linestatus",
    oracle="""
        SELECT l.l_linestatus,
               CAST(SUM(CASE WHEN o.o_orderpriority IN
                                  ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN
                                  ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS low_line_count
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l.l_linestatus
    """,
    ops=("A1", "J1", "F6"),
)
def q12_priority_by_linestatus(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q12 shape, adapted: order-priority mix per line status
    (no l_shipmode column, so l_linestatus is the grouping axis; no
    commit/receipt dates, so the year filter is on ship date).

    The canonical pivot-by-CASE: one pass, two conditional integer
    counts — exact arithmetic, no float concerns. The date filter
    pushes to the fact scan; the orders join shuffles on orderkey.
    """
    o = read_star_table(spark, "orders", sf_dir)
    li = read_star_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0))
            .cast("long")
            .alias("low_line_count"),
        )
    )


@register(
    "q13_order_count_distribution",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c.c_custkey,
                   count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON o.o_custkey = c.c_custkey
             AND o.o_orderpriority <> '5-LOW'
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
    """,
    ops=("A1", "J1"),
)
def q13_order_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 shape: the distribution of per-customer order
    counts — a filtered LEFT OUTER join under a double aggregation
    (the filter lives in the join condition, not a WHERE, so
    zero-order customers survive as count 0).

    count(o_orderkey) counts only matched rows — the outer-join
    null-extension does the NULL bookkeeping. The second aggregate
    groups ~thousands of distinct counts: a cheap second shuffle on
    an already-collapsed input.
    """
    c = read_star_table(spark, "customer", sf_dir)
    o = read_star_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   {sql_dsum("l_extendedprice * (1 - l_discount)",
                             "total_revenue")}
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s
        JOIN revenue r ON r.supplier_no = s.s_suppkey
        WHERE r.total_revenue = (
            SELECT max(total_revenue) FROM revenue
        )
    """,
    ops=("A1", "A5", "J1", "F2"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the quarter's top revenue supplier — the view-
    plus-scalar-max pattern. The revenue "view" feeds both the max
    and the membership filter, and Spark does NOT reuse the
    aggregation exchange between the two consumers (verified in
    the executed plan), so the lineitem scan+agg runs twice.
    Measured locally, re-scanning is cheaper than persist's cache
    churn (and a registry builder must not leak storage it can't
    unpersist); on a real 100 TB run the caller should persist the
    ~1-row-per-supplier view around the dual consumption and
    unpersist after the action.

    Max-equality on decimal-accumulated doubles is exact, and ties
    (if any) are all returned — same as the spec.
    """
    li = read_star_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    s = read_star_table(spark, "supplier", sf_dir)
    revenue = li.groupBy(
        F.col("l_suppkey").alias("supplier_no")
    ).agg(
        dsum_expr(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "total_revenue",
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(
            F.broadcast(s), F.col("supplier_no") == s.s_suppkey
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q20_excess_share_suppliers",
    oracle=f"""
        WITH yr AS (
            SELECT l_partkey, l_suppkey,
                   {sql_lsum("l_quantity", "qty")}
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_partkey, l_suppkey
        ), tot AS (
            SELECT l_partkey,
                   {sql_lsum("qty", "total")}
            FROM yr
            GROUP BY l_partkey
        )
        SELECT DISTINCT s.s_name, n.n_name
        FROM yr y
        JOIN tot t ON t.l_partkey = y.l_partkey
        JOIN part p ON p.p_partkey = y.l_partkey
        JOIN supplier s ON s.s_suppkey = y.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE 'small%'
          AND y.qty > CAST(0.5 AS DOUBLE) * t.total
    """,
    ops=("A1", "J1", "F5"),
)
def q20_excess_share_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20 shape, adapted: suppliers who dominate a part's
    annual volume — nested IN subqueries decorrelated into a
    two-level aggregate plus threshold join (no partsupp/availqty,
    so "excess" is >50% share of a part's shipped quantity).

    The per-pair aggregate feeds both the per-part total and the
    threshold join; Spark does not reuse the exchange between the
    two consumers, so the scan+agg runs twice. As with Q15, the
    local measurement says re-scan beats persist's cache churn and
    a registry builder must not leak un-unpersistable storage; a
    real 100 TB caller persists the per-pair aggregate around the
    dual consumption. Quantities are 2-decimal bounded, so the
    long fast path applies — the 0.5× threshold compares
    exactly-represented doubles. DISTINCT collapses multi-part
    qualifiers; name join is broadcast.
    """
    li = read_star_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    p = read_star_table(spark, "part", sf_dir).filter(
        F.col("p_name").like("small%")
    )
    s = read_star_table(spark, "supplier", sf_dir)
    n = read_star_table(spark, "nation", sf_dir)
    yr = li.groupBy("l_partkey", "l_suppkey").agg(
        lsum("l_quantity", "qty")
    )
    tot = yr.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        lsum("qty", "total")
    )
    return (
        yr.join(
            F.broadcast(tot), F.col("l_partkey") == F.col("t_partkey")
        )
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .filter(F.col("qty") > 0.5 * F.col("total"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_name", "n_name")
        .distinct()
    )
