"""Frequent-itemset mining (market-basket pairs with a-priori
pruning) — the co-purchase / co-occurrence analytic.

Spark-first shape: baskets dedup to DISTINCT (basket, item) rows;
the a-priori step (an item infrequent alone cannot be in a frequent
pair) prunes the basket stream with a BROADCAST semi-join of the
frequent-item set BEFORE the pair expansion, so the quadratic step
only ever sees survivors; pair counting is a basket-keyed equi
self-join — many distinct basket keys, so it parallelizes without
salting (CLAUDE.md rule 13 boundary), with per-basket work bounded
by the pruned basket width squared. At 100 TB the frequent-item
table is vocabulary-sized (items, not baskets) and broadcasting it
is exactly how a real a-priori pass avoids shuffling the corpus
twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_item_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
) -> DataFrame:
    """Pairs of items co-occurring in >= min_support baskets, with
    per-item supports and lift.

    A-priori: an item with support < min_support is removed before
    the pair join (sound — pair support <= either item support).
    Lift = pair_support · n_baskets / (support_a · support_b); all
    factors are exact BIGINTs (< 2^53, so the single double
    division is engine-portable), and n_baskets rides a 1-row
    broadcast cross join so the plan stays lazy — no eager scalar
    collect at construction time.

    Baskets with pathological width (a basket holding a large
    fraction of the catalog) would square inside one task; callers
    at crawl scale cap basket width upstream — same announced
    contract as the winnowing hot-fingerprint cap.
    """
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    b = baskets.select(
        F.col(basket_col).alias("__basket"),
        F.col(item_col).alias("__item"),
    ).distinct()
    support = b.groupBy("__item").agg(
        F.count(F.lit(1)).alias("__support")
    )
    frequent = support.filter(F.col("__support") >= min_support)
    pruned = b.join(
        F.broadcast(frequent.select("__item")), "__item", "left_semi"
    )
    n_baskets = b.select("__basket").distinct().agg(
        F.count(F.lit(1)).alias("__n_baskets")
    )
    x = pruned.select(
        F.col("__basket"), F.col("__item").alias("part_a")
    )
    y = pruned.select(
        F.col("__basket").alias("__basket_y"),
        F.col("__item").alias("part_b"),
    )
    pairs = (
        x.join(
            y,
            (x.__basket == y.__basket_y)
            & (F.col("part_a") < F.col("part_b")),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("pair_support"))
        .filter(F.col("pair_support") >= min_support)
    )
    sa = frequent.select(
        F.col("__item").alias("part_a"),
        F.col("__support").alias("support_a"),
    )
    sb = frequent.select(
        F.col("__item").alias("part_b"),
        F.col("__support").alias("support_b"),
    )
    return (
        pairs.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "part_a",
            "part_b",
            "pair_support",
            "support_a",
            "support_b",
            (
                (F.col("pair_support") * F.col("__n_baskets"))
                .cast("double")
                / (F.col("support_a") * F.col("support_b"))
            ).alias("lift"),
        )
    )
