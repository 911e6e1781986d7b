"""Frequent-itemset mining (market-basket pairs with a-priori
pruning) — the co-purchase / co-occurrence analytic.

Spark-first shape, one basket-keyed shuffle end to end: baskets
collapse to sorted distinct-item arrays (collect_set is partial-
aggregable, so within-basket duplicates die map-side), then the
ordered-pair expansion is a LAMBDA-FREE chain of codegen'd
generators — posexplode + explode(slice(items, i+2, …)) — because
the equivalent nested `transform` lambda is CodegenFallback and
runs interpreted per element (CLAUDE.md rule 18a; measured 1.46s
vs 0.29s for the same 12M pairs at sf1). The a-priori step (an
item infrequent alone cannot be in a frequent pair) prunes with
BROADCAST semi-joins inside the pipelined expansion stage — no
extra shuffle — and the pair count is map-side combinable. At
100 TB the frequent-item table is vocabulary-sized (items, not
baskets) and broadcasting it is exactly how a real a-priori pass
avoids shuffling the corpus twice.
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

    A-priori: items with support < min_support are pruned from the
    pair stream (sound — pair support <= either item support), on
    BOTH pair positions: the first-element semi-join cuts the
    expansion itself, the second cuts the aggregate's shuffle.
    Lift = pair_support · n_baskets / (support_a · support_b); all
    factors are exact BIGINTs (< 2^53, so the single double
    division is engine-portable), and n_baskets rides a 1-row
    broadcast cross join so the plan stays lazy — no eager scalar
    collect at construction time.

    The basket-array table feeds three branches (support,
    n_baskets, pair stream) and is checkpointed once (rule 12).
    Baskets with pathological width (one basket holding a large
    fraction of the catalog) would square inside one task; callers
    at crawl scale cap basket width upstream — same announced
    contract as the winnowing hot-fingerprint cap.
    """
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    arrays = (
        baskets.select(
            F.col(basket_col).alias("__basket"),
            F.col(item_col).alias("__item"),
        )
        .groupBy("__basket")
        .agg(F.array_sort(F.collect_set("__item")).alias("items"))
        .localCheckpoint(eager=False)
    )
    support = (
        arrays.select(F.explode("items").alias("__item"))
        .groupBy("__item")
        .agg(F.count(F.lit(1)).alias("__support"))
    )
    frequent = support.filter(F.col("__support") >= min_support)
    n_baskets = arrays.agg(
        F.count(F.lit(1)).alias("__n_baskets")
    )
    fa = frequent.select(F.col("__item").alias("part_a"))
    fb = frequent.select(F.col("__item").alias("part_b"))
    firsts = arrays.select(
        "items", F.posexplode("items").alias("__i", "part_a")
    ).join(F.broadcast(fa), "part_a", "left_semi")
    pair_stream = firsts.select(
        "part_a",
        F.explode(
            F.slice(
                F.col("items"), F.col("__i") + 2, F.size("items")
            )
        ).alias("part_b"),
    ).join(F.broadcast(fb), "part_b", "left_semi")
    pairs = (
        pair_stream.groupBy("part_a", "part_b")
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
