"""Key-distribution and join-cardinality diagnostics — the
measurements behind every partitioning decision in this repo
(CLAUDE.md rule 13's salting threshold, AQE skew-join tuning,
shuffle-partition sizing).

Both diagnostics reduce the corpus to per-key counts FIRST (one
map-side-combinable aggregate — the only corpus-sized shuffle),
then do all analysis on the key-cardinality table. A join's output
size is computed WITHOUT running the join: |A ⋈_k B| = Σ_k
cntA(k)·cntB(k) — at 100 TB this one-aggregate forecast is the
difference between discovering a 10¹⁵-row join in planning and
discovering it in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_profile(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """Hottest keys with global distribution context: per-key
    count, share of all rows, and skew ratio (count / mean count —
    1.0 = perfectly uniform). Output: top_k rows ordered (count
    DESC, key ASC — deterministic tie-break, rule 7).

    The global (n_rows, n_keys) pair rides a 1-row broadcast cross
    join; the top-k is orderBy+limit (TakeOrderedAndProject:
    per-task partial top-k, never a partitionless window). share
    and skew_ratio are single correctly-rounded double divisions
    of exact BIGINTs — engine-portable.
    """
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    glob = counts.agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(glob))
        .select(
            "key",
            "cnt",
            (F.col("cnt").cast("double") / F.col("n_rows")).alias(
                "share"
            ),
            (
                (F.col("cnt") * F.col("n_keys")).cast("double")
                / F.col("n_rows")
            ).alias("skew_ratio"),
            "n_rows",
            "n_keys",
        )
        .orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(top_k)
    )


def join_key_skew(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    top_k: int = 5,
) -> DataFrame:
    """Equi-join cardinality forecast without executing the join:
    per key, the joined-row contribution cntL·cntR; globally,
    predicted_rows = Σ_k cntL(k)·cntR(k). Output: the top_k
    hottest join keys (contribution DESC, key ASC) with their
    share of the predicted output — the keys AQE will split, or
    that a rule-13 salt must spread.

    predicted_rows accumulates in DECIMAL(38,0): per-key products
    are bounded by |L|·|R| but the SUM of products has no provable
    2^63 bound at corpus scale (rule 11 — the driver's session
    runs ANSI-on and a silent wrap would be a hard failure).
    contribution_share divides the exact per-key product by the
    exact decimal total — one double division at the end.
    """
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    lc = left.groupBy(F.col(left_key).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt_left")
    )
    rc = right.groupBy(F.col(right_key).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt_right")
    )
    per_key = lc.join(rc, "key").select(
        "key",
        "cnt_left",
        "cnt_right",
        # decimal(19,0)·decimal(19,0) -> decimal(38,0): a single
        # hot key can exceed 2^63 joined rows at corpus scale, so
        # even the per-key product must not ride BIGINT (rule 11)
        (
            F.col("cnt_left").cast("decimal(19,0)")
            * F.col("cnt_right").cast("decimal(19,0)")
        ).alias("joined_rows"),
    )
    glob = per_key.agg(
        F.sum("joined_rows").alias("predicted_rows"),
        F.count(F.lit(1)).alias("n_join_keys"),
    )
    return (
        per_key.crossJoin(F.broadcast(glob))
        .select(
            "key",
            "cnt_left",
            "cnt_right",
            "joined_rows",
            (
                F.col("joined_rows").cast("double")
                / F.col("predicted_rows").cast("double")
            ).alias("contribution_share"),
            "predicted_rows",
            "n_join_keys",
        )
        .orderBy(F.col("joined_rows").desc(), F.col("key").asc())
        .limit(top_k)
    )
