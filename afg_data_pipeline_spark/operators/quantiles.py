"""Exact per-group discrete percentiles at scale, and the adaptive
quality filter built on them.

percentile_disc(q) = the smallest group value whose cumulative count
reaches ceil(q · n). The naive form — rank every row with a window
partitioned by group — sorts each group in ONE task (a language
group of a 100 TB corpus through a single sort). Here the heavy pass
is a map-side-combinable ``groupBy(group, value).count()``: the
shuffle carries one row per DISTINCT (group, value) — for discrete
quality metrics (char lengths, token counts, scores on a grid) that
is thousands of rows per group regardless of corpus size — and the
cumulative window then runs over that tiny frame. Same two-pass
idea as the sharded prefix sum (operators/prefixsum.py), but here
the value domain itself is the compression.

All-integer selection (counts, ceil on integers), so results are
bit-identical across engines — unlike interpolating percentiles,
which need the agg_median double conventions.
"""

from __future__ import annotations

from collections.abc import Sequence
from fractions import Fraction

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _rank_expr(q: float):
    """ceil(q·n) as an exact-integer Column over a column ``n``.

    q's decimal literal as an exact rational num/den gives
    ceil(q·n) = (n·num + den - 1) div den — no double rounding
    anywhere near a rank boundary. DECIMAL(38,0) accumulation:
    n·num can exceed 2^63 for large groups × 6-digit numerators,
    and a bare BIGINT product wraps ANSI-off / hard-fails ANSI-on
    (CLAUDE.md rule 11); `div` on decimals returns BIGINT.
    """
    if not 0.0 < q < 1.0:
        raise ValueError(f"q must be in (0,1), got {q}")
    frac = Fraction(repr(q))
    if frac.denominator > 10**6:
        # A float with no short decimal literal (e.g. 1/3 passed
        # as 0.3333333333333333): keep the rank within 1e-6 of the
        # requested quantile rather than carrying a 16-digit
        # numerator into the rank product.
        frac = frac.limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator
    return F.expr(
        f"(cast(n as decimal(38,0)) * {num} + {den - 1})"
        f" div {den}"
    )


def _q_colname(q: float) -> str:
    """Column name for quantile q: p10 for 0.1, p12_5 for 0.125 —
    non-integral percents get a distinct name instead of silently
    colliding on the rounded percent (q=0.125 and q=0.13 used to
    both produce ``p13``)."""
    pct = q * 100
    if abs(pct - round(pct)) < 1e-9:
        return f"p{round(pct)}"
    return "p" + ("%g" % pct).replace(".", "_")


def grouped_percentile_disc(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: Sequence[float],
) -> DataFrame:
    """One row per group: (group, n, p_<q> for each q in qs).

    p_q is percentile_disc: the smallest value v in the group with
    |{rows <= v}| >= ceil(q·n). qs entries are strictly between 0
    and 1; column names use the percent (q=0.1 → ``p10``, q=0.125
    → ``p12_5``). The rank ceil(q·n) is computed from the EXACT
    rational of q's decimal literal (Fraction("0.125") = 1/8), not
    a rounded integer percent — q=0.125 really selects
    ceil(n/8), never ceil(0.13·n).
    """
    for q in qs:
        if not 0.0 < q < 1.0:
            raise ValueError(f"q must be in (0,1), got {q}")
    names = [_q_colname(q) for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(
            f"qs map to duplicate column names {names}; pass "
            "distinct quantiles"
        )
    # Null values are EXCLUDED, matching SQL percentile semantics —
    # and necessarily so: Spark windows sort nulls FIRST while
    # DuckDB sorts them LAST, so a null reaching the cumulative
    # ordering would silently shift every rank between engines.
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("g"),
            F.col(value_col).alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("g")
    cum = counts.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(wn)
    )
    aggs = [F.max("n").alias("n")]
    for q, name in zip(qs, names):
        aggs.append(
            F.min(
                F.when(F.col("cum") >= _rank_expr(q), F.col("v"))
            ).alias(name)
        )
    return (
        cum.groupBy("g")
        .agg(*aggs)
        .select(F.col("g").alias(group_col), "n", *names)
    )


def adaptive_band_filter(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_q: float = 0.1,
    hi_q: float = 0.9,
) -> DataFrame:
    """Per-group adaptive band audit: compute [p_lo, p_hi] per group
    and report how many rows survive the cut — the per-language
    length/quality gate of corpus prep (fixed global thresholds
    misfire across languages; adaptive ones track each group's own
    distribution).

    Output: (group, n_docs, lo, hi, n_kept).

    SINGLE corpus scan, ZERO joins: n_kept is derived from the same
    compressed (group, value, count) table the percentiles come
    from — the kept-row count is Σ count over values inside the
    band — so the corpus is never re-scanned. (The previous form
    broadcast the band table back onto the raw corpus: a second
    full scan whose only product was a count the compressed table
    already determines. At 100 TB that's the difference between one
    pass and two.) The band bounds ride along as window columns
    over the g-partitioned compressed frame, so the final
    per-group aggregate needs no extra exchange: one corpus
    shuffle to (g, v), one compressed shuffle to g, done.
    """
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("g"),
            F.col(value_col).alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wn = Window.partitionBy("g")
    w = (
        wn.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    banded = (
        counts.withColumn("cum", F.sum("c").over(w))
        .withColumn("n", F.sum("c").over(wn))
        .withColumn(
            "lo",
            F.min(
                F.when(F.col("cum") >= _rank_expr(lo_q), F.col("v"))
            ).over(wn),
        )
        .withColumn(
            "hi",
            F.min(
                F.when(F.col("cum") >= _rank_expr(hi_q), F.col("v"))
            ).over(wn),
        )
    )
    return banded.groupBy("g").agg(
        F.max("n").alias("n_docs"),
        F.max("lo").alias("lo"),
        F.max("hi").alias("hi"),
        F.sum(
            F.when(
                (F.col("v") >= F.col("lo"))
                & (F.col("v") <= F.col("hi")),
                F.col("c"),
            ).otherwise(F.lit(0))
        ).alias("n_kept"),
    ).select(
        F.col("g").alias(group_col), "n_docs", "lo", "hi", "n_kept"
    )
