"""Robust per-group outlier detection: exact median / MAD flags
computed from VALUE-COMPRESSED counts, never a per-group sort.

Spark's exact `percentile` aggregate buffers every value of a
group in executor memory — at 100 TB a handful of language groups
would each hold billions of values. The scale-correct exact path
for integer-valued columns compresses to (group, value, count)
first (map-side combinable; bounded by the VALUE SPACE, constant
in corpus size), takes rank statistics over the compressed table,
and joins the tiny per-group model back to the corpus.

Exactness: the interpolated median of an integer column is a
half-integer — carried as ``med2 = v_lo + v_hi`` (exact BIGINT,
2× the median); absolute deviations are then ``dev2 = |2x − med2|``
(exact), their median as ``mad4`` (exact, 4× the MAD), and the
classic |x − med| > 3·MAD outlier test becomes the pure integer
comparison ``2·dev2 > 3·mad4``. The reported med/mad doubles are
exact (halves/quarters are representable), matching DuckDB's
quantile_cont bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def median2_from_counts(
    vc: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    cnt_col: str,
    out_col: str = "med2",
) -> DataFrame:
    """(group..., med2): twice the interpolated median, exact.

    ``vc`` is a (group, value, count) table. The cumulative-count
    window runs over DISTINCT values per group — bounded by the
    value space, not the corpus. med2 = value at rank
    floor((n+1)/2) plus value at rank floor(n/2)+1 (equal for odd
    n), the standard interpolated-median ranks.
    """
    from pyspark.sql import Window

    g = list(group_cols)
    totals = vc.groupBy(*g).agg(F.sum(cnt_col).alias("_n"))
    w = (
        Window.partitionBy(*g)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = vc.withColumn("_cum", F.sum(cnt_col).over(w)).join(
        F.broadcast(totals), g
    )
    lo = F.expr("(_n + 1) div 2")
    hi = F.expr("_n div 2 + 1")
    return cum.groupBy(*g).agg(
        (
            F.min(
                F.when(
                    F.col("_cum") >= lo, F.col(value_col)
                )
            )
            + F.min(
                F.when(
                    F.col("_cum") >= hi, F.col(value_col)
                )
            )
        ).alias(out_col)
    )


def robust_outlier_model(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """(group..., med2, mad4): the per-group robust-scale model.

    One corpus-sized map-side-combinable count; everything after
    runs on value-space-bounded tables. The compressed count table
    feeds both the median pass and the deviation pass, so it is
    localCheckpointed once (rule 12).

    Precondition: |value| < 2^62. med2 = v_lo + v_hi and the
    deviation 2·x − med2 double the value range, so a LongType
    input within a factor 2 of the 2^63 bound would
    ARITHMETIC_OVERFLOW under the driver's ANSI-on session. Every
    in-repo caller quantizes to cents/grid units first (≤ ~1e15);
    callers with genuinely 2^62-scale integers must pre-scale.
    """
    from pyspark.sql import types as T

    dt = df.schema[value_col].dataType
    if not isinstance(
        dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise TypeError(
            f"robust_outlier_model needs an integer value column "
            f"(|value| < 2^62: med2/dev2 double the range) "
            f"for exact med2/mad4 arithmetic; {value_col!r} is "
            f"{dt.simpleString()} — quantize to a grid first "
            "(CLAUDE.md rule 1b)"
        )
    g = list(group_cols)
    # Null values are EXCLUDED (SQL percentile semantics — and
    # necessarily: Spark windows sort nulls first, DuckDB last,
    # so a null reaching the cumulative ordering would shift
    # every rank between engines; see operators/quantiles.py).
    vc = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*g, value_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .localCheckpoint(eager=False)
    )
    med = median2_from_counts(vc, g, value_col, "_cnt")
    dev = (
        vc.join(F.broadcast(med), g)
        .select(
            *g,
            F.abs(
                2 * F.col(value_col) - F.col("med2")
            ).alias("_dev2"),
            "_cnt",
        )
        .groupBy(*g, "_dev2")
        .agg(F.sum("_cnt").alias("_cnt"))
    )
    mad = median2_from_counts(
        dev, g, "_dev2", "_cnt", out_col="mad4"
    )
    return med.join(mad, g)
