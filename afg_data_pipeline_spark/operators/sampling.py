"""Deterministic stratified sampling — the corpus-rebalancing
primitive (downsample over-represented languages/sources before
training) built so the SAME rows are kept on every engine, every
retry, every partitioning.

No RNG: membership is md5(id) compared against a per-stratum hex
threshold. md5 is uniform over ids, the comparison is plain string
ordering on lowercase hex (identical in Spark and DuckDB), and the
threshold encodes the fraction to 8 hex digits (quantization error
≤ 16⁻⁸). sample()/sampleBy() would be cheaper by a hair but their
membership depends on partition-level RNG streams — not
reproducible across engines or repartitions, which breaks both the
oracle and retry-stability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fraction_threshold(fraction: float) -> str:
    """32-char lowercase-hex threshold whose prefix encodes the
    keep fraction: md5(id) < threshold keeps ~fraction of ids."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction out of range: {fraction}")
    if fraction == 1.0:
        return "g" * 32  # > every hex digest
    return f"{int(fraction * 16**8):08x}" + "0" * 24


def hash_stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
) -> DataFrame:
    """Keep ~fractions[stratum] of each stratum's rows,
    deterministically by id hash. Strata not listed keep
    ``default_fraction``.

    One filter expression, no shuffle, no state — the sample is a
    pure projection predicate, so it pushes through joins and
    composes with any downstream plan.
    """
    digest = F.md5(F.col(id_col).cast("string"))
    expr: Column = F.lit(fraction_threshold(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        expr = F.when(
            F.col(strata_col) == stratum,
            F.lit(fraction_threshold(frac)),
        ).otherwise(expr)
    return df.filter(digest < expr)


def mixture_resample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
) -> DataFrame:
    """Downsample-only domain mixing: keep rows so the surviving
    corpus matches the target ``weights`` proportions as closely as
    downsampling allows. Weights are RELATIVE (they need not sum to
    1); strata absent from ``weights`` get ``default_weight``.

    K = min_s(n_s / w_s) is the largest total honoring the weights
    without upsampling any stratum; stratum s keeps rate_s =
    w_s * K / n_s of its rows by the same md5-threshold membership
    as hash_stratified_sample — deterministic, retry-stable, and
    engine-portable (the rate arithmetic is single IEEE ops on
    exact counts, so the threshold is bit-identical in SQL).

    Scale shape: one partial-aggregated count per stratum, a 1-row
    global min, and a broadcast join of #strata rate rows back —
    the sample itself stays a pure filter predicate.
    """
    counts = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_expr: Column = F.lit(float(default_weight))
    for stratum, w in sorted(weights.items()):
        w_expr = F.when(
            F.col(strata_col) == stratum, F.lit(float(w))
        ).otherwise(w_expr)
    rates = counts.select(
        strata_col,
        "__n",
        w_expr.alias("__w"),
    )
    k = rates.agg(
        F.min(
            F.col("__n").cast("double") / F.col("__w")
        ).alias("__k")
    )
    rates = rates.crossJoin(F.broadcast(k)).select(
        strata_col,
        (
            F.col("__w") * F.col("__k") / F.col("__n").cast("double")
        ).alias("__rate"),
    )
    thresh = F.when(
        F.col("__rate") >= 1.0, F.lit("g" * 32)
    ).otherwise(
        F.concat(
            F.lower(
                F.lpad(
                    F.hex(
                        F.floor(F.col("__rate") * F.lit(4294967296.0))
                        .cast("bigint")
                    ),
                    8,
                    "0",
                )
            ),
            F.lit("0" * 24),
        )
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(F.md5(F.col(id_col).cast("string")) < thresh)
        .drop("__rate")
    )
