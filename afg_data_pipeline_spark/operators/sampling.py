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
