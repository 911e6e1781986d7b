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

from pyspark.sql import Column, DataFrame, Window
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


def weighted_reservoir_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k rows per stratum —
    Efraimidis–Spirakis A-ES: each row draws an exponential race
    key ``-ln(u) / w`` and the k smallest keys per stratum win;
    inclusion probability is proportional to ``weight_col`` (e.g.
    sample documents proportional to length when filling a token
    budget).

    Deterministic and engine-portable like the md5-threshold
    samplers above: u derives from the first 13 hex chars of
    md5(id) — 52 bits, so (h+1)/2^52 is an EXACT double in (0, 1]
    (no mantissa rounding), and ln/division are single IEEE ops
    that DuckDB reproduces bit-for-bit (Spark ``conv(hex,16,10)``
    ↔ DuckDB ``('0x' || hex)::BIGINT``). Ties (impossible short of
    an md5 collision) break on id.

    Scale shape: the race key is a pure projection; the top-k is a
    per-stratum row_number window — k is small by contract, and
    the window shuffles only (strata, key, id) plus carried
    columns.
    """
    h = F.conv(
        F.substring(
            F.md5(F.col(id_col).cast("string")), 1, 13
        ),
        16,
        10,
    ).cast("bigint")
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**52))
    key = -F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(strata_col).orderBy(
        F.col("__key").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__key", key)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__key", "__rn")
    )


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


def hash_split(
    df: DataFrame,
    id_col: str,
    train: float = 0.8,
    val: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: adds a ``split``
    column from md5(salt || ':' || id) against cumulative hex
    thresholds — the same engine-portable, retry-stable membership
    scheme as the samplers above (no RNG, no shuffle, a pure
    projection that pushes through any downstream plan). The salt
    decorrelates the split from every other md5-keyed decision
    (sampling, bucketing) made on the same ids.

    test gets the remaining 1 − train − val mass.
    """
    if not (0 < train < 1 and 0 <= val < 1 and train + val <= 1):
        raise ValueError(f"bad split fractions: {train}, {val}")
    digest = F.md5(
        F.concat(
            F.lit(f"{salt}:"), F.col(id_col).cast("string")
        )
    )
    return df.withColumn(
        "split",
        F.when(
            digest < F.lit(fraction_threshold(train)), "train"
        )
        .when(
            digest < F.lit(fraction_threshold(train + val)), "val"
        )
        .otherwise("test"),
    )


def hash_topk_per_group(
    df,
    group_col: str,
    id_col: str,
    k: int,
    salt: str = "ksample",
):
    """EXACTLY-k deterministic sample per group: rank each group's
    rows by md5(salt || id) and keep the k smallest — the
    fixed-size counterpart of the fraction-threshold samplers
    above (a fraction can't promise exact counts; audits, eval
    slices, and per-domain caps need exactly k). md5 order is
    uniform and independent of the id distribution, deterministic
    across engines/retries, and NEW rows entering a group displace
    old ones with probability k/n — the classic hash-reservoir
    property, with no reservoir state.

    Scale note: the rank is a per-group window — groups are the
    sampling unit and k bounds what survives, but the SORT is over
    each group's full membership. For groups beyond a task, the
    same two-pass trick as everywhere else applies (per-partition
    top-k then global top-k of k·P candidates); at the tested
    group sizes the window is the simpler exact form.
    """
    from pyspark.sql import Window

    from pyspark.sql import functions as F

    w = Window.partitionBy(group_col).orderBy(
        F.md5(
            F.concat(
                F.lit(f"{salt}:"), F.col(id_col).cast("string")
            )
        )
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
