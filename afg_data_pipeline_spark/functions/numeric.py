"""Deterministic numeric helpers for oracle-matched aggregates.

Floating-point SUM/AVG over a shuffled dataset is order-dependent,
so a Spark sum and a DuckDB sum of the same doubles can differ in the
last bits and fail an exact value-hash compare. The fix used across
all declared queries: aggregate in DECIMAL (exact, associative,
order-independent), then cast the finished aggregate back to DOUBLE.
Both engines then produce bit-identical results. Per-row arithmetic
(+,-,*,/ on doubles) is IEEE-exact and needs no treatment.

This also matters at scale: decimal aggregation makes results stable
under repartitioning, AQE re-planning, and retries — a 100 TB sum
that changes value when a stage is re-executed is a correctness bug
in any pipeline that diffs runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18,6: enough integer digits for sf0.1-scale sums of ~1e9 with
# 6-decimal inputs; Spark widens the sum to decimal(28,6) internally.
_DEC = "decimal(18,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM: sum(decimal) cast back to double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: decimal sum / count, divided in double.

    (sum cast to double) / count is one IEEE division of two
    deterministic values — bit-identical across engines, unlike a
    native double avg which accumulates in visitation order.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(_DEC)).cast("double")
        / F.count(c).cast("double")
    ).alias(alias)


def dsum_expr(expr: Column, alias: str) -> Column:
    """dsum over a computed per-row expression (itself IEEE-exact)."""
    return F.sum(expr.cast(_DEC)).cast("double").alias(alias)


# SQL-side twins for DuckDB oracle strings.
def sql_dsum(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"
        f" AS {alias}"
    )


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE) AS {alias}"
    )


def lsum(col: Column | str, alias: str, decimals: int = 2) -> Column:
    """Order-independent SUM for values with known fixed precision:
    scale to integers, sum longs (codegen fast path), unscale.

    TPC-H-style money/quantity columns carry <= `decimals` decimal
    places; round(x * 10^d) is exact for them (the float error of a
    d-decimal value times 10^d is ~1e-10, never near .5), so the
    long sum is exact and order-free like dsum but runs in
    whole-stage-codegen long arithmetic instead of JVM BigDecimal —
    ~7x faster per aggregate.

    Overflow bound: |Σ x·10^d| must stay under 2^63 ≈ 9.2e18 —
    fine for counts/quantities at any scale, borderline for money
    columns beyond ~10^10 rows × 10^7 scaled units. dsum (decimal,
    38 digits) is the unconditional scale-safe default; lsum is the
    opt-in fast path when the bound is provably satisfied.
    """
    c = F.col(col) if isinstance(col, str) else col
    scale = 10 ** decimals
    return (
        F.sum(F.round(c * scale, 0).cast("long")).cast("double")
        / F.lit(float(scale))
    ).alias(alias)


def sql_lsum(expr: str, alias: str, decimals: int = 2) -> str:
    scale = 10 ** decimals
    return (
        f"CAST(SUM(CAST(round(({expr}) * {scale}, 0) AS BIGINT))"
        f" AS DOUBLE) / {float(scale)} AS {alias}"
    )


def lavg(col: Column | str, alias: str, decimals: int = 2) -> Column:
    """Order-independent AVG on the lsum fast path: exact long sum
    of the scaled values, one double division by (count · scale).
    Same provable-bound contract as lsum."""
    c = F.col(col) if isinstance(col, str) else col
    scale = 10 ** decimals
    return (
        F.sum(F.round(c * scale, 0).cast("long")).cast("double")
        / (F.count(c).cast("double") * F.lit(float(scale)))
    ).alias(alias)


def sql_lavg(expr: str, alias: str, decimals: int = 2) -> str:
    scale = 10 ** decimals
    return (
        f"CAST(SUM(CAST(round(({expr}) * {scale}, 0) AS BIGINT))"
        f" AS DOUBLE) / (CAST(COUNT({expr}) AS DOUBLE)"
        f" * {float(scale)}) AS {alias}"
    )
