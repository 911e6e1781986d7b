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
