"""Data-quality checks (Deequ/dbt-test style): declarative
constraint verification that compiles to ordinary aggregates, so a
full audit of a 100 TB table is a handful of scan-aggregate jobs —
no row-by-row validation pass.

Each check builder returns a 1-row DataFrame
(check_name string, violations bigint); ``run_checks`` unions them
into a report. violations == 0 everywhere ⇒ the contract holds.
Checks are plain plans, so Catalyst fuses a table's checks into
shared scans where possible and every check is partial-aggregable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report(name: str, violations: Column, df: DataFrame) -> DataFrame:
    return df.agg(violations.cast("long").alias("violations")).select(
        F.lit(name).alias("check_name"), "violations"
    )


def not_null_check(df: DataFrame, col: str, name: str) -> DataFrame:
    """Violations = rows where ``col`` is null."""
    return _report(
        name, F.count(F.lit(1)) - F.count(F.col(col)), df
    )


def unique_key_check(
    df: DataFrame, cols: list[str], name: str
) -> DataFrame:
    """Violations = rows beyond the first per key (0 ⇒ key is
    unique). count - count_distinct is one pass; no self-join."""
    return _report(
        name,
        F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]),
        df,
    )


def accepted_values_check(
    df: DataFrame, col: str, values: list, name: str
) -> DataFrame:
    """Violations = rows whose ``col`` is outside ``values``
    (nulls count as violations — use not_null_check to separate)."""
    ok = F.col(col).isin(*values)
    return _report(
        name,
        F.sum(F.when(ok, 0).otherwise(1)),
        df,
    )


def foreign_key_check(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    name: str,
) -> DataFrame:
    """Violations = child rows whose key has no parent (orphans) —
    a left-anti join reduced to a count; the parent side carries
    only its key column into the join."""
    p = parent.select(F.col(parent_key).alias("__pk")).distinct()
    orphans = child.join(
        p, child[child_key] == F.col("__pk"), "left_anti"
    )
    return _report(name, F.count(F.lit(1)), orphans)


def run_checks(checks: list[DataFrame]) -> DataFrame:
    """Union the 1-row check reports into one audit result."""
    return reduce(lambda a, b: a.unionByName(b), checks)
