"""M1: per-group OLS forecast, closed form — no sklearn, no UDF.

Reference: matriz_movilidad.ipynb cell 13 (nb:140-162) — for each
comuna, fit LinearRegression on (año -> trabajadores), predict the
next year, clamp at zero, emit one row. One feature means sklearn's
fit is exactly the classic closed form, so the Spark-native
expression is a single groupBy().agg() — identical math, fully
distributed, no Python in the hot path.

Determinism: all sums accumulate in DECIMAL (exact, order-free),
then the slope/intercept arithmetic runs in IEEE double with the
same expression shape the DuckDB oracle uses — bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(18,6)"


def ols_forecast_per_group(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    predict_x: int,
    clamp_zero: bool = True,
) -> DataFrame:
    """slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²); predict + clamp.

    Degenerate groups (single distinct x → zero variance) yield
    null slope/intercept/forecast via nullif — the guard SURVEY.md
    §5.4 calls for (reference crashes differently; we document).
    """
    x = F.col(x_col)
    y = F.col(y_col)
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum(x.cast("long")).cast("double")
    # Σx² on integral x is exact in long arithmetic.
    sxx = F.sum((x.cast("long") * x.cast("long"))).cast("double")
    # y enters as decimal so Σy and Σxy are exact and order-free;
    # decimal × integral x stays exact.
    sy = F.sum(y.cast(_DEC)).cast("double")
    sxy = F.sum(y.cast(_DEC) * x.cast("long")).cast("double")

    slope = (n * sxy - sx * sy) / F.nullif(
        n * sxx - sx * sx, F.lit(0.0)
    )
    intercept = (sy - slope * sx) / n
    pred: Column = intercept + slope * F.lit(float(predict_x))
    if clamp_zero:
        # F9 clamp: max(0, prediccion), nb:154.
        pred = F.greatest(F.lit(0.0), pred)
    return df.groupBy(*group_cols).agg(
        n.cast("long").alias("n_obs"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        pred.alias("forecast"),
    )


def ols_forecast_sql(
    table_expr: str,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    predict_x: int,
) -> str:
    """DuckDB twin with the identical expression tree."""
    g = ", ".join(group_cols)
    return f"""
        SELECT {g},
               CAST(cnt AS BIGINT) AS n_obs,
               slope,
               intercept,
               greatest(0.0, intercept + slope * {float(predict_x)})
                 AS forecast
        FROM (
            SELECT {g},
                   count(*) AS cnt,
                   (CAST(count(*) AS DOUBLE)
                      * CAST(SUM(CAST({y_col} AS DECIMAL(18,6))
                                 * CAST({x_col} AS BIGINT)) AS DOUBLE)
                    - CAST(SUM(CAST({x_col} AS BIGINT)) AS DOUBLE)
                      * CAST(SUM(CAST({y_col} AS DECIMAL(18,6)))
                             AS DOUBLE))
                   / nullif(
                       CAST(count(*) AS DOUBLE)
                         * CAST(SUM(CAST({x_col} AS BIGINT)
                                    * CAST({x_col} AS BIGINT))
                                AS DOUBLE)
                       - CAST(SUM(CAST({x_col} AS BIGINT)) AS DOUBLE)
                         * CAST(SUM(CAST({x_col} AS BIGINT))
                                AS DOUBLE),
                       0.0) AS slope,
                   (CAST(SUM(CAST({y_col} AS DECIMAL(18,6)))
                         AS DOUBLE)
                    - ((CAST(count(*) AS DOUBLE)
                          * CAST(SUM(CAST({y_col} AS DECIMAL(18,6))
                                     * CAST({x_col} AS BIGINT))
                                 AS DOUBLE)
                        - CAST(SUM(CAST({x_col} AS BIGINT)) AS DOUBLE)
                          * CAST(SUM(CAST({y_col} AS DECIMAL(18,6)))
                                 AS DOUBLE))
                       / nullif(
                           CAST(count(*) AS DOUBLE)
                             * CAST(SUM(CAST({x_col} AS BIGINT)
                                        * CAST({x_col} AS BIGINT))
                                    AS DOUBLE)
                           - CAST(SUM(CAST({x_col} AS BIGINT))
                                  AS DOUBLE)
                             * CAST(SUM(CAST({x_col} AS BIGINT))
                                    AS DOUBLE),
                           0.0))
                      * CAST(SUM(CAST({x_col} AS BIGINT)) AS DOUBLE))
                   / CAST(count(*) AS DOUBLE) AS intercept
            FROM {table_expr}
            GROUP BY {g}
        )
    """
