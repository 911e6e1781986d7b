"""E3: the mobility-matrix pipeline (matriz_movilidad.ipynb,
cells 2-33 — SURVEY.md §3 E3).

The notebook's eager cell chain becomes one lazy composition:
  educacion CSVs -> union + normalize + groupby-sum   (cells 4-6)
  laborales wide -> melt + junk filter + clean        (cells 8-11)
  per-comuna OLS forecast of the next year + append   (cells 13-14)
  poblacion wide -> melt + filter                     (cells 16-18)
  left joins on (comuna, año) + year filter           (cells 20-22)
  attraction mass + gravity + row-share normalize     (cells 28-32)

Inputs are reference-shaped DataFrames (FIXTURES.md §3-§6); the
Excel/shapefile reads happen at the edge (io.read_excel_driver_side
/ precomputed centroids) exactly as SURVEY.md S3-S5 prescribe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from afg_data_pipeline_spark.operators.forecast import (
    ols_forecast_per_group,
)
from afg_data_pipeline_spark.operators.gravity import gravity_flows


def clean_educacion(*tablas: DataFrame) -> DataFrame:
    """Cells 4-6 (nb:50-73): U1 union, F1-F3 normalize, P9 rename,
    A1 groupby-sum over the three enrollment levels."""
    unioned = tablas[0]
    for t in tablas[1:]:
        unioned = unioned.unionByName(t)
    return (
        unioned.withColumn(
            "comuna", F.lower(F.trim(F.initcap(F.col("comuna"))))
        )
        .withColumnRenamed("ano", "año")
        .groupBy("comuna", "año")
        .agg(F.sum("matriculas").alias("matriculas"))
    )


def melt_wide_years(
    df: DataFrame,
    id_col: str,
    value_name: str,
    junk_values: tuple[str, ...] = (" Variable",),
) -> DataFrame:
    """Cells 9-11 / 17-18 (nb:101-122, 200): U4 melt of a wide
    year-column table + P6 junk-row filter + F2/P11 header
    whitespace-to-int cleanup."""
    year_cols = [c for c in df.columns if c != id_col]
    melted = df.unpivot(
        ids=[id_col],
        values=year_cols,
        variableColumnName="año_raw",
        valueColumnName=value_name,
    )
    return (
        melted.filter(~F.col("año_raw").isin(*junk_values))
        .withColumn("año", F.trim(F.col("año_raw")).cast("int"))
        .filter(F.col("año").isNotNull())
        .select(
            F.lower(F.trim(F.col(id_col))).alias("comuna"),
            "año",
            value_name,
        )
    )


def forecast_and_append(
    laborales: DataFrame, predict_year: int
) -> DataFrame:
    """Cells 13-14 (nb:140-172): M1 per-comuna OLS forecast of the
    next year, clamped at zero, appended to the observed rows."""
    forecast = ols_forecast_per_group(
        laborales,
        ["comuna"],
        "año",
        "trabajadores",
        predict_x=predict_year,
    ).select(
        "comuna",
        F.lit(predict_year).alias("año"),  # P14 constant stamp
        F.col("forecast").alias("trabajadores"),
    )
    return laborales.select("comuna", "año", "trabajadores").unionByName(
        forecast
    )


def join_indicators(
    poblacion: DataFrame,
    laborales: DataFrame,
    educacion: DataFrame,
    min_year: int = 2020,
) -> DataFrame:
    """Cells 20-22 (nb:228-247): J1 composite-key left joins +
    P5 year range filter. Dimension tables broadcast."""
    return (
        poblacion.join(
            F.broadcast(laborales), ["comuna", "año"], "left"
        )
        .join(F.broadcast(educacion), ["comuna", "año"], "left")
        .filter(F.col("año") >= min_year)
    )


def mobility_matrix(
    indicadores: DataFrame, comunas: DataFrame, year: int
) -> DataFrame:
    """Cells 28-32 (nb:303-390): P10 attraction mass, M5 centroid
    attach, J4/J5/M2 gravity per year, M3 row-share normalize.

    Output long-form (origin, dest, distance, flow, flow_share);
    pivot to the 34×34 matrix only at the display edge (U5)."""
    attrs = (
        indicadores.filter(F.col("año") == year)
        .join(
            F.broadcast(
                comunas.select(
                    F.lower(F.trim(F.col("Comuna"))).alias("comuna"),
                    "lat_centroid",
                    "lon_centroid",
                )
            ),
            "comuna",
        )
        .select(
            "comuna",
            F.col("poblacion").alias("mass"),
            # P10: attraction = trabajadores + matriculas (nb:303);
            # null propagates like pandas NaN (SURVEY.md P10).
            (F.col("trabajadores") + F.col("matriculas")).alias(
                "attraction"
            ),
            "lat_centroid",
            "lon_centroid",
        )
    )
    return gravity_flows(
        attrs,
        key_col="comuna",
        mass_col="mass",
        attraction_col="attraction",
        lat_col="lat_centroid",
        lon_col="lon_centroid",
        beta=2.0,
        k=1.0,
    )


def matrix_wide(flows: DataFrame) -> DataFrame:
    """U5 edge pivot: long flows -> origin×dest share matrix
    (nb:351 / cell 33 display form)."""
    return (
        flows.groupBy("origin")
        .pivot("dest")
        .agg(F.first("flow_share"))
        .orderBy("origin")
    )
