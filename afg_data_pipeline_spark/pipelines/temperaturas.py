"""E2: the temperature pipeline (PipelineTemperaturasRM).

Reference: temperaturas_rm.py:245-260 ejecutar_pipeline_completo —
three pasos, each short-circuiting the whole pipeline to None on
failure (SURVEY.md §3 E2):
  paso 1 (29-101):  API extract -> station catalog + daily series
  paso 2 (103-155): comuna centroids + 1-NN station assignment +
                    stamp join
  paso 3 (157-178): null audit + imputation dispatch (W1/W2/W3,
                    default knn, unknown method -> knn)

Here each paso is a function over DataFrames with the same
short-circuit contract; sources are injected (the REST fetcher via
sources/rest.py, comuna centroids as a DataFrame — the engine
consumes (Comuna, lat, lon) per SURVEY.md M5). Lazy plans make the
None checks cheap: only paso 1 (HTTP) and the final audit count
materialize anything.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from afg_data_pipeline_spark.operators.imputation import (
    reconstruct_series,
)
from afg_data_pipeline_spark.operators.spatial import (
    nearest_neighbor_assign,
)
from afg_data_pipeline_spark.sources import rest

log = logging.getLogger(__name__)


@dataclass
class TemperaturasConfig:
    anio_inicio: int = 2019
    anio_fin: int = 2026
    catalog_url: str = "https://example.invalid/estaciones"
    series_url: str = "https://example.invalid/{codigo}/{year}"
    region: int = 13


def paso_1_extraer_datos_api(
    spark: SparkSession, cfg: TemperaturasConfig, fetcher: rest.Fetcher
) -> DataFrame | None:
    """S6 catalog -> P3 region filter -> S7 fan-out -> join coords.

    None on catalog failure or empty harvest (reference 52-53,
    100-101)."""
    catalog = rest.fetch_station_catalog(spark, cfg.catalog_url, fetcher)
    if catalog is None:
        log.error("paso 1: station catalog unavailable")
        return None
    rm = catalog.filter(F.col("Region") == cfg.region)
    stations = [
        # collect-bound: station catalog is dimension-sized (REST dim)
        (r.Codigo_Estacion, r.Nombre_Estacion) for r in rm.collect()
    ]
    if not stations:
        log.error("paso 1: no stations in region %s", cfg.region)
        return None
    series = rest.fetch_daily_series(
        spark,
        cfg.series_url,
        stations,
        range(cfg.anio_inicio, cfg.anio_fin),
        fetcher,
    )
    if series is None:
        log.error("paso 1: no daily data harvested")
        return None
    return series.join(
        F.broadcast(
            rm.select("Codigo_Estacion", "Latitud", "Longitud", "Region")
        ),
        "Codigo_Estacion",
    )


def comunas_from_shapefile(
    spark: SparkSession,
    shp_path: str,
    region: int = 13,
) -> DataFrame | None:
    """S5/M5 in-engine: raw ``.shp`` → the (Comuna, lat_centroid,
    lon_centroid) DataFrame ``paso_2_asignar_comunas`` consumes.

    Reference: temperaturas_rm.py:106-119 — read_file, filter
    codregion == region, centroid in EPSG:32719, back to EPSG:4326.
    None on read failure, matching the reference's except branch
    (108-109). Driver-side by design: a comuna layer is a
    broadcast-sized dimension.
    """
    from afg_data_pipeline_spark.sources.shapefile import (
        shapefile_to_centroids,
    )

    try:
        rows = shapefile_to_centroids(
            shp_path,
            name_field="Comuna",
            filter_field="codregion",
            filter_value=region,
        )
    except (OSError, ValueError) as exc:
        log.error("comunas shapefile unreadable: %s", exc)
        return None
    return spark.createDataFrame(
        rows,
        "Comuna string, lat_centroid double, lon_centroid double",
    )


def paso_2_asignar_comunas(
    temperaturas: DataFrame, comunas: DataFrame
) -> tuple[DataFrame, DataFrame] | None:
    """J3 1-NN station-per-comuna + J2 stamp join.

    ``comunas``: (Comuna, lat_centroid, lon_centroid) — centroids
    precomputed at fixture-build time (SURVEY.md M5; the reference
    reprojects the shapefile at temperaturas_rm.py:114-119).
    Degree-distance × 111 -> km (F8, line 130). Returns
    (stamped series, asignaciones) like the reference (155).
    """
    if comunas.isEmpty():
        log.error("paso 2: empty comuna table")
        return None
    stations = (
        temperaturas.select(
            "Codigo_Estacion", "Latitud", "Longitud"
        ).dropDuplicates(["Codigo_Estacion"])  # P8, line 111
    )
    dist_deg = F.sqrt(
        F.pow(F.col("lat_centroid") - F.col("Latitud"), 2)
        + F.pow(F.col("lon_centroid") - F.col("Longitud"), 2)
    )
    asignaciones = nearest_neighbor_assign(
        comunas.select("Comuna", "lat_centroid", "lon_centroid"),
        stations,
        left_key="Comuna",
        right_key="Codigo_Estacion",
        distance=dist_deg,
    ).select(
        "Comuna",
        F.col("nearest_Codigo_Estacion").alias("Codigo_Estacion"),
        (F.col("nearest_distance") * 111).alias(
            "Distancia_Estacion_km"
        ),
    )
    # J2: the per-comuna filter loop (135-147) is one equi-join.
    stamped = temperaturas.join(
        F.broadcast(asignaciones), "Codigo_Estacion"
    )
    return stamped, asignaciones


def paso_3_reconstruir_series(
    df: DataFrame, metodo: str = "knn"
) -> DataFrame:
    """A4 null audit -> W1/W2/W3 dispatch (157-178).

    Early-return when nothing is missing (162-163); unknown method
    falls back to knn (171-172) — both faithful.
    """
    n_null = df.filter(F.col("Temperatura_Media").isNull()).count()
    if n_null == 0:
        log.info("paso 3: no missing values, skipping imputation")
        return df.withColumn(
            "value_filled", F.col("Temperatura_Media")
        )
    log.info("paso 3: imputing %d missing values via %s", n_null, metodo)
    with_idx = df.withColumn(
        "dia_idx", F.datediff(F.col("Fecha"), F.lit("1970-01-01"))
    ).withColumns(
        {
            "dia_ano": F.dayofyear("Fecha"),  # A2 season key (194)
            "mes": F.month("Fecha"),  # A3 fallback key (195)
        }
    )
    return reconstruct_series(
        with_idx,
        group_cols=["Comuna"],
        order_col="dia_idx" if metodo == "interpolacion" else "Fecha",
        value_col="Temperatura_Media",
        method=metodo,
        season_col="dia_ano",
        coarse_season_col="mes",
        feature_cols=["Latitud", "Longitud", "Distancia_Estacion_km"],
    )


def ejecutar_pipeline_completo(
    spark: SparkSession,
    cfg: TemperaturasConfig,
    fetcher: rest.Fetcher,
    comunas: DataFrame,
    metodo: str = "knn",
) -> DataFrame | None:
    """The E2 entry point with per-paso None short-circuit
    (temperaturas_rm.py:245-260)."""
    series = paso_1_extraer_datos_api(spark, cfg, fetcher)
    if series is None:
        return None
    stamped = paso_2_asignar_comunas(series, comunas)
    if stamped is None:
        return None
    return paso_3_reconstruir_series(stamped[0], metodo)
