"""REST-JSON sources (operators S6/S7).

Reference: temperaturas_rm.py:29-101 — paso_1_extraer_datos_api GETs
a station catalog (S6, lines 31-48), then fans out one request per
(station, year) (S7, lines 55-101), flattening the nested
datos[mes][dia].media payload into daily rows, skipping null
readings (line 74) and swallowing per-request errors (lines 87-88).
Catalog failure or an empty result short-circuits to None (52-53,
100-101).

Spark-first layout:
- The HTTP client is injected (`fetcher`) so tests run hermetically
  and prod wires `requests` (S9 env config stays outside).
- The catalog is a driver-side read -> createDataFrame with a
  declared schema (a station list is KB-scale by nature).
- The fan-out flattens each payload into (station, year, mes, dia,
  media) rows driver-side per request — requests are the bottleneck,
  not parsing — then ONE createDataFrame; at real fan-out scale the
  (station, year) pairs become a DataFrame and the fetch moves into
  mapInPandas so executors do the HTTP in parallel (fan_out_rdd
  below implements that path).
- The nested-map flatten also exists as a pure-Spark operator
  (flatten_nested_map: MapType -> explode ×2) for payloads that
  arrive as columns rather than via HTTP.
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from afg_data_pipeline_spark import schemas

log = logging.getLogger(__name__)

Fetcher = Callable[[str], dict]


def fetch_station_catalog(
    spark: SparkSession, url: str, fetcher: Fetcher
) -> DataFrame | None:
    """S6: station catalog -> 5-column DataFrame; None on failure.

    Mirrors temperaturas_rm.py:31-53: project the JSON list into
    (Nombre_Estacion, Latitud, Longitud, Codigo_Estacion, Region),
    casting coordinates to double (the reference patches string
    coords at line 121-122; we cast at the boundary instead).
    """
    try:
        payload = fetcher(url)
    except Exception:  # noqa: BLE001 — reference swallows (52-53)
        log.exception("station catalog fetch failed")
        return None
    rows = []
    for est in payload.get("datosEstacion", payload.get("datos", [])):
        try:
            rows.append(
                (
                    est["nombreEstacion"],
                    float(est["latitud"]),
                    float(est["longitud"]),
                    str(est["codigoNacional"]),
                    int(est["region"]),
                )
            )
        except (KeyError, TypeError, ValueError):
            continue
    if not rows:
        return None
    return spark.createDataFrame(rows, schema=schemas.ESTACIONES)


def fetch_daily_series(
    spark: SparkSession,
    url_template: str,
    stations: Iterable[tuple[str, str]],
    years: Iterable[int],
    fetcher: Fetcher,
) -> DataFrame | None:
    """S7: per-(station, year) fan-out -> daily temperature rows.

    Per-request failures are swallowed and logged (reference
    temperaturas_rm.py:87-88); null daily means are skipped (74);
    an entirely empty harvest returns None (100-101). Output rows:
    (Año, Mes, Dias, Fecha, Temperatura_Media, Nombre_Estacion,
    Codigo_Estacion).
    """
    schema = T.StructType(
        [
            T.StructField("Anio", T.IntegerType()),
            T.StructField("Mes", T.IntegerType()),
            T.StructField("Dias", T.IntegerType()),
            T.StructField("Temperatura_Media", T.DoubleType()),
            T.StructField("Nombre_Estacion", T.StringType()),
            T.StructField("Codigo_Estacion", T.StringType()),
        ]
    )
    rows: list[tuple] = []
    for codigo, nombre in stations:
        for year in years:
            try:
                payload = fetcher(
                    url_template.format(codigo=codigo, year=year)
                )
                datos = payload["datos"]
            except Exception:  # noqa: BLE001 — per-request swallow
                log.warning(
                    "fetch failed for station=%s year=%s", codigo, year
                )
                continue
            for mes, dias in datos.items():
                for dia, registro in dias.items():
                    media = (registro or {}).get("media")
                    if media is None:  # null skip, line 74
                        continue
                    rows.append(
                        (
                            int(year),
                            int(mes),
                            int(dia),
                            float(media),
                            nombre,
                            codigo,
                        )
                    )
    if not rows:
        return None
    df = spark.createDataFrame(rows, schema=schema)
    # P12: date construction from parts (temperaturas_rm.py:92-96).
    return df.withColumn(
        "Fecha", F.make_date("Anio", "Mes", "Dias")
    )


def flatten_nested_map(
    df: DataFrame,
    map_col: str,
    value_field: str = "media",
    outer_key: str = "mes",
    inner_key: str = "dia",
) -> DataFrame:
    """Pure-Spark S7 flatten: map<string, map<string, struct>> ->
    one row per (outer, inner), nulls dropped.

    explode ×2 + isNotNull — the distributed form of the
    reference's dict loops (temperaturas_rm.py:75-85) for payloads
    already ingested as columns.
    """
    outer = df.select(
        *[c for c in df.columns if c != map_col],
        F.explode(F.col(map_col)).alias(outer_key, "__inner"),
    )
    inner = outer.select(
        *[c for c in outer.columns if c != "__inner"],
        F.explode(F.col("__inner")).alias(inner_key, "__rec"),
    )
    return inner.select(
        *[c for c in inner.columns if c != "__rec"],
        F.col(f"__rec.{value_field}").alias(value_field),
    ).filter(F.col(value_field).isNotNull())


def fan_out_fetch_distributed(
    spark: SparkSession,
    url_template: str,
    stations: list[tuple[str, str]],
    years: list[int],
    fetcher: Fetcher,
) -> DataFrame:
    """The scale path for S7: the (station, year) pairs become a
    DataFrame and the HTTP happens inside mapInPandas on executors.

    At ~30×7 requests the driver loop is fine; at 10⁵ fan-out the
    driver serializes on I/O — this shape parallelizes it while
    keeping per-task request counts bounded by partitioning the
    pair list.
    """
    import pandas as pd

    pairs = spark.createDataFrame(
        [(c, n, y) for (c, n) in stations for y in years],
        schema="codigo string, nombre string, year int",
    ).repartition(spark.sparkContext.defaultParallelism)

    out_schema = (
        "Anio int, Mes int, Dias int, Temperatura_Media double, "
        "Nombre_Estacion string, Codigo_Estacion string"
    )

    def work(batches):
        for pdf in batches:
            out = []
            for codigo, nombre, year in pdf.itertuples(index=False):
                try:
                    payload = fetcher(
                        url_template.format(codigo=codigo, year=year)
                    )
                    datos = payload["datos"]
                except Exception:  # noqa: BLE001
                    continue
                for mes, dias in datos.items():
                    for dia, registro in dias.items():
                        media = (registro or {}).get("media")
                        if media is None:
                            continue
                        out.append(
                            (
                                int(year),
                                int(mes),
                                int(dia),
                                float(media),
                                nombre,
                                codigo,
                            )
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "Anio",
                    "Mes",
                    "Dias",
                    "Temperatura_Media",
                    "Nombre_Estacion",
                    "Codigo_Estacion",
                ],
            )

    flat = pairs.mapInPandas(work, schema=out_schema)
    return flat.withColumn(
        "Fecha", F.make_date("Anio", "Mes", "Dias")
    )
