"""E1: the production orchestrator (ingestion.py:46-89).

Runs the loaders, assembles {table_name: DataFrame}, logs shapes,
and hands the dict to the sink with the reference's validation and
error semantics (sinks/jdbc.save_tables). The missing
carga_comunas_gnn module (SURVEY.md §0 known gap) is an injectable
loader slot: absent -> skipped with a log line, mirroring how the
snapshot cannot run it either.
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from afg_data_pipeline_spark.io import read_parquet_glob
from afg_data_pipeline_spark.sinks.jdbc import save_tables

log = logging.getLogger(__name__)

# The 7-element diagnosis IN-list, atenciones_urgencia.py:13-19.
DIAGNOSTICOS = [
    "Neumonía (J12-J18)",
    "Influenza (J09-J11)",
    "Bronquitis/bronquiolitis aguda (J20-J21)",
    "Crisis obstructiva bronquial (J40-J46)",
    "Otra causa respiratoria (J22, J30-J39, J47, J60-J98)",
    "Covid-19, Virus no identificado U07.2",
    "Covid-19, Virus identificado U07.1",
]

PROJECTED_COLS = [
    "RegionGlosa",
    "ComunaGlosa",
    "ServicioSaludGlosa",
    "TipoUrgencia",
    "NivelComplejidad",
    "Anio",
    "SemanaEstadistica",
    "Causa",
    "NumTotal",
    "NumMenor1Anio",
    "Num1a4Anios",
    "Num5a14Anios",
    "Num15a64Anios",
    "Num65oMas",
]


def carga_atenciones_urgencia(
    spark: SparkSession, datos_dir: str
) -> DataFrame:
    """The reference's flagship loader (atenciones_urgencia.py:7-28):
    S1 filename-glob parquet scan -> P2 conjunctive filter -> P1
    14-column projection. All three predicates and the column list
    push into the scan."""
    df = read_parquet_glob(spark, datos_dir, "urg")
    return df.filter(
        (F.col("RegionCodigo") == "13")
        & (F.col("Anio") >= 2019)
        & F.col("Causa").isin(DIAGNOSTICOS)
    ).select(*PROJECTED_COLS)


def run_ingestion(
    spark: SparkSession,
    loaders: dict[str, Callable[[], DataFrame | None]],
    writer: Callable[[DataFrame, str], None] | None = None,
) -> bool:
    """E1 orchestration (ingestion.py:59-89).

    Each loader returns a DataFrame or None; None results are
    dropped with a log line (the reference's pipeline-failure
    tolerance), shapes are logged (86-87), and the surviving dict
    goes through save_tables' validation + no-rollback semantics.
    """
    tables: dict[str, DataFrame] = {}
    for name, loader in loaders.items():
        try:
            df = loader()
        except Exception:  # noqa: BLE001
            log.exception("loader %s crashed; skipping", name)
            continue
        if df is None:
            log.warning("loader %s produced no data; skipping", name)
            continue
        tables[name] = df
    for name, df in tables.items():
        log.info("table %s: %d columns", name, len(df.columns))
    return save_tables(tables, writer)
