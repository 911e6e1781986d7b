"""Tests for sources, sinks, and the E1/E2/E3 pipeline
orchestration — the reference's error semantics are the spec
(SURVEY.md §3, §5.4).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from afg_data_pipeline_spark import schemas
from afg_data_pipeline_spark.pipelines import mobility
from afg_data_pipeline_spark.pipelines.ingestion import (
    carga_atenciones_urgencia,
    run_ingestion,
)
from afg_data_pipeline_spark.pipelines.temperaturas import (
    TemperaturasConfig,
    ejecutar_pipeline_completo,
    paso_2_asignar_comunas,
    paso_3_reconstruir_series,
)
from afg_data_pipeline_spark.sinks.jdbc import save_tables
from afg_data_pipeline_spark.sources import rest

# ------------------------------------------------------- fixtures

CATALOG_OK = {
    "datosEstacion": [
        {
            "nombreEstacion": "Quinta Normal",
            "latitud": "-33.44",
            "longitud": "-70.68",
            "codigoNacional": 330020,
            "region": 13,
        },
        {
            "nombreEstacion": "Pudahuel",
            "latitud": "-33.39",
            "longitud": "-70.79",
            "codigoNacional": 330021,
            "region": 13,
        },
        {
            "nombreEstacion": "La Serena",
            "latitud": "-29.92",
            "longitud": "-71.20",
            "codigoNacional": 290004,
            "region": 4,
        },
    ]
}


def fake_fetcher(url: str) -> dict:
    """Hermetic S6/S7 server: catalog + per-station-year payloads
    with nulls (skip), a failing station-year (swallow), nested
    month->day->record shape (temperaturas_rm.py:75-85)."""
    if url.endswith("/estaciones"):
        return CATALOG_OK
    if "330021/2020" in url:
        raise ConnectionError("boom")  # per-request swallow path
    return {
        "datos": {
            "1": {
                "1": {"media": 20.5},
                "2": {"media": None},  # null reading -> skipped
                "3": {"media": 21.0},
            },
            "2": {"1": {"media": 18.0}},
        }
    }


@pytest.fixture()
def comunas(spark):
    rows = [
        (1, 101, 13, "Región Metropolitana de Santiago", "santiago",
         "Santiago", -33.45, -70.66),
        (2, 102, 13, "Región Metropolitana de Santiago", "pudahuel",
         "Santiago", -33.40, -70.80),
    ]
    return spark.createDataFrame(rows, schema=schemas.COMUNAS)


class TestRestSource:
    def test_catalog_projection_and_types(self, spark):
        df = rest.fetch_station_catalog(spark, "x/estaciones", fake_fetcher)
        rows = {r.Codigo_Estacion: r for r in df.collect()}
        assert rows["330020"].Latitud == pytest.approx(-33.44)
        assert df.schema == schemas.ESTACIONES

    def test_catalog_failure_returns_none(self, spark):
        def dead(url):
            raise TimeoutError

        assert rest.fetch_station_catalog(spark, "u", dead) is None

    def test_fan_out_skips_nulls_and_swallows_errors(self, spark):
        df = rest.fetch_daily_series(
            spark,
            "https://x/{codigo}/{year}",
            [("330020", "Quinta Normal"), ("330021", "Pudahuel")],
            [2020],
            fake_fetcher,
        )
        rows = df.collect()
        # 330021/2020 failed entirely; 330020 yields 3 non-null days.
        assert len(rows) == 3
        assert all(r.Codigo_Estacion == "330020" for r in rows)
        assert all(r.Temperatura_Media is not None for r in rows)
        # P12 date construction
        assert {str(r.Fecha) for r in rows} == {
            "2020-01-01", "2020-01-03", "2020-02-01",
        }

    def test_empty_harvest_returns_none(self, spark):
        def empty(url):
            return {"datos": {}}

        assert (
            rest.fetch_daily_series(
                spark, "u/{codigo}/{year}", [("1", "x")], [2020], empty
            )
            is None
        )

    def test_flatten_nested_map(self, spark):
        schema = T.StructType(
            [
                T.StructField("station", T.StringType()),
                T.StructField(
                    "datos",
                    T.MapType(
                        T.StringType(),
                        T.MapType(
                            T.StringType(),
                            T.StructType(
                                [T.StructField("media", T.DoubleType())]
                            ),
                        ),
                    ),
                ),
            ]
        )
        df = spark.createDataFrame(
            [
                (
                    "s1",
                    {
                        "1": {"1": {"media": 10.0}, "2": {"media": None}},
                        "2": {"5": {"media": 12.5}},
                    },
                )
            ],
            schema=schema,
        )
        out = rest.flatten_nested_map(df, "datos")
        got = {(r.mes, r.dia): r.media for r in out.collect()}
        assert got == {("1", "1"): 10.0, ("2", "5"): 12.5}

    def test_distributed_fan_out_matches_driver_loop(self, spark):
        stations = [("330020", "Quinta Normal"), ("330021", "Pudahuel")]

        # Self-contained closure: cloudpickle ships it by value to
        # executors (a module-level fetcher would be pickled by
        # reference to the unimportable test module).
        def fetcher(url: str) -> dict:
            if "330021/2020" in url:
                raise ConnectionError("boom")
            return {
                "datos": {
                    "1": {
                        "1": {"media": 20.5},
                        "2": {"media": None},
                        "3": {"media": 21.0},
                    },
                    "2": {"1": {"media": 18.0}},
                }
            }

        driver = rest.fetch_daily_series(
            spark, "u/{codigo}/{year}", stations, [2020], fetcher
        )
        dist = rest.fan_out_fetch_distributed(
            spark, "u/{codigo}/{year}", stations, [2020], fetcher
        )
        key = lambda r: (r.Codigo_Estacion, r.Anio, r.Mes, r.Dias)  # noqa: E731
        assert sorted(map(key, driver.collect())) == sorted(
            map(key, dist.collect())
        )


class TestCorruptRecordCapture:
    def test_malformed_lines_quarantined_not_dropped(
        self, spark, tmp_path
    ):
        from pyspark.sql import types as T

        from afg_data_pipeline_spark.io import (
            read_jsonl_with_corrupt_capture,
            split_quarantine,
        )

        p = tmp_path / "events.jsonl"
        p.write_text(
            '{"id": 1, "v": 10.0}\n'
            "this is not json\n"
            '{"id": 2, "v": 20.0}\n'
            '{"id": 3, "v": broken}\n'
        )
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("v", T.DoubleType()),
            ]
        )
        df = read_jsonl_with_corrupt_capture(spark, str(p), schema)
        good, bad = split_quarantine(df)
        assert {r["id"] for r in good.collect()} == {1, 2}
        quarantined = [r["_corrupt_record"] for r in bad.collect()]
        # Raw lines preserved verbatim for replay.
        assert "this is not json" in quarantined
        assert any("broken" in q for q in quarantined)
        assert good.count() + bad.count() == 4


class TestSinkSemantics:
    """ingestion.py:20-43 validation + no-rollback error contract."""

    def test_non_dict_aborts(self):
        assert save_tables([1, 2], writer=lambda df, n: None) is False

    def test_empty_dict_aborts(self):
        assert save_tables({}, writer=lambda df, n: None) is False

    def test_non_dataframe_value_aborts(self, spark):
        ok = spark.range(1)
        assert (
            save_tables(
                {"a": ok, "b": "not a df"}, writer=lambda df, n: None
            )
            is False
        )

    def test_write_failure_continues_without_rollback(self, spark):
        written = []

        def writer(df, name):
            if name == "b":
                raise OSError("db down")
            written.append(name)

        data = {"a": spark.range(1), "b": spark.range(1), "c": spark.range(1)}
        assert save_tables(data, writer=writer) is False
        # The reference's except block has no return (ingestion.py:
        # 37-38): 'a' stays written, 'c' still gets its attempt.
        assert written == ["a", "c"]

    def test_non_dataframe_aborts_mid_loop(self, spark):
        # Validation happens inside the write loop (ingestion.py:
        # 29-32): tables before the bad entry are already written.
        written = []
        data = {"a": spark.range(1), "b": "not a df", "c": spark.range(1)}
        assert (
            save_tables(data, writer=lambda df, n: written.append(n))
            is False
        )
        assert written == ["a"]

    def test_jdbc_url_from_env(self, monkeypatch):
        # S9: connection config from environment (ingestion.py:48-57).
        from afg_data_pipeline_spark.sinks.jdbc import jdbc_url_from_env

        monkeypatch.delenv("AFG_DB_HOST", raising=False)
        monkeypatch.delenv("AFG_DB_PORT", raising=False)
        monkeypatch.delenv("AFG_DB_NAME", raising=False)
        assert (
            jdbc_url_from_env() == "jdbc:postgresql://localhost:5432/postgres"
        )
        monkeypatch.setenv("AFG_DB_HOST", "db.example.invalid")
        monkeypatch.setenv("AFG_DB_PORT", "6432")
        monkeypatch.setenv("AFG_DB_NAME", "afg")
        assert (
            jdbc_url_from_env()
            == "jdbc:postgresql://db.example.invalid:6432/afg"
        )
        monkeypatch.setenv("OTHER_HOST", "h2")
        assert jdbc_url_from_env(prefix="OTHER_").startswith(
            "jdbc:postgresql://h2:"
        )

    def test_success(self, spark):
        written = []
        assert (
            save_tables(
                {"a": spark.range(1)},
                writer=lambda df, n: written.append(n),
            )
            is True
        )
        assert written == ["a"]


class TestTemperaturasPipeline:
    def test_end_to_end_with_imputation(self, spark, comunas):
        cfg = TemperaturasConfig(
            anio_inicio=2020,
            anio_fin=2021,
            catalog_url="x/estaciones",
            series_url="u/{codigo}/{year}",
        )
        out = ejecutar_pipeline_completo(
            spark, cfg, fake_fetcher, comunas, metodo="interpolacion"
        )
        rows = out.collect()
        assert rows, "pipeline produced no rows"
        # Every comuna got its nearest station stamped (J2/J3).
        assert {r.Comuna for r in rows} == {"santiago", "pudahuel"}
        assert all(r.Distancia_Estacion_km >= 0 for r in rows)
        assert all(r.value_filled is not None for r in rows)

    def test_catalog_failure_short_circuits(self, spark, comunas):
        def dead(url):
            raise TimeoutError

        cfg = TemperaturasConfig()
        assert (
            ejecutar_pipeline_completo(spark, cfg, dead, comunas)
            is None
        )

    def test_empty_comunas_short_circuits(self, spark):
        df = spark.createDataFrame(
            [("1", 1.0, 2.0, "n", "c", 1.0, 1.0, 13)],
            schema="Codigo_Estacion string, Latitud double, "
            "Longitud double, Nombre_Estacion string, Comuna string, "
            "lat double, lon double, Region int",
        )
        empty = df.filter(F.lit(False)).select(
            F.col("Comuna"),
            F.col("lat").alias("lat_centroid"),
            F.col("lon").alias("lon_centroid"),
        )
        assert paso_2_asignar_comunas(df, empty) is None

    def test_no_nulls_skips_imputation(self, spark):
        df = spark.createDataFrame(
            [("a", "2020-01-01", 10.0)],
            schema="Comuna string, Fecha string, Temperatura_Media double",
        ).withColumn("Fecha", F.to_date("Fecha"))
        out = paso_3_reconstruir_series(df, "interpolacion")
        assert out.collect()[0].value_filled == 10.0


class TestMobilityPipeline:
    """E3: the notebook chain on reference-shaped fixtures
    (FIXTURES.md §3-§6), golden-checked against a pandas
    re-implementation of the gravity step."""

    def _inputs(self, spark):
        edu = spark.createDataFrame(
            [
                ("SANTIAGO", 2020, 100, "parvulario"),
                ("Santiago ", 2020, 200, "escolar"),
                ("pudahuel", 2020, 50, "parvulario"),
                ("SANTIAGO", 2021, 120, "parvulario"),
                ("pudahuel", 2021, 60, "parvulario"),
            ],
            schema=schemas.EDUCACION,
        )
        lab = spark.createDataFrame(
            [
                ("Santiago", "1000", "1100"),
                ("Pudahuel", "500", "520"),
                (" Variable", "9", "9"),  # P6 junk row
            ],
            schema="`Unidad territorial` string, `2019 ` string, `2020` string",
        )
        pob = spark.createDataFrame(
            [
                ("Santiago", "5000", "5100", "5200"),
                ("Pudahuel", "2000", "2050", "2100"),
            ],
            schema="Comuna string, `2019` string, `2020` string, `2021` string",
        )
        return edu, lab, pob

    def test_full_chain(self, spark, comunas):
        edu, lab, pob = self._inputs(spark)
        educacion = mobility.clean_educacion(edu)
        laborales = mobility.melt_wide_years(
            lab, "Unidad territorial", "trabajadores"
        ).withColumn(
            "trabajadores", F.col("trabajadores").cast("long")
        )
        laborales = mobility.forecast_and_append(laborales, 2021)
        poblacion = mobility.melt_wide_years(
            pob, "Comuna", "poblacion"
        ).withColumn("poblacion", F.col("poblacion").cast("long"))
        ind = mobility.join_indicators(
            poblacion, laborales, educacion, min_year=2020
        )
        flows = mobility.mobility_matrix(ind, comunas, 2020)
        rows = flows.collect()
        assert len(rows) == 2  # 2 comunas -> 2 off-diagonal flows
        shares = {r.origin: r.flow_share for r in rows}
        # single-destination rows normalize to 1 (M3); the row sum
        # is decimal(18,6)-quantized for engine portability, so
        # equality holds to ~1e-9, not bit-exactly.
        assert all(s == pytest.approx(1.0) for s in shares.values())
        # golden spot-check of the gravity value (nb:349 formula)
        santiago = next(r for r in rows if r.origin == "santiago")
        d = math.sqrt((-33.45 + 33.40) ** 2 + (-70.66 + 70.80) ** 2)
        want = 5100 * (520 + 50) / d**2
        assert santiago.flow == pytest.approx(want)

    def test_junk_rows_filtered_and_headers_cleaned(self, spark):
        _, lab, _ = self._inputs(spark)
        out = mobility.melt_wide_years(
            lab, "Unidad territorial", "trabajadores"
        )
        comunas_set = {r.comuna for r in out.collect()}
        assert " variable" not in comunas_set
        years = {r.año for r in out.collect()}
        assert years == {2019, 2020}  # '2019 ' header trimmed

    def test_wide_matrix_edge_pivot(self, spark, comunas):
        flows = spark.createDataFrame(
            [("a", "b", 1.0, 2.0, 1.0), ("b", "a", 1.0, 3.0, 1.0)],
            schema="origin string, dest string, distance double, "
            "flow double, flow_share double",
        )
        wide = mobility.matrix_wide(flows).collect()
        assert len(wide) == 2 and len(wide[0].asDict()) == 3


class TestIngestionOrchestration:
    def test_flagship_loader_on_synthetic_parquet(self, spark, tmp_path):
        pdf = spark.createDataFrame(
            [
                ("13", "RM", "Santiago", "SS", "t", "alta", 2020, 1,
                 "Influenza (J09-J11)", 5, 1, 1, 1, 1, 1),
                ("05", "V", "Valpo", "SS", "t", "alta", 2020, 1,
                 "Influenza (J09-J11)", 2, 0, 1, 1, 0, 0),
                ("13", "RM", "Santiago", "SS", "t", "alta", 2018, 1,
                 "Influenza (J09-J11)", 9, 1, 1, 1, 3, 3),
                ("13", "RM", "Santiago", "SS", "t", "alta", 2021, 2,
                 "No respiratoria", 7, 1, 1, 1, 2, 2),
            ],
            schema=schemas.ATENCIONES_URGENCIAS,
        )
        pdf.write.parquet(str(tmp_path / "at_urg_respiratorio.parquet"))
        spark.range(1).write.parquet(str(tmp_path / "otros.parquet"))
        out = carga_atenciones_urgencia(spark, str(tmp_path))
        rows = out.collect()
        assert len(rows) == 1  # only RM + >=2019 + in diagnosis list
        assert "RegionCodigo" not in out.columns  # filter-only col
        assert len(out.columns) == 14

    def test_orchestration_drops_failed_loaders(self, spark):
        written = []
        ok = run_ingestion(
            spark,
            loaders={
                "good": lambda: spark.range(2),
                "none": lambda: None,  # E2-style short-circuit result
                "crash": lambda: 1 / 0,  # missing-module analogue
            },
            writer=lambda df, n: written.append(n),
        )
        assert ok is True
        assert written == ["good"]
