"""Characterization + property tests for the reference-distinctive
operators (SURVEY.md §5.2-§5.4).

Each test re-implements the cited pandas reference logic on a small
reference-shaped fixture and asserts the Spark operator matches
within float tolerance. The imputation family additionally satisfies
the reference-implied properties: non-nulls untouched, no nulls
remain when every group has a donor, idempotence.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from afg_data_pipeline_spark.operators.forecast import (
    ols_forecast_per_group,
)
from afg_data_pipeline_spark.operators.gravity import gravity_flows
from afg_data_pipeline_spark.operators.imputation import (
    interpolate_linear,
    knn_impute,
    seasonal_median_impute,
)
from afg_data_pipeline_spark.operators.spatial import (
    nearest_neighbor_assign,
)

SERIES_SCHEMA = T.StructType(
    [
        T.StructField("comuna", T.StringType()),
        T.StructField("dia", T.IntegerType()),
        T.StructField("temp", T.DoubleType()),
    ]
)


def _series_fixture() -> pd.DataFrame:
    # Two comunas, 10 days, interior + edge holes — the shape of
    # the per-comuna daily temperature series
    # (temperaturas_rm.py:180-190).
    rows = []
    a = [None, 12.0, None, None, 18.0, 19.5, None, 16.0, None, None]
    b = [10.0, None, 11.0, 14.0, None, None, None, 21.0, 22.5, None]
    for i, v in enumerate(a):
        rows.append(("santiago", i, v))
    for i, v in enumerate(b):
        rows.append(("providencia", i, v))
    return pd.DataFrame(rows, columns=["comuna", "dia", "temp"])


class TestInterpolateLinear:
    """W1 vs pandas interpolate('linear') + ffill + bfill."""

    def test_matches_pandas_reference(self, spark):
        pdf = _series_fixture()
        sdf = spark.createDataFrame(pdf, schema=SERIES_SCHEMA)
        got = (
            interpolate_linear(sdf, ["comuna"], "dia", "temp", "filled")
            .orderBy("comuna", "dia")
            .toPandas()
        )
        # Reference logic, temperaturas_rm.py:185-187: per comuna,
        # sort by date, interpolate, ffill, bfill.
        expected = []
        for _, g in pdf.groupby("comuna", sort=True):
            s = g.sort_values("dia")["temp"]
            expected.append(s.interpolate(method="linear").ffill().bfill())
        exp = pd.concat(expected).to_numpy()
        assert np.allclose(got["filled"].to_numpy(), exp)

    def test_properties(self, spark):
        pdf = _series_fixture()
        sdf = spark.createDataFrame(pdf, schema=SERIES_SCHEMA)
        out = interpolate_linear(sdf, ["comuna"], "dia", "temp", "filled")
        rows = out.collect()
        # (a) non-null values untouched
        for r in rows:
            if r.temp is not None:
                assert r.filled == r.temp
        # (b) no nulls remain (every group has ≥1 non-null)
        assert all(r.filled is not None for r in rows)
        # (c) idempotent: re-running on the filled column changes
        # nothing
        again = interpolate_linear(
            out.select(
                "comuna", "dia", F.col("filled").alias("temp")
            ),
            ["comuna"],
            "dia",
            "temp",
            "filled",
        ).collect()
        assert {(r.comuna, r.dia, r.filled) for r in again} == {
            (r.comuna, r.dia, r.filled) for r in rows
        }


class TestSeasonalMedian:
    """W2 vs the reference's median-fallback chain
    (temperaturas_rm.py:192-222)."""

    def test_matches_pandas_reference(self, spark):
        pdf = _series_fixture()
        pdf["season"] = pdf["dia"] % 3  # dia_año analogue
        pdf["coarse"] = pdf["dia"] // 5  # month analogue
        schema = SERIES_SCHEMA.add("season", T.IntegerType()).add(
            "coarse", T.IntegerType()
        )
        sdf = spark.createDataFrame(pdf, schema=schema)
        got = (
            seasonal_median_impute(
                sdf, ["comuna"], "season", "coarse", "temp", "filled"
            )
            .orderBy("comuna", "dia")
            .toPandas()
        )
        exp = []
        for _, r in pdf.sort_values(["comuna", "dia"]).iterrows():
            if not math.isnan(r.temp):
                exp.append(r.temp)
                continue
            g = pdf[pdf.comuna == r.comuna]
            for cand in (
                g[g.season == r.season].temp.median(),
                g[g.coarse == r.coarse].temp.median(),
                g.temp.median(),
            ):
                if not math.isnan(cand):
                    exp.append(cand)
                    break
        assert np.allclose(got["filled"].to_numpy(), np.array(exp))


class TestKnnImpute:
    """W3 vs sklearn-KNNImputer semantics, hand-computed
    (temperaturas_rm.py:224-243: k=3, weights='distance')."""

    def test_weighted_average_of_3_nearest(self, spark):
        # One slice, 5 stations at 1-D positions; station at x=0
        # missing. Distances 1,2,3,4 -> donors x=1,2,3 with weights
        # 1, 1/2, 1/3.
        pdf = pd.DataFrame(
            {
                "fecha": [1] * 5,
                "x": [0.0, 1.0, 2.0, 3.0, 4.0],
                "temp": [None, 10.0, 20.0, 30.0, 40.0],
            }
        )
        schema = T.StructType(
            [
                T.StructField("fecha", T.IntegerType()),
                T.StructField("x", T.DoubleType()),
                T.StructField("temp", T.DoubleType()),
            ]
        )
        sdf = spark.createDataFrame(pdf, schema=schema)
        out = knn_impute(
            sdf, "fecha", ["x"], "temp", k=3, out_col="filled"
        ).collect()
        got = next(r.filled for r in out if r.x == 0.0)
        w = np.array([1.0, 0.5, 1.0 / 3.0])
        v = np.array([10.0, 20.0, 30.0])
        assert got == pytest.approx((w * v).sum() / w.sum())

    def test_zero_distance_donor_uniform(self, spark):
        pdf = pd.DataFrame(
            {
                "fecha": [1] * 3,
                "x": [0.0, 0.0, 5.0],
                "temp": [None, 42.0, 100.0],
            }
        )
        schema = T.StructType(
            [
                T.StructField("fecha", T.IntegerType()),
                T.StructField("x", T.DoubleType()),
                T.StructField("temp", T.DoubleType()),
            ]
        )
        sdf = spark.createDataFrame(pdf, schema=schema)
        out = knn_impute(
            sdf, "fecha", ["x"], "temp", k=3, out_col="filled"
        ).collect()
        # sklearn: exact-match donors -> uniform among them only.
        got = next(r.filled for r in out if r.temp is None)
        assert got == pytest.approx(42.0)

    def test_properties(self, spark):
        rng = np.random.default_rng(7)
        n = 60
        pdf = pd.DataFrame(
            {
                "fecha": np.repeat([1, 2, 3], n // 3),
                "x": rng.normal(size=n),
                "temp": np.where(
                    rng.random(n) < 0.3, np.nan, rng.normal(size=n)
                ),
            }
        )
        schema = T.StructType(
            [
                T.StructField("fecha", T.LongType()),
                T.StructField("x", T.DoubleType()),
                T.StructField("temp", T.DoubleType()),
            ]
        )
        sdf = spark.createDataFrame(pdf, schema=schema)
        rows = knn_impute(
            sdf, "fecha", ["x"], "temp", k=3, out_col="filled"
        ).collect()
        for r in rows:
            if r.temp is not None and not math.isnan(r.temp):
                assert r.filled == r.temp
        assert all(
            r.filled is not None and not math.isnan(r.filled)
            for r in rows
        )


class TestOlsForecast:
    """M1 vs numpy lstsq — identical closed form
    (matriz_movilidad.ipynb cell 13, nb:140-162)."""

    def test_matches_numpy(self, spark):
        pdf = pd.DataFrame(
            {
                "comuna": ["a"] * 5 + ["b"] * 4,
                "ano": [2018, 2019, 2020, 2021, 2022] + [2019, 2020, 2021, 2022],
                "trabajadores": [100.0, 120.0, 115.0, 140.0, 160.0]
                + [50.0, 48.0, 52.0, 47.0],
            }
        )
        schema = T.StructType(
            [
                T.StructField("comuna", T.StringType()),
                T.StructField("ano", T.IntegerType()),
                T.StructField("trabajadores", T.DoubleType()),
            ]
        )
        sdf = spark.createDataFrame(pdf, schema=schema)
        got = {
            r.comuna: r
            for r in ols_forecast_per_group(
                sdf, ["comuna"], "ano", "trabajadores", 2023
            ).collect()
        }
        for comuna, g in pdf.groupby("comuna"):
            slope, intercept = np.polyfit(
                g.ano.to_numpy(float), g.trabajadores.to_numpy(), 1
            )
            pred = max(0.0, intercept + slope * 2023)
            assert got[comuna].slope == pytest.approx(slope)
            assert got[comuna].forecast == pytest.approx(pred)

    def test_negative_forecast_clamped(self, spark):
        pdf = pd.DataFrame(
            {
                "comuna": ["c"] * 3,
                "ano": [2019, 2020, 2021],
                "trabajadores": [30.0, 15.0, 0.0],
            }
        )
        sdf = spark.createDataFrame(pdf)
        r = ols_forecast_per_group(
            sdf, ["comuna"], "ano", "trabajadores", 2025
        ).collect()[0]
        assert r.forecast == 0.0  # F9 clamp, nb:154

    def test_degenerate_single_year(self, spark):
        pdf = pd.DataFrame(
            {"comuna": ["d", "d"], "ano": [2020, 2020],
             "trabajadores": [5.0, 7.0]}
        )
        sdf = spark.createDataFrame(pdf)
        r = ols_forecast_per_group(
            sdf, ["comuna"], "ano", "trabajadores", 2021
        ).collect()[0]
        assert r.slope is None  # var_pop == 0 guard (SURVEY.md §5.4)


class TestGravity:
    """M2+M3 vs a pandas re-implementation of nb cell 29 + cells
    31-32 (computed row-share semantics, not softmax — F7 note)."""

    def test_matches_pandas_loop(self, spark):
        pdf = pd.DataFrame(
            {
                "key": [0, 1, 2, 3],
                "mass": [100, 200, 50, 75],
                "lat": [0.0, 1.0, 3.0, 6.0],
                "lon": [0.0, 2.0, 1.0, 5.0],
            }
        )
        pdf["attraction"] = pdf["mass"]
        sdf = spark.createDataFrame(pdf)
        got = gravity_flows(
            sdf, "key", "mass", "attraction", "lat", "lon",
            beta=2.0, k=1.0,
        ).toPandas()
        # Reference loop (nb:337-349): F[i][j] = P_i*A_j/D_ij^2,
        # diagonal zero; then row-share normalize (nb:369-374
        # computed semantics).
        n = len(pdf)
        fmat = np.zeros((n, n))
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                d = math.sqrt(
                    (pdf.lat[i] - pdf.lat[j]) ** 2
                    + (pdf.lon[i] - pdf.lon[j]) ** 2
                )
                fmat[i][j] = pdf.mass[i] * pdf.attraction[j] / d**2
        shares = fmat / fmat.sum(axis=1, keepdims=True)
        for _, r in got.iterrows():
            i, j = int(r.origin), int(r.dest)
            assert r.flow == pytest.approx(fmat[i][j])
            assert r.flow_share == pytest.approx(shares[i][j])
        # Row sums of shares are exactly 1 (cell 33 golden property).
        sums = got.groupby("origin").flow_share.sum()
        assert np.allclose(sums.to_numpy(), 1.0)


class TestNearestNeighbor:
    """J3 vs brute-force argmin (temperaturas_rm.py:121-130)."""

    def test_matches_bruteforce(self, spark):
        com = pd.DataFrame(
            {"comuna": ["a", "b", "c"], "clat": [0.0, 5.0, 9.0]}
        )
        est = pd.DataFrame(
            {"est": [10, 20, 30], "slat": [1.0, 6.0, 7.0]}
        )
        left = spark.createDataFrame(com)
        right = spark.createDataFrame(est)
        got = {
            r.comuna: r.nearest_est
            for r in nearest_neighbor_assign(
                left,
                right,
                "comuna",
                "est",
                F.abs(F.col("clat") - F.col("slat")),
            ).collect()
        }
        for _, c in com.iterrows():
            d = (est.slat - c.clat).abs()
            assert got[c.comuna] == est.est[d.idxmin()]
