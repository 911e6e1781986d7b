"""Edge/error-path tests (SURVEY.md §5.4): empty inputs, all-null
groups, single-row groups — the degenerate shapes the reference's
runtime guards imply."""

from __future__ import annotations

from pyspark.sql import functions as F

from afg_data_pipeline_spark.operators.forecast import (
    ols_forecast_per_group,
)
from afg_data_pipeline_spark.operators.gravity import gravity_flows
from afg_data_pipeline_spark.operators.imputation import (
    interpolate_linear,
    knn_impute,
    seasonal_median_impute,
)
from afg_data_pipeline_spark.operators.joins import asof_join_backward


def _empty_series(spark):
    return spark.createDataFrame(
        [], schema="g string, i int, v double"
    )


class TestEmptyInputs:
    def test_interpolate_empty(self, spark):
        assert (
            interpolate_linear(
                _empty_series(spark), ["g"], "i", "v", "f"
            ).count()
            == 0
        )

    def test_seasonal_median_empty(self, spark):
        df = spark.createDataFrame(
            [], schema="g string, s int, c int, v double"
        )
        assert (
            seasonal_median_impute(df, ["g"], "s", "c", "v", "f").count()
            == 0
        )

    def test_knn_empty(self, spark):
        df = spark.createDataFrame(
            [], schema="slice long, x double, v double"
        )
        assert (
            knn_impute(df, "slice", ["x"], "v", out_col="f").count() == 0
        )

    def test_gravity_single_place_empty_flows(self, spark):
        # One place -> no off-diagonal pairs -> empty, not an error.
        attrs = spark.createDataFrame(
            [(0, 10, 10, 1.0, 2.0)],
            schema="key int, mass long, attraction long, "
            "lat double, lon double",
        )
        assert (
            gravity_flows(
                attrs, "key", "mass", "attraction", "lat", "lon"
            ).count()
            == 0
        )

    def test_asof_empty_right(self, spark):
        left = spark.createDataFrame(
            [("A", 1, 1.0)], schema="k string, t int, x double"
        )
        right = spark.createDataFrame(
            [], schema="k string, rt int, rv double"
        )
        out = asof_join_backward(
            left, right, "k", "t", "rt", ["rv"]
        ).collect()
        assert len(out) == 1 and out[0].asof_rv is None


class TestDegenerateGroups:
    def test_all_null_group_stays_null_after_interp(self, spark):
        # A group with zero donors cannot be filled (reference
        # would propagate NaN the same way).
        df = spark.createDataFrame(
            [("a", 0, None), ("a", 1, None), ("b", 0, 5.0)],
            schema="g string, i int, v double",
        )
        rows = {
            (r.g, r.i): r.f
            for r in interpolate_linear(df, ["g"], "i", "v", "f").collect()
        }
        assert rows[("a", 0)] is None and rows[("a", 1)] is None
        assert rows[("b", 0)] == 5.0

    def test_knn_all_missing_slice_unchanged(self, spark):
        df = spark.createDataFrame(
            [(1, 0.0, None), (1, 1.0, None)],
            schema="slice long, x double, v double",
        )
        rows = knn_impute(df, "slice", ["x"], "v", out_col="f").collect()
        assert all(r.f is None or r.f != r.f for r in rows)  # null/NaN

    def test_ols_single_observation(self, spark):
        df = spark.createDataFrame(
            [("a", 2020, 7.0)], schema="g string, x int, y double"
        )
        r = ols_forecast_per_group(df, ["g"], "x", "y", 2021).collect()[0]
        assert r.slope is None  # var_pop == 0 guard
        assert r.n_obs == 1
