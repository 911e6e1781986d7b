"""Robust median/MAD outlier model (operators/robust.py) and the
per-class classifier eval report identities."""

from pyspark.sql import functions as F

from afg_data_pipeline_spark.operators.robust import (
    median2_from_counts,
    robust_outlier_model,
)


class TestMedian2:
    def _med2(self, spark, vals):
        df = spark.createDataFrame(
            [(v,) for v in vals], ["x"]
        ).withColumn("g", F.lit("a"))
        vc = df.groupBy("g", "x").agg(
            F.count(F.lit(1)).alias("c")
        )
        out = median2_from_counts(vc, ["g"], "x", "c")
        return out.collect()[0].med2

    def test_odd_count(self, spark):
        assert self._med2(spark, [1, 7, 3]) == 6  # med 3 -> 2x

    def test_even_count_interpolates(self, spark):
        assert self._med2(spark, [1, 2, 10, 20]) == 12  # (2+10)

    def test_duplicates(self, spark):
        assert self._med2(spark, [5, 5, 5, 1]) == 10  # (5+5)

    def test_single(self, spark):
        assert self._med2(spark, [9]) == 18


class TestRobustModel:
    def test_med_and_mad(self, spark):
        # vals: 1..7 plus outlier 100 -> per python:
        # sorted [1,2,3,4,5,6,7,100]; med = (4+5)/2 = 4.5
        # devs |x-4.5| = [3.5,2.5,1.5,.5,.5,1.5,2.5,95.5]
        # sorted devs: [.5,.5,1.5,1.5,2.5,2.5,3.5,95.5]
        # mad = (1.5+2.5)/2 = 2.0
        vals = [1, 2, 3, 4, 5, 6, 7, 100]
        df = spark.createDataFrame(
            [("a", v) for v in vals], ["g", "x"]
        )
        m = robust_outlier_model(df, ["g"], "x").collect()[0]
        assert m.med2 == 9  # 2 * 4.5
        assert m.mad4 == 8  # 4 * 2.0
        # flag: |x - 4.5| > 3*2 = 6 -> only 100 (dev 95.5)
        flagged = [
            v
            for v in vals
            if 2 * abs(2 * v - m.med2) > 3 * m.mad4
        ]
        assert flagged == [100]

    def test_groups_independent(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("a", 3), ("b", 100), ("b", 200)],
            ["g", "x"],
        )
        out = {
            r.g: (r.med2, r.mad4)
            for r in robust_outlier_model(
                df, ["g"], "x"
            ).collect()
        }
        assert out["a"] == (4, 4)  # med 2, mad 1
        assert out["b"] == (300, 200)  # med 150, mad 50


class TestEvalReportIdentities:
    def test_f1_single_division_identity(self):
        # f1 = 2tp/(n_pred + n_actual) == harmonic mean of P and R
        for tp, n_pred, n_actual in [
            (3, 5, 4),
            (0, 2, 3),
            (7, 7, 7),
        ]:
            p = tp / n_pred
            r = tp / n_actual
            classic = (
                2 * p * r / (p + r) if (p + r) > 0 else 0.0
            )
            single = 2 * tp / (n_pred + n_actual)
            assert abs(classic - single) < 1e-12


class TestTypeGuard:
    def test_double_value_column_rejected(self, spark):
        import pytest

        df = spark.createDataFrame(
            [("a", 1.5), ("a", 2.5)], ["g", "x"]
        )
        with pytest.raises(TypeError, match="integer value column"):
            robust_outlier_model(df, ["g"], "x")


class TestSeasonalAnomaly:
    def test_planted_spike_is_flagged(self, spark):
        from afg_data_pipeline_spark.plans import REGISTRY

        rows = REGISTRY["seasonal_anomaly_flags"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
        n = len(rows)
        flagged = sum(r.is_anomaly for r in rows)
        # structural invariants: full coverage, flags are a strict
        # minority (MAD gate at 3x), residual halves are exact
        assert n > 0 and 0 <= flagged < n / 2
        for r in rows[:50]:
            assert r.residual == round(r.residual * 2) / 2


class TestWinsorizedStats:
    def test_clipping_bounds_and_counts(self, spark):
        from afg_data_pipeline_spark.plans import REGISTRY

        rows = REGISTRY["winsorized_stats"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert rows
        for r in rows:
            assert r.p5_cents <= r.p95_cents
            # winsorized mean sits inside the clip bounds
            assert (
                r.p5_cents / 100.0
                <= r.mean_winsorized
                <= r.p95_cents / 100.0
            )
            # clipping at p5/p95 touches at most ~10% of rows
            # (plus ties); never the majority
            assert r.n_clipped < r.n / 2
