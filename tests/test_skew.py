"""Skew diagnostics: planted hot keys, exact share/ratio
arithmetic, join-size forecast identity (predicted == actual
executed join), decimal overflow headroom, and the top-k plan
shape (TakeOrderedAndProject, never a partitionless window)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from afg_data_pipeline_spark.operators.skew import (
    join_key_skew,
    key_skew_profile,
)


class TestKeySkewProfile:
    def test_planted_hot_key(self, spark):
        # key 'hot' has 6 of 10 rows over 3 keys
        rows = [("hot",)] * 6 + [("warm",)] * 3 + [("cold",)] * 1
        df = spark.createDataFrame(rows, "k string")
        got = key_skew_profile(df, "k", top_k=2).collect()
        assert [(r.key, r.cnt) for r in got] == [
            ("hot", 6),
            ("warm", 3),
        ]
        top = got[0]
        assert top.share == 0.6
        assert top.skew_ratio == 6 * 3 / 10
        assert (top.n_rows, top.n_keys) == (10, 3)

    def test_tie_break_by_key(self, spark):
        df = spark.createDataFrame(
            [("b",), ("a",), ("c",), ("a",), ("b",), ("c",)],
            "k string",
        )
        got = key_skew_profile(df, "k", top_k=3).collect()
        assert [r.key for r in got] == ["a", "b", "c"]

    def test_validation(self, spark):
        df = spark.createDataFrame([("a",)], "k string")
        with pytest.raises(ValueError, match="top_k"):
            key_skew_profile(df, "k", top_k=0)

    def test_topk_is_take_ordered(self, spark):
        from afg_data_pipeline_spark.plans import REGISTRY
        from tests.conftest import SF_DIR
        from tests.test_plan_shapes import plan_of

        df = REGISTRY["key_skew_profile"].fn(spark, SF_DIR)
        plan = plan_of(df)
        assert "TakeOrderedAndProject" in plan
        assert "Window" not in plan


class TestJoinKeySkew:
    def test_forecast_equals_executed_join(self, spark):
        left = spark.createDataFrame(
            [(i % 4, i) for i in range(20)], "k long, lv long"
        )
        right = spark.createDataFrame(
            [(i % 5, i) for i in range(15)], "k long, rv long"
        )
        got = join_key_skew(left, "k", right, "k", top_k=10).collect()
        actual = left.join(
            right.withColumnRenamed("k", "rk"),
            F.col("k") == F.col("rk"),
        ).count()
        assert got[0].predicted_rows == Decimal(actual)
        # per-key contributions sum to the total
        assert sum(r.joined_rows for r in got) == Decimal(actual)
        # share of the hottest key is exact
        assert got[0].contribution_share == float(
            got[0].joined_rows
        ) / float(actual)

    def test_decimal_headroom_beyond_bigint(self, spark):
        # counts whose product exceeds 2^63 must not overflow:
        # forecast from synthetic count tables via the same decimal
        # path (4e9 * 4e9 = 1.6e19 > 2^63 ~ 9.2e18)
        big = 4_000_000_000
        lc = spark.createDataFrame([(1, 1)], "k long, lv long")
        # build per-key counts directly by exploding is impractical;
        # instead verify the expression algebra on literals
        out = (
            lc.select(
                (
                    F.lit(big).cast("decimal(19,0)")
                    * F.lit(big).cast("decimal(19,0)")
                ).alias("joined_rows")
            )
            .agg(F.sum("joined_rows").alias("predicted_rows"))
            .collect()[0]
        )
        assert out.predicted_rows == Decimal(big) * Decimal(big)

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 1)], "k long, v long")
        with pytest.raises(ValueError, match="top_k"):
            join_key_skew(df, "k", df, "k", top_k=0)
