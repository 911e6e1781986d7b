"""Unit tests for the join operators (as-of semantics, salting
invariance) and a hypothesis property sweep for the interpolation
family (SURVEY.md §5.3)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from afg_data_pipeline_spark.operators.imputation import (
    interpolate_linear,
)
from afg_data_pipeline_spark.operators.joins import (
    asof_join_backward,
    salted_join,
)
from afg_data_pipeline_spark.operators.spatial import (
    nearest_neighbor_1d,
    nearest_neighbor_1d_bucketed,
)


class TestBucketedNearestNeighbor:
    """The range-bucketed 1-NN must be indistinguishable from the
    global-sort variant — bucketing is an execution detail."""

    def _sides(self, spark, rights):
        left = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate([3, -50, 0, 7.5, 99, 42])],
            "lid long, lpos double",
        )
        right = spark.createDataFrame(
            [(100 + i, float(v), f"r{i}") for i, v in enumerate(rights)],
            "rid long, rpos double, tag string",
        )
        return left, right

    def _run(self, fn, left, right, **kw):
        rows = fn(
            left,
            right,
            left_key="lid",
            right_key="rid",
            left_pos="lpos",
            right_pos="rpos",
            carry=["tag"],
            **kw,
        ).collect()
        return sorted(tuple(r) for r in rows)

    @pytest.mark.parametrize("n_buckets", [1, 3, 64])
    def test_matches_global_sort_variant(self, spark, n_buckets):
        left, right = self._sides(spark, [-10, 2, 5, 40, 41, 80])
        base = self._run(nearest_neighbor_1d, left, right)
        bucketed = self._run(
            nearest_neighbor_1d_bucketed,
            left,
            right,
            n_buckets=n_buckets,
        )
        assert bucketed == base

    def test_single_right_row(self, spark):
        # Degenerate width (rmin == rmax): everything lands in
        # bucket 0 and every left row gets the only candidate.
        left, right = self._sides(spark, [5])
        bucketed = self._run(
            nearest_neighbor_1d_bucketed, left, right, n_buckets=8
        )
        base = self._run(nearest_neighbor_1d, left, right)
        assert bucketed == base
        assert all(r[1] == 100 for r in bucketed)

    def test_left_outside_right_range(self, spark):
        # Left positions clamp into the edge buckets; the boundary
        # candidates cover them.
        left = spark.createDataFrame(
            [(1, -1000.0), (2, 1000.0)], "lid long, lpos double"
        )
        right = spark.createDataFrame(
            [(100, 0.0, "a"), (101, 1.0, "b")],
            "rid long, rpos double, tag string",
        )
        rows = {
            r["lid"]: r["nearest_rid"]
            for r in nearest_neighbor_1d_bucketed(
                left,
                right,
                left_key="lid",
                right_key="rid",
                left_pos="lpos",
                right_pos="rpos",
                n_buckets=16,
            ).collect()
        }
        assert rows == {1: 100, 2: 101}


class TestGrid2dNearestNeighbor:
    """The cell-gridded 2-D 1-NN must equal the crossJoin+min_by
    formulation exactly — the grid is an execution detail, and the
    resolution rule (candidate distance <= cell width) guarantees
    exactness by construction."""

    def _run_grid(self, left, right, **kw):
        from afg_data_pipeline_spark.operators.spatial import (
            nearest_neighbor_grid2d,
        )

        rows = nearest_neighbor_grid2d(
            left,
            right,
            left_key="lid",
            right_key="rid",
            left_x="lx",
            left_y="ly",
            right_x="rx",
            right_y="ry",
            carry=["tag"],
            **kw,
        ).collect()
        return sorted(tuple(r) for r in rows)

    def _oracle(self, left, right):
        from afg_data_pipeline_spark.operators.spatial import (
            nearest_neighbor_assign,
        )

        d = F.sqrt(
            (F.col("lx") - F.col("rx")) * (F.col("lx") - F.col("rx"))
            + (F.col("ly") - F.col("ry")) * (F.col("ly") - F.col("ry"))
        )
        rows = nearest_neighbor_assign(
            left.select("lid", "lx", "ly"),
            right,
            left_key="lid",
            right_key="rid",
            distance=d,
            carry=["tag"],
        ).collect()
        return sorted(tuple(r) for r in rows)

    def _sides(self, spark, lefts, rights):
        left = spark.createDataFrame(
            [(i, float(x), float(y)) for i, (x, y) in enumerate(lefts)],
            "lid long, lx double, ly double",
        )
        right = spark.createDataFrame(
            [
                (100 + i, float(x), float(y), f"r{i}")
                for i, (x, y) in enumerate(rights)
            ],
            "rid long, rx double, ry double, tag string",
        )
        return left, right

    @pytest.mark.parametrize("n_cells", [1, 4, 32])
    def test_matches_crossjoin_oracle(self, spark, n_cells):
        left, right = self._sides(
            spark,
            [(0, 0), (5, 5), (-3, 8), (100, -40), (2.5, 2.5), (7, 7)],
            [(1, 1), (6, 4), (-2, 9), (50, 50), (0, -1), (7, 7)],
        )
        assert self._run_grid(left, right, n_cells=n_cells) == self._oracle(
            left, right
        )

    def test_far_outlier_hits_fallback_and_stays_exact(self, spark):
        # A left point so far outside the right bounding box that
        # max_rounds=1 cannot resolve it exercises the residual
        # broadcast fallback — which must still be exact.
        left, right = self._sides(
            spark,
            [(0, 0), (1e7, 1e7)],
            [(0, 1), (2, 2), (3, 0)],
        )
        got = self._run_grid(left, right, n_cells=8, max_rounds=1)
        assert got == self._oracle(left, right)

    def test_tie_breaks_on_smaller_right_key(self, spark):
        # Two right rows equidistant from the left row: the smaller
        # rid must win, matching the ROW_NUMBER oracle.
        left, right = self._sides(spark, [(0, 0)], [(1, 0), (-1, 0)])
        rows = self._run_grid(left, right, n_cells=4)
        assert rows[0][1] == 100

    def test_coincident_right_points(self, spark):
        # Degenerate bounding box (span 0): every right point in one
        # cell; width guard keeps the grid finite.
        left, right = self._sides(spark, [(5, 5), (0, 0)], [(1, 1), (1, 1)])
        got = self._run_grid(left, right, n_cells=8)
        assert got == self._oracle(left, right)


class TestBruteNnGuard:
    def test_oversized_right_side_raises(self, spark, monkeypatch):
        # The generic crossJoin NN must refuse un-broadcastable right
        # sides instead of evaluating |L|x|R| distances.
        from afg_data_pipeline_spark.operators.spatial import (
            nearest_neighbor_assign,
        )

        monkeypatch.setenv("AFG_NN_BRUTE_MAX_RIGHT_ROWS", "3")
        left = spark.createDataFrame(
            [(0, 0.0)], "lid long, lx double"
        )
        right = spark.createDataFrame(
            [(i, float(i)) for i in range(5)], "rid long, rx double"
        )
        with pytest.raises(ValueError, match="AFG_NN_BRUTE_MAX_RIGHT_ROWS"):
            nearest_neighbor_assign(
                left,
                right,
                left_key="lid",
                right_key="rid",
                distance=F.abs(F.col("lx") - F.col("rx")),
            )


class TestAsofJoin:
    def _frames(self, spark):
        trades = spark.createDataFrame(
            [
                ("A", 3, 100.0),
                ("A", 7, 101.0),
                ("A", 10, 99.0),
                ("B", 5, 50.0),
            ],
            schema="sym string, t int, px double",
        )
        quotes = spark.createDataFrame(
            [
                ("A", 2, 99.5),
                ("A", 7, 100.5),
                ("A", 9, 98.5),
                ("B", 6, 49.5),
            ],
            schema="sym string, qt int, bid double",
        )
        return trades, quotes

    def test_backward_inclusive(self, spark):
        trades, quotes = self._frames(spark)
        out = asof_join_backward(
            trades, quotes, "sym", "t", "qt", ["qt", "bid"]
        )
        got = {(r.sym, r.t): (r.asof_qt, r.asof_bid) for r in out.collect()}
        assert got[("A", 3)] == (2, 99.5)
        assert got[("A", 7)] == (7, 100.5)  # equal ts matches (>=)
        assert got[("A", 10)] == (9, 98.5)
        assert got[("B", 5)] == (None, None)  # nothing at-or-before

    def test_strict_excludes_equal_ts(self, spark):
        trades, quotes = self._frames(spark)
        out = asof_join_backward(
            trades, quotes, "sym", "t", "qt", ["qt", "bid"], strict=True
        )
        got = {(r.sym, r.t): r.asof_qt for r in out.collect()}
        assert got[("A", 7)] == 2  # the 7-quote is invisible

    def test_matches_pandas_merge_asof(self, spark):
        trades, quotes = self._frames(spark)
        out = asof_join_backward(
            trades, quotes, "sym", "t", "qt", ["bid"]
        )
        got = (
            out.orderBy("sym", "t")
            .toPandas()[["sym", "t", "asof_bid"]]
        )
        want = pd.merge_asof(
            trades.toPandas().sort_values("t"),
            quotes.toPandas()
            .sort_values("qt")
            .rename(columns={"qt": "t", "bid": "asof_bid"}),
            on="t",
            by="sym",
            direction="backward",
        ).sort_values(["sym", "t"])[["sym", "t", "asof_bid"]]
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


class TestSaltedJoin:
    def test_salting_is_semantically_invisible(self, spark):
        big = spark.range(0, 5000).select(
            (F.col("id") % 3).alias("k"), F.col("id").alias("v")
        )
        small = spark.createDataFrame(
            [(0, "x"), (1, "y"), (2, "z")], schema="k long, lbl string"
        )
        plain = (
            big.join(small, "k")
            .groupBy("lbl")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        )
        salted = (
            salted_join(big, small, "k", salt_buckets=8)
            .groupBy("lbl")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        )
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        )


class TestInterpolationProperties:
    """Hypothesis sweep of W1 (SURVEY.md §5.3): non-nulls
    untouched, completeness given one donor, pandas parity."""

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        values=st.lists(
            st.one_of(
                st.none(),
                st.floats(
                    min_value=-100,
                    max_value=100,
                    allow_nan=False,
                    width=32,
                ),
            ),
            min_size=2,
            max_size=12,
        ).filter(lambda vs: any(v is not None for v in vs))
    )
    def test_matches_pandas_for_random_series(self, spark, values):
        pdf = pd.DataFrame(
            {
                "g": "a",
                "i": range(len(values)),
                "v": [float(v) if v is not None else None for v in values],
            }
        )
        sdf = spark.createDataFrame(
            pdf, schema="g string, i int, v double"
        )
        got = (
            interpolate_linear(sdf, ["g"], "i", "v", "f")
            .orderBy("i")
            .toPandas()["f"]
            .to_numpy()
        )
        want = (
            pdf["v"].interpolate(method="linear").ffill().bfill().to_numpy()
        )
        import numpy as np

        assert np.allclose(got, want)


class TestFuzzyJoinBlocking:
    def _df(self, spark, names):
        return spark.createDataFrame([(n,) for n in names], "name string")

    def test_multiblock_recovers_first_char_misses(self, spark):
        from afg_data_pipeline_spark.operators.joins import (
            fuzzy_join_blocked,
        )

        names = ["apple", "bpple", "apples", "zzzzz"]
        df = self._df(spark, names)
        one_block = {
            (r.name_a, r.name_b)
            for r in fuzzy_join_blocked(
                df, df, "name", "name", max_distance=1
            ).collect()
        }
        # apple~bpple differ in the first char -> missed by the
        # single first-char block; apple~apples share it -> found.
        assert ("apple", "apples") in one_block
        assert ("apple", "bpple") not in one_block
        two_block = {
            (r.name_a, r.name_b)
            for r in fuzzy_join_blocked(
                df,
                df,
                "name",
                "name",
                max_distance=1,
                block_keys=[
                    lambda c: F.substring(c, 1, 1),
                    lambda c: F.substring(c, -1, 1),
                ],
            ).collect()
        }
        # Last-char block recovers it (both end in 'e').
        assert ("apple", "bpple") in two_block
        assert ("apple", "apples") in two_block
        assert not any("zzzzz" in p for pair in two_block for p in pair)
