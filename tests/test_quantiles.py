"""grouped_percentile_disc / adaptive_band_filter: python-replica
pins of the rank selection (percentile_disc semantics: smallest
value whose cumulative count reaches ceil(q*n))."""

from __future__ import annotations

import math

from afg_data_pipeline_spark.operators.quantiles import (
    adaptive_band_filter,
    grouped_percentile_disc,
)


def _disc(vals, q):
    s = sorted(vals)
    return s[math.ceil(q * len(s)) - 1]


class TestGroupedPercentileDisc:
    ROWS = (
        [("a", v) for v in [5, 1, 9, 3, 7, 3, 3, 11, 2, 8]]
        + [("b", v) for v in [100, 200, 300]]
        + [("c", 42)]  # single-row group: every percentile = 42
    )

    def test_matches_python_replica(self, spark):
        df = spark.createDataFrame(self.ROWS, "g string, v long")
        got = {
            r.g: (r.n, r.p10, r.p50, r.p90)
            for r in grouped_percentile_disc(
                df, "g", "v", (0.1, 0.5, 0.9)
            ).collect()
        }
        vals: dict = {}
        for g, v in self.ROWS:
            vals.setdefault(g, []).append(v)
        for g, vs in vals.items():
            assert got[g] == (
                len(vs),
                _disc(vs, 0.1),
                _disc(vs, 0.5),
                _disc(vs, 0.9),
            ), g

    def test_rank_boundary_exact(self, spark):
        # 10 values 1..10: p10 = ceil(0.1*10)=rank 1 -> 1;
        # p50 = rank 5 -> 5; p90 = rank 9 -> 9. Off-by-one in the
        # ceil would shift all three.
        df = spark.createDataFrame(
            [("g", v) for v in range(1, 11)], "g string, v long"
        )
        r = grouped_percentile_disc(
            df, "g", "v", (0.1, 0.5, 0.9)
        ).collect()[0]
        assert (r.p10, r.p50, r.p90) == (1, 5, 9)

    def test_rejects_out_of_range_q(self, spark):
        import pytest

        df = spark.createDataFrame([("g", 1)], "g string, v long")
        with pytest.raises(ValueError, match="q must be"):
            grouped_percentile_disc(df, "g", "v", (0.0,))


class TestAdaptiveBandFilter:
    def test_band_and_kept_count(self, spark):
        rows = [("a", v) for v in range(1, 101)] + [
            ("b", v) for v in [7, 7, 7, 7]
        ]
        df = spark.createDataFrame(rows, "g string, v long")
        got = {
            r.g: (r.n_docs, r.lo, r.hi, r.n_kept)
            for r in adaptive_band_filter(
                df, "g", "v", 0.1, 0.9
            ).collect()
        }
        # a: p10 = 10, p90 = 90 -> kept = 81 (10..90 inclusive)
        assert got["a"] == (100, 10, 90, 81)
        # b: constant values -> band collapses, everything kept
        assert got["b"] == (4, 7, 7, 4)


class TestFractionalQuantiles:
    def test_non_percent_q_exact_rank_and_name(self, spark):
        # q=0.125 over 16 values: exact rank ceil(16/8) = 2 -> 2.
        # The old integer-percent rounding computed ceil(0.13*16)=3
        # and named the column p13.
        df = spark.createDataFrame(
            [("g", v) for v in range(1, 17)], "g string, v long"
        )
        out = grouped_percentile_disc(df, "g", "v", (0.125,))
        assert "p12_5" in out.columns
        r = out.collect()[0]
        assert r.p12_5 == 2 == _disc(range(1, 17), 0.125)

    def test_duplicate_names_rejected(self, spark):
        import pytest

        df = spark.createDataFrame([("g", 1)], "g string, v long")
        with pytest.raises(ValueError, match="duplicate"):
            grouped_percentile_disc(df, "g", "v", (0.1, 0.1))

    def test_long_float_literal_q(self, spark):
        # A q with no short decimal literal still selects within
        # 1e-6 of the requested quantile (limit_denominator path).
        df = spark.createDataFrame(
            [("g", v) for v in range(1, 10)], "g string, v long"
        )
        out = grouped_percentile_disc(df, "g", "v", (1 / 3,))
        r = out.collect()[0]
        assert r[out.columns[-1]] == _disc(range(1, 10), 1 / 3)


class TestNullHandling:
    def test_nulls_excluded_like_sql_percentiles(self, spark):
        rows = [("g", v) for v in [1, 2, 3, 4, None, None]]
        df = spark.createDataFrame(rows, "g string, v long")
        r = grouped_percentile_disc(
            df, "g", "v", (0.5,)
        ).collect()[0]
        # n counts only non-null values; p50 over {1,2,3,4} = 2
        assert (r.n, r.p50) == (4, 2)
