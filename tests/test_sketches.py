"""Accuracy pins for the sketch-based (oracle-less) aggregates:
HLL distinct counts within rsd, approx_percentile within its rank
error of the exact quantile. These are the correctness anchors the
query docstrings promise."""

from __future__ import annotations

from pyspark.sql import functions as F

from afg_data_pipeline_spark.io import read_star_table
from afg_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_DIR


class TestSketchAccuracy:
    def test_hll_within_rsd(self, spark):
        got = REGISTRY["approx_distinct_counts"].fn(
            spark, SF_DIR
        ).collect()[0]
        li = read_star_table(spark, "lineitem", SF_DIR)
        exact = li.agg(
            F.count_distinct("l_orderkey").alias("orders"),
            F.count_distinct("l_partkey").alias("parts"),
        ).collect()[0]
        # rsd 0.02 → allow 4 sigma
        assert abs(got["approx_orders"] - exact["orders"]) <= max(
            8, 0.08 * exact["orders"]
        )
        assert abs(got["approx_parts"] - exact["parts"]) <= max(
            8, 0.08 * exact["parts"]
        )

    def test_approx_percentile_within_rank_error(self, spark):
        got = {
            r["l_returnflag"]: r
            for r in REGISTRY["approx_quantiles"].fn(
                spark, SF_DIR
            ).collect()
        }
        li = read_star_table(spark, "lineitem", SF_DIR)
        rows = (
            li.select("l_returnflag", "l_extendedprice", "l_quantity")
            .collect()
        )
        by_flag: dict[str, list] = {}
        for r in rows:
            by_flag.setdefault(r["l_returnflag"], []).append(r)
        for flag, grp in by_flag.items():
            prices = sorted(x["l_extendedprice"] for x in grp)
            n = len(prices)
            # accuracy 10000 → rank error 1/10000; grant ±1 rank
            # for the discrete data plus the sketch bound.
            err = max(2, n // 10_000 + 1)
            for q, est in zip(
                (0.25, 0.5, 0.75),
                (
                    got[flag]["price_p25"],
                    got[flag]["price_p50"],
                    got[flag]["price_p75"],
                ),
            ):
                target = int(q * (n - 1))
                lo = prices[max(0, target - err)]
                hi = prices[min(n - 1, target + err)]
                assert lo <= est <= hi, (flag, q, est, lo, hi)


class TestStratifiedSampling:
    def test_fractions_and_determinism(self, spark):
        from afg_data_pipeline_spark.operators.sampling import (
            hash_stratified_sample,
        )

        docs = read_star_table(spark, "documents", SF_DIR)
        totals = {
            r["lang"]: r["n"]
            for r in docs.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        sampled = hash_stratified_sample(
            docs, "lang", "doc_id", {"en": 0.25}, default_fraction=1.0
        )
        got = {
            r["lang"]: r["n"]
            for r in sampled.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # Non-targeted strata fully kept.
        for lang, n in totals.items():
            if lang != "en":
                assert got[lang] == n
        # Target stratum within binomial noise of 25%.
        import math

        n_en = totals["en"]
        sigma = math.sqrt(n_en * 0.25 * 0.75)
        assert abs(got.get("en", 0) - 0.25 * n_en) <= 4 * sigma + 1
        # Deterministic: same ids on re-evaluation.
        ids1 = sorted(r["doc_id"] for r in sampled.collect())
        ids2 = sorted(r["doc_id"] for r in sampled.collect())
        assert ids1 == ids2

    def test_fraction_threshold_bounds(self):
        import pytest as _pytest

        from afg_data_pipeline_spark.operators.sampling import (
            fraction_threshold,
        )

        assert fraction_threshold(0.0) == "0" * 8 + "0" * 24
        assert fraction_threshold(1.0) == "g" * 32
        assert fraction_threshold(0.5).startswith("80000000")
        with _pytest.raises(ValueError):
            fraction_threshold(1.5)


class TestSketchGolden:
    """Exact-value regression pins for the two rows-only sketch
    queries (the driver's weaker check): the sketches are
    deterministic, so their registered-query outputs at sf0.001
    are frozen literals here — any silent change to the sketch
    path, canonicalization, or input handling becomes a red test
    instead of an unnoticed rows-only drift. (Accuracy vs exact
    answers is pinned separately above; this pins the VALUES.)"""

    def test_approx_distinct_counts_golden(self, spark):
        from afg_data_pipeline_spark.plans import REGISTRY

        row = REGISTRY["approx_distinct_counts"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert len(row) == 1
        assert (row[0].approx_orders, row[0].approx_parts) == (
            1467,
            199,
        )

    def test_approx_quantiles_golden(self, spark):
        from afg_data_pipeline_spark.plans import REGISTRY

        got = {
            r.l_returnflag: (
                r.price_p25,
                r.price_p50,
                r.price_p75,
                r.approx_median_qty,
            )
            for r in REGISTRY["approx_quantiles"]
            .fn(spark, "/root/testdata/sf0.001")
            .collect()
        }
        assert got == {
            "A": (25120.63, 51424.94, 78674.66, 25.0),
            "N": (27908.59, 54089.68, 79167.65, 26.0),
            "R": (27041.83, 52709.74, 81356.76, 25.0),
        }
