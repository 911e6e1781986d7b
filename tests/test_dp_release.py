"""Reproducible noisy-release histogram (dp_release_histogram).

Pins: (1) determinism — two evaluations release identical counts;
(2) clamp-at-zero and small-cell suppression semantics; (3) the
noise actually perturbs (released != raw for most cells at this
sigma, i.e. the mechanism is not a no-op); (4) the announced
(epsilon, delta, sigma) triple satisfies the Gaussian-mechanism
formula; (5) noise moments over many synthetic cells match the
target sigma (the CLAUDE.md rule: simulate any new mixer-derived
distribution before trusting it — the distributional check rides
the suite, not just a one-off notebook)."""

from __future__ import annotations

import math

from tests.conftest import SF_DIR


def _run(spark):
    from afg_data_pipeline_spark.plans import REGISTRY

    return REGISTRY["dp_release_histogram"].fn(spark, SF_DIR)


class TestDpRelease:
    def test_deterministic_and_semantics(self, spark):
        a = {
            (r.lang, r.source): r for r in _run(spark).collect()
        }
        b = {
            (r.lang, r.source): r for r in _run(spark).collect()
        }
        assert set(a) == set(b) and len(a) > 3
        for key, r in a.items():
            r2 = b[key]
            assert r.released_count == r2.released_count  # (1)
            assert r.released_count >= 0  # (2) clamp
            assert r.suppressed == (r.released_count < 10)
            # (4) accounting formula, announced in-output
            want = math.sqrt(2 * math.log(1.25 / r.delta)) / (
                r.epsilon
            )
            assert abs(r.sigma - want) < 1e-12

    def test_noise_is_not_a_noop(self, spark):
        """Compare released vs raw counts: with sigma ~5.3 the
        probability a cell's noise is exactly 0 is ~7.5%, so over
        the full cell table at least one must differ (and if ALL
        differed by 0 the mixer would be broken)."""
        import pyspark.sql.functions as F

        from afg_data_pipeline_spark.io import read_star_table

        raw = {
            (r.lang, r.source): r.n
            for r in read_star_table(spark, "documents", SF_DIR)
            .groupBy("lang", "source")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        rel = {
            (r.lang, r.source): r.released_count
            for r in _run(spark).collect()
        }
        assert set(rel) == set(raw)
        moved = sum(
            1 for k in raw if rel[k] != max(0, raw[k])
        )
        assert moved >= 1

    def test_noise_moments_match_sigma(self):
        """Pure-Python replica of the cell noise over 50k ranks:
        mean ~0, std within 2% of sigma, lag-1 correlation ~0."""
        M, A0, A1 = 4294967291, 1588635695, 1100087778
        seed = 20260817
        sigma = math.sqrt(2.0 * math.log(1.25 / 1e-6))

        def draw(r):
            s = 0
            for k in range(12):
                t = seed + (r - 1) * 12 + k
                u = ((t % M) * A0) % M
                w = u ^ (u >> 15)
                y = (w * A1) % M
                s += (y ^ (y >> 13)) % 65536
            return math.floor(
                sigma * (s - 393210.0) / 65536.0 + 0.5
            )

        zs = [draw(r) for r in range(1, 50001)]
        n = len(zs)
        mean = sum(zs) / n
        var = sum((z - mean) ** 2 for z in zs) / n
        assert abs(mean) < 0.1
        assert abs(var**0.5 - sigma) / sigma < 0.02
        num = sum(
            (zs[i] - mean) * (zs[i + 1] - mean)
            for i in range(n - 1)
        )
        assert abs(num / (n * var)) < 0.03
