"""Count–min sketch tests: python-replica bit-for-bit counter
matrix and estimates, the one-sided-error invariant, collision-free
exactness at large width, and the broadcast probe plan. The
registered query additionally hash-checks the whole pipeline
against the DuckDB oracle."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pytest

from afg_data_pipeline_spark.operators.cms import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
)


def _pos(key: str, j: int, w: int) -> int:
    return int(hashlib.md5(f"{j}:{key}".encode()).hexdigest()[:13], 16) % w


def _replica(keys, w, d):
    counters: dict[tuple[int, int], int] = defaultdict(int)
    for k in keys:
        for j in range(d):
            counters[(j, _pos(k, j, w))] += 1
    est = {
        k: min(counters[(j, _pos(k, j, w))] for j in range(d))
        for k in set(keys)
    }
    return counters, est


def _keystream():
    # zipf-ish: key-i occurs ~60//(i+1) times; small modulus so
    # the 64-cell sketch collides visibly
    out = []
    for i in range(40):
        out.extend([f"key-{i}"] * max(60 // (i + 1), 1))
    return out


class TestCms:
    W, D = 64, 3

    def test_counters_match_replica(self, spark):
        keys = _keystream()
        df = spark.createDataFrame([(k,) for k in keys], "key string")
        got = {
            (r["j"], r["pos"]): r["c"]
            for r in cms_build(df, "key", self.W, self.D).collect()
        }
        want, _ = _replica(keys, self.W, self.D)
        assert got == dict(want)

    def test_estimates_match_replica_and_upper_bound(self, spark):
        keys = _keystream()
        truth = Counter(keys)
        df = spark.createDataFrame([(k,) for k in keys], "key string")
        counters = cms_build(df, "key", self.W, self.D)
        cand = spark.createDataFrame(
            [(k,) for k in truth], "key string"
        )
        got = {
            r["key"]: r["est_count"]
            for r in cms_estimate(
                cand, "key", counters, self.W, self.D
            ).collect()
        }
        _, want = _replica(keys, self.W, self.D)
        assert got == want
        for k, est in got.items():
            assert est >= truth[k], k
        # the deliberately tiny sketch must actually overcount
        assert any(got[k] > truth[k] for k in got)

    def test_exact_at_collision_free_width(self, spark):
        keys = _keystream()
        truth = Counter(keys)
        df = spark.createDataFrame([(k,) for k in keys], "key string")
        top = cms_heavy_hitters(
            df, "key", k=10, width=1 << 16, depth=4
        ).collect()
        for r in top:
            assert r["est_count"] == r["true_count"] == truth[r["key"]]
            assert r["overcount"] == 0
        # ranking: est desc, key asc — with exact counts this is
        # the true frequency ranking
        ranks = [(r["est_count"], r["key"]) for r in top]
        assert ranks == sorted(
            ranks, key=lambda t: (-t[0], t[1])
        )

    def test_probe_plan_broadcasts_counters(self, spark):
        keys = _keystream()
        df = spark.createDataFrame([(k,) for k in keys], "key string")
        counters = cms_build(df, "key", self.W, self.D)
        plan = (
            cms_estimate(
                df.distinct(), "key", counters, self.W, self.D
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan

    def test_bad_shape_raises(self, spark):
        df = spark.createDataFrame([("x",)], "key string")
        with pytest.raises(ValueError, match="sketch shape"):
            cms_build(df, "key", width=0, depth=4)
