"""Bloom-filter pre-filter tests: python-replica bit-for-bit
cross-check (no false negatives ever, false positives exactly
where the replica says), bitmap word representation, saturation
behavior, and config validation. The registered query
``bloom_prefilter_dedup`` additionally pins the whole pipeline
against the DuckDB oracle."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from afg_data_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
)


def _positions(key: str, k: int, m: int) -> list[int]:
    return [
        int(hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:13], 16) % m
        for i in range(k)
    ]


def _replica_member(key: str, bits: set[int], k: int, m: int) -> bool:
    return all(p in bits for p in _positions(key, k, m))


class TestBloom:
    M, K = 256, 2  # small bitmap so FPs occur in-test

    def _bits_of(self, keys):
        bits: set[int] = set()
        for key in keys:
            bits.update(_positions(key, self.K, self.M))
        return bits

    def test_matches_python_replica(self, spark):
        members = [f"member-{i}" for i in range(40)]
        probes = members + [f"probe-{i}" for i in range(120)]
        bits = self._bits_of(members)
        bloom = bloom_build(
            spark.createDataFrame([(k,) for k in members], "key string"),
            "key",
            m_bits=self.M,
            k_hashes=self.K,
        )
        got = {
            r["key"]: r["bloom_positive"]
            for r in bloom_probe(
                spark.createDataFrame(
                    [(k,) for k in probes], "key string"
                ),
                "key",
                bloom,
                m_bits=self.M,
                k_hashes=self.K,
            ).collect()
        }
        assert set(got) == set(probes)
        for key in probes:
            assert got[key] == _replica_member(key, bits, self.K, self.M)
        # every true member MUST be positive (no false negatives)
        assert all(got[k] for k in members)
        # the small bitmap must actually produce some FPs, or the
        # replica comparison above proves nothing interesting
        fps = [
            k for k in probes
            if got[k] and not k.startswith("member-")
        ]
        assert fps, "expected false positives at m=256/n=40"

    def test_bitmap_words_match_replica(self, spark):
        members = [f"w-{i}" for i in range(25)]
        bits = self._bits_of(members)
        want: dict[int, int] = {}
        for p in bits:
            want[p // 64] = want.get(p // 64, 0) | (1 << (p % 64))
        # python 1<<63 overflows signed 64-bit — normalize to signed
        want = {
            w: v - (1 << 64) if v >= (1 << 63) else v
            for w, v in want.items()
        }
        got = {
            r["word_idx"]: r["bits"]
            for r in bloom_build(
                spark.createDataFrame(
                    [(k,) for k in members], "key string"
                ),
                "key",
                m_bits=self.M,
                k_hashes=self.K,
            ).collect()
        }
        assert got == want

    def test_saturated_bitmap_says_yes_to_everything(self, spark):
        # n >> m: load factor ~1, every probe positive — the
        # documented degradation mode (tune m, not the algorithm).
        members = [f"s-{i}" for i in range(2000)]
        bloom = bloom_build(
            spark.createDataFrame([(k,) for k in members], "key string"),
            "key",
            m_bits=64,
            k_hashes=2,
        )
        out = bloom_probe(
            spark.createDataFrame(
                [("definitely-not-a-member",)], "key string"
            ),
            "key",
            bloom,
            m_bits=64,
            k_hashes=2,
        ).collect()
        assert out[0]["bloom_positive"] is True

    def test_bad_m_bits_raises(self, spark):
        df = spark.createDataFrame([("x",)], "key string")
        with pytest.raises(ValueError, match="multiple of 64"):
            bloom_build(df, "key", m_bits=100)

    def test_probe_plan_broadcasts_bitmap(self, spark):
        members = [f"b-{i}" for i in range(10)]
        bloom = bloom_build(
            spark.createDataFrame([(k,) for k in members], "key string"),
            "key",
            m_bits=self.M,
            k_hashes=self.K,
        )
        plan = (
            bloom_probe(
                spark.createDataFrame(
                    [(k,) for k in members], "key string"
                ),
                "key",
                bloom,
                m_bits=self.M,
                k_hashes=self.K,
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
