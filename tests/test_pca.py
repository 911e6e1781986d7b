"""Distributed-PCA operator tests: numpy eigensolver agreement on
a structured synthetic corpus, partitioning-invariance (the
integer-grid determinism claim), degenerate-input errors, and the
join-free projection plan. The registered query additionally pins
every arithmetic step against the unrolled HUGEINT DuckDB oracle."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from afg_data_pipeline_spark.operators.pca import (
    GRID,
    V_SCALE,
    gram_moments,
    pca_top_component_scores,
    power_iteration_int,
    project_scores,
)


def _synthetic(n=400, d=8, seed=7):
    """Anisotropic Gaussian-ish corpus with a planted dominant
    direction — deterministic (hash-seeded, no RNG state)."""
    rng = np.random.RandomState(seed)
    direction = rng.randn(d)
    direction /= np.linalg.norm(direction)
    t = rng.randn(n, 1) * 3.0  # dominant axis, 3x the noise scale
    noise = rng.randn(n, d) * 0.5
    x = t @ direction[None, :] + noise
    x = np.clip(x, -0.9, 0.9)  # stay in the embedding-like range
    return x, direction


class TestPcaPowerIteration:
    def test_matches_numpy_eigensolver(self, spark):
        x, _ = _synthetic()
        df = spark.createDataFrame(
            [(i, [float(v) for v in row]) for i, row in enumerate(x)],
            "vec_id long, embedding array<float>",
        )
        n, s1, s2 = gram_moments(df, "vec_id", "embedding")
        v = power_iteration_int(n, s1, s2, iterations=12)
        # numpy reference on the same quantized data
        g = np.round(x.astype(np.float32).astype(np.float64) * GRID)
        c = len(g) * (g.T @ g) - np.outer(g.sum(0), g.sum(0))
        evals, evecs = np.linalg.eigh(c)
        top = evecs[:, -1]
        got = np.array(v, dtype=np.float64)
        cos = abs(got @ top) / (
            np.linalg.norm(got) * np.linalg.norm(top)
        )
        assert cos > 0.9999, cos

    def test_moment_sums_exact(self, spark):
        x, _ = _synthetic(n=50, d=4)
        df = spark.createDataFrame(
            [(i, [float(v) for v in row]) for i, row in enumerate(x)],
            "vec_id long, embedding array<float>",
        )
        n, s1, s2 = gram_moments(df, "vec_id", "embedding")
        # python replica of the quantization (float32 storage,
        # double math, half-up rounding = Spark round())
        g = [
            [
                int(
                    math.floor(
                        float(np.float32(v)) * GRID + 0.5
                    )
                    if v >= 0
                    else -math.floor(-float(np.float32(v)) * GRID + 0.5)
                )
                for v in row
            ]
            for row in x
        ]
        assert n == 50
        for i in range(4):
            assert s1[i] == sum(row[i] for row in g)
        for i in range(4):
            for j in range(4):
                assert s2[(i, j)] == sum(
                    row[i] * row[j] for row in g
                )

    def test_partitioning_invariance(self, spark):
        x, _ = _synthetic(n=200, d=6)
        rows = [(i, [float(v) for v in row]) for i, row in enumerate(x)]
        outs = []
        for parts in (1, 7):
            df = spark.createDataFrame(
                rows, "vec_id long, embedding array<float>"
            ).repartition(parts)
            out = {
                r["vec_id"]: r["pc1_score_scaled"]
                for r in pca_top_component_scores(df).collect()
            }
            outs.append(out)
        assert outs[0] == outs[1]

    def test_degenerate_corpus_raises(self, spark):
        df = spark.createDataFrame(
            [(i, [0.5, 0.5]) for i in range(10)],
            "vec_id long, embedding array<float>",
        )
        with pytest.raises(ValueError, match="degenerate corpus"):
            pca_top_component_scores(df)

    def test_projection_plan_is_join_free(self, spark):
        df = spark.createDataFrame(
            [(0, [0.1, 0.2]), (1, [0.3, -0.1])],
            "vec_id long, embedding array<float>",
        )
        plan = (
            project_scores(df, "vec_id", "embedding", [V_SCALE, -123])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Join" not in plan
        assert "Exchange" not in plan
