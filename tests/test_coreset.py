"""kcenter_select: python greedy replica on pseudorandom vectors,
known-geometry selection order, and the empty-input contract."""

from __future__ import annotations

import random

import pytest

from afg_data_pipeline_spark.operators.coreset import (
    kcenter_select,
)

GRID = 10**6


def _replica(vecs, k):
    ids = sorted(vecs)
    q = {
        i: [round(x * GRID) for x in v] for i, v in vecs.items()
    }

    def d(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    seed = ids[0]
    out = [(0, seed, 0)]
    dmin = {i: d(q[i], q[seed]) for i in ids}
    for r in range(1, k):
        best = max(
            ids, key=lambda i: (dmin[i], -i)
        )  # dist DESC, id ASC
        out.append((r, best, dmin[best]))
        for i in ids:
            dmin[i] = min(dmin[i], d(q[i], q[best]))
    return out


def _run(spark, vecs, k):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    return [
        (r["round"], r["vec_id"], r["dist_sq"])
        for r in kcenter_select(df, k=k)
        .orderBy("round")
        .collect()
    ]


class TestKCenter:
    def test_known_geometry(self, spark):
        # seed = id 0 at origin; farthest is the lone outlier,
        # then the opposite cluster
        vecs = {
            0: [0.0, 0.0],
            1: [0.01, 0.0],
            2: [0.02, 0.01],
            3: [1.0, 1.0],  # outlier
            4: [0.5, -0.5],
        }
        got = _run(spark, vecs, 3)
        assert got == _replica(vecs, 3)
        assert got[0][1] == 0
        assert got[1][1] == 3  # the outlier is picked first
        # each pick's distance is non-increasing (FPS invariant)
        assert got[1][2] >= got[2][2]

    def test_pseudorandom_matches_replica(self, spark):
        rnd = random.Random(5)
        vecs = {
            i: [rnd.uniform(-0.5, 0.5) for _ in range(16)]
            for i in range(60)
        }
        # float32 storage: replicate through float32 rounding
        import struct

        f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]  # noqa: E731
        vecs = {
            i: [f32(x) for x in v] for i, v in vecs.items()
        }
        assert _run(spark, vecs, 8) == _replica(vecs, 8)

    def test_empty_raises(self, spark):
        df = spark.createDataFrame(
            [], "vec_id long, embedding array<float>"
        )
        with pytest.raises(ValueError, match="empty"):
            kcenter_select(df, k=2)
