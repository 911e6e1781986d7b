"""Area-weighted polygon->polygon reaggregation (VERDICT r9 #5):
golden intersection areas, conservation invariants on the comunas
fixture, the convexity guard, and a hand-checked Spark end-to-end.
"""

from __future__ import annotations

import math

import pytest

from afg_data_pipeline_spark.operators.spatial import (
    areal_reaggregate,
    areal_weights,
    polygon_area,
    polygon_intersection_area,
)

_SQ4 = [[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]]
_TRI = [[(0.0, 0.0), (4.0, 0.0), (0.0, 4.0)]]
# west_box of the point-in-polygon fixture: 350x350 shell with a
# 100x100 hole (both rings stored same-wound — the normalizer must
# classify by containment, not winding)
_HOLED = [
    [
        (100.5, 100.5), (450.5, 100.5),
        (450.5, 450.5), (100.5, 450.5),
        (100.5, 100.5),
    ],
    [
        (200.5, 200.5), (300.5, 200.5),
        (300.5, 300.5), (200.5, 300.5),
        (200.5, 200.5),
    ],
]
_EAST_L = [
    [
        (500.5, 50.5), (900.5, 50.5),
        (900.5, 350.5), (700.5, 350.5),
        (700.5, 650.5), (500.5, 650.5),
        (500.5, 50.5),
    ],
]


class TestIntersectionGolden:
    def test_triangle_clipped_by_square(self):
        # right triangle legs 4, clip [0,3]^2: lose the x+y>4
        # corner (legs 2) -> 9 - 8 + ... = tri area 8 minus the
        # cut corner 2 of the SQUARE side: area = 9 - 2 = 7 is the
        # square minus corner; the triangle inter square = 8 - 0
        # minus parts outside square: tri area 8, outside [0,3]^2
        # are two corner slivers at (3..4,0..1) and (0..1,3..4),
        # each 0.5 -> 8 - 0.5 - 0.5 = 7.
        clip = [(0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (0.0, 3.0)]
        assert polygon_intersection_area(_TRI, clip) == pytest.approx(
            7.0, abs=1e-9
        )

    def test_full_containment_is_area(self):
        clip = [(-1.0, -1.0), (9.0, -1.0), (9.0, 9.0), (-1.0, 9.0)]
        assert polygon_intersection_area(_TRI, clip) == pytest.approx(
            8.0, abs=1e-9
        )
        assert polygon_intersection_area(_SQ4, clip) == pytest.approx(
            16.0, abs=1e-9
        )

    def test_disjoint_is_zero(self):
        clip = [(10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 12.0)]
        assert polygon_intersection_area(_TRI, clip) == 0.0

    def test_hole_subtracts(self):
        assert polygon_area(_HOLED) == pytest.approx(
            350.0 * 350.0 - 100.0 * 100.0, abs=1e-6
        )
        # clip window covering exactly the hole region: zero area
        hole_win = [
            (200.5, 200.5), (300.5, 200.5),
            (300.5, 300.5), (200.5, 300.5),
        ]
        assert polygon_intersection_area(
            _HOLED, hole_win
        ) == pytest.approx(0.0, abs=1e-9)

    def test_convexity_guard(self):
        lshape = [
            (0.0, 0.0), (4.0, 0.0), (4.0, 2.0),
            (2.0, 2.0), (2.0, 4.0), (0.0, 4.0),
        ]
        with pytest.raises(ValueError, match="not convex"):
            polygon_intersection_area(_SQ4, lshape)


class TestConservation:
    """Partitioning target grid => intersection areas sum to the
    source polygon's area EXACTLY (the independent invariant that
    doesn't re-run the clipper's own arithmetic)."""

    def _grid(self, x0, y0, x1, y1, n):
        xs = [x0 + (x1 - x0) * i / n for i in range(n + 1)]
        ys = [y0 + (y1 - y0) * i / n for i in range(n + 1)]
        out = []
        for yi in range(n):
            for xi in range(n):
                out.append(
                    (
                        f"g{yi}{xi}",
                        [
                            [
                                (xs[xi], ys[yi]),
                                (xs[xi + 1], ys[yi]),
                                (xs[xi + 1], ys[yi + 1]),
                                (xs[xi], ys[yi + 1]),
                            ]
                        ],
                    )
                )
        return out

    @pytest.mark.parametrize(
        "rings,area",
        [
            (_HOLED, 350.0 * 350.0 - 100.0 * 100.0),
            (_EAST_L, 400.0 * 300.0 + 200.0 * 300.0),
            (_TRI, 8.0),
        ],
    )
    def test_partition_sums_to_area(self, rings, area):
        grid = self._grid(-10.0, -10.0, 1000.0, 1000.0, 5)
        w = areal_weights([("p", rings)], grid)
        assert math.fsum(r[2] for r in w) == pytest.approx(
            area, rel=1e-12
        )
        assert all(r[3] == pytest.approx(area) for r in w)


class TestSparkEndToEnd:
    def test_hand_checked_apportionment(self, spark):
        # one source zone [0,10]x[0,10] with q=40, split 30/70 by
        # a target cut at x=3
        q = spark.createDataFrame(
            [("s0", 40)], "src_id string, q long"
        )
        src = [("s0", [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]])]
        dst = [
            ("left", [[(0.0, 0.0), (3.0, 0.0), (3.0, 10.0), (0.0, 10.0)]]),
            ("right", [[(3.0, 0.0), (10.0, 0.0), (10.0, 10.0), (3.0, 10.0)]]),
            ("empty", [[(20.0, 0.0), (21.0, 0.0), (21.0, 1.0), (20.0, 1.0)]]),
        ]
        rows = {
            r["dst_id"]: r
            for r in areal_reaggregate(q, src, dst).collect()
        }
        assert rows["left"]["apportioned"] == pytest.approx(12.0)
        assert rows["right"]["apportioned"] == pytest.approx(28.0)
        assert rows["left"]["shared_area"] == 30.0
        assert rows["empty"]["n_src"] == 0
        assert rows["empty"]["apportioned"] == 0.0
        # mass conservation across a covering target layer
        total = sum(
            r["apportioned"] for r in rows.values()
        )
        assert total == pytest.approx(40.0, abs=1e-9)
