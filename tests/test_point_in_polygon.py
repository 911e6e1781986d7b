"""Point-in-polygon containment join
(operators/spatial.point_in_polygon_join).

Golden pins: a synthesized shapefile (the minimal ESRI writer from
test_shapefile) is parsed by sources/shapefile.read_shp and its
rings fed to the operator; every (point, polygon) answer is diffed
against a pure-Python ray-cast replica.  Prune exactness: n_cells=1
(everything boundary → brute parity) and n_cells=32 (interior cells
accepted with no edge work) must give identical answers.
"""

from __future__ import annotations

from afg_data_pipeline_spark.operators.spatial import (
    _ray_cast,
    _ring_edges,
    point_in_polygon_join,
)
from tests.test_shapefile import write_polygon_shapefile

# box with a square hole; concave L; triangle overlapping the box
POLYS = [
    (
        "holed_box",
        [
            [(10.5, 10.5), (60.5, 10.5), (60.5, 60.5),
             (10.5, 60.5), (10.5, 10.5)],
            [(25.5, 25.5), (40.5, 25.5), (40.5, 40.5),
             (25.5, 40.5), (25.5, 25.5)],
        ],
    ),
    (
        "ell",
        [
            [(70.5, 5.5), (120.5, 5.5), (120.5, 45.5),
             (95.5, 45.5), (95.5, 90.5), (70.5, 90.5),
             (70.5, 5.5)],
        ],
    ),
    (
        "tri",
        [
            [(50.5, 40.5), (90.5, 40.5), (70.5, 85.5),
             (50.5, 40.5)],
        ],
    ),
]


def _expected(points):
    out = set()
    edges = {p: list(_ring_edges(r)) for p, r in POLYS}
    for pid, px, py in points:
        for poly, es in edges.items():
            if _ray_cast(float(px), float(py), es):
                out.add((pid, poly))
    return out


def _points():
    # integer grid covering the layer and beyond (out-of-bbox
    # points must drop out), identical derivation both paths
    pts = []
    i = 0
    for x in range(0, 140, 3):
        for y in range(0, 100, 3):
            pts.append((i, x, y))
            i += 1
    return pts


class TestPointInPolygon:
    def _run(self, spark, polygons, n_cells):
        pts = _points()
        df = spark.createDataFrame(
            pts, "pid long, x long, y long"
        )
        got = point_in_polygon_join(
            df,
            polygons,
            id_col="pid",
            x_col="x",
            y_col="y",
            n_cells=n_cells,
        )
        return {(r.pid, r.poly_id) for r in got.collect()}

    def test_matches_ray_cast_replica(self, spark):
        got = self._run(spark, POLYS, 32)
        exp = _expected(_points())
        assert got == exp
        # sanity: the fixture exercises every semantic branch
        polys_hit = {p for _, p in exp}
        assert polys_hit == {"holed_box", "ell", "tri"}
        by_pid: dict = {}
        for pid, poly in exp:
            by_pid.setdefault(pid, set()).add(poly)
        assert any(len(v) == 2 for v in by_pid.values())  # overlap
        # hole exclusion: a point inside the hole ring is NOT in
        # holed_box (33, 33 is mid-hole on the integer grid)
        hole_pid = [
            pid for pid, x, y in _points() if x == 33 and y == 33
        ][0]
        assert (hole_pid, "holed_box") not in got
        # ...but a point between the hole and the outer ring is in
        in_pid = [
            pid for pid, x, y in _points() if x == 15 and y == 33
        ][0]
        assert (in_pid, "holed_box") in got

    def test_prune_exactness_all_boundary_vs_gridded(self, spark):
        assert self._run(spark, POLYS, 1) == self._run(
            spark, POLYS, 32
        )

    def test_edge_clustered_points_match_replica(self, spark):
        """Worst case for the grid classifier (VERDICT r9 #1):
        every point within ~0.3 of a polygon edge (lerp along the
        edge + a fixed off-edge offset), so ~all in-bbox points
        land in boundary cells and pay the exact ray-cast path.
        Diffed point-for-point against the pure-Python replica —
        including points near the hole ring and the overlap zone."""
        edges = [
            (pid, e)
            for pid, rings in POLYS
            for e in _ring_edges(rings)
        ]
        pts = []
        for i in range(600):
            _pid, (x1, y1, x2, y2) = edges[i % len(edges)]
            t = (i // len(edges) % 25) / 25.0
            pts.append(
                (
                    i,
                    x1 + t * (x2 - x1) + 0.25,
                    y1 + t * (y2 - y1) + 0.125,
                )
            )
        df = spark.createDataFrame(
            pts, "pid long, x double, y double"
        )
        got = {
            (r.pid, r.poly_id)
            for r in point_in_polygon_join(
                df,
                POLYS,
                id_col="pid",
                x_col="x",
                y_col="y",
                n_cells=32,
            ).collect()
        }
        assert got == _expected(pts)
        assert len(got) > 100  # the band genuinely hits polygons

    def test_empty_layer_raises(self, spark):
        import pytest as _pytest

        df = spark.createDataFrame(
            [(1, 2, 3)], "pid long, x long, y long"
        )
        with _pytest.raises(ValueError):
            point_in_polygon_join(
                df, [], id_col="pid", x_col="x", y_col="y"
            )

    def test_reserved_point_column_raises(self, spark):
        """r9-ADVICE guard: a points frame whose columns collide
        with the operator's internal working names must fail
        loudly up front, never produce an ambiguous join."""
        import pytest as _pytest

        df = spark.createDataFrame(
            [(1, 2, 3, 9)],
            "pid long, x long, y long, cell long",
        )
        with _pytest.raises(ValueError, match="collide"):
            point_in_polygon_join(
                df, POLYS, id_col="pid", x_col="x", y_col="y"
            )

    def test_points_outside_layer_bbox_drop_out(self, spark):
        # points far outside the layer bbox must not be clamped
        # into edge cells (the bbox filter runs BEFORE the cell
        # floor/clamp)
        df = spark.createDataFrame(
            [(1, -500, -500), (2, 10_000, 3), (3, 20, 30)],
            "pid long, x long, y long",
        )
        got = {
            (r.pid, r.poly_id)
            for r in point_in_polygon_join(
                df, POLYS, id_col="pid", x_col="x", y_col="y"
            ).collect()
        }
        assert got == {(3, "holed_box")}

    def test_property_random_layers_match_replica(self, spark):
        """Hypothesis sweep: arbitrary ring lists (degenerate,
        zero-area, horizontal edges, duplicate vertices, concave,
        self-intersecting — even-odd is defined for all of them)
        over an integer point grid must match the pure-Python
        ray-cast replica at both the all-boundary and the gridded
        prune settings."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        # vertices on the half-integer grid; points on the integer
        # grid -> no point ever lies exactly on an edge
        vertex = st.tuples(
            st.integers(0, 30).map(lambda v: v + 0.5),
            st.integers(0, 30).map(lambda v: v + 0.5),
        )
        ring = st.lists(vertex, min_size=3, max_size=7)
        polygon = st.lists(ring, min_size=1, max_size=2)
        layer = st.lists(polygon, min_size=1, max_size=2)

        pts = [
            (i, x, y)
            for i, (x, y) in enumerate(
                (x, y)
                for x in range(0, 32, 4)
                for y in range(0, 32, 4)
            )
        ]
        pdf = spark.createDataFrame(
            pts, "pid long, x long, y long"
        ).localCheckpoint()

        @settings(
            max_examples=12,
            deadline=None,
            suppress_health_check=list(HealthCheck),
        )
        @given(layer)
        def run(polys):
            named = [(f"p{i}", r) for i, r in enumerate(polys)]
            edges = {
                p: list(_ring_edges(r)) for p, r in named
            }
            exp = {
                (pid, poly)
                for pid, x, y in pts
                for poly, es in edges.items()
                if _ray_cast(float(x), float(y), es)
            }
            for n_cells in (1, 6):
                got = {
                    (r.pid, r.poly_id)
                    for r in point_in_polygon_join(
                        pdf,
                        named,
                        id_col="pid",
                        x_col="x",
                        y_col="y",
                        n_cells=n_cells,
                    ).collect()
                }
                assert got == exp, (n_cells, sorted(got ^ exp))

        run()

    def test_geometry_report_matches_polygon_centroid(
        self, spark
    ):
        """polygon_geometry_report's exact-integer shoelace must
        agree with sources/shapefile.polygon_centroid (float
        accumulation) on the registered layer, and the areas must
        match a direct shoelace recomputation."""
        from afg_data_pipeline_spark.plans import REGISTRY
        from afg_data_pipeline_spark.plans.reference_semantics import (
            _PIP_POLYGONS,
        )
        from afg_data_pipeline_spark.sources.shapefile import (
            polygon_centroid,
        )

        got = {
            r.poly_id: r
            for r in REGISTRY["polygon_geometry_report"]
            .fn(spark, "/root/testdata/sf0.001")
            .collect()
        }
        assert set(got) == {p for p, _ in _PIP_POLYGONS}
        for pid, rings in _PIP_POLYGONS:
            cx, cy = polygon_centroid(rings)
            r = got[pid]
            assert abs(r.centroid_x - cx) < 1e-9 * max(1, abs(cx))
            assert abs(r.centroid_y - cy) < 1e-9 * max(1, abs(cy))
            a2 = sum(
                x0 * y1 - x1 * y0
                for ring in rings
                for (x0, y0), (x1, y1) in zip(ring, ring[1:])
            )
            assert abs(r.area - abs(a2) / 2) < 1e-9
            assert r.n_rings == len(rings)

    def test_round_trips_through_shapefile(self, spark, tmp_path):
        """Parse the layer back out of a real .shp written by the
        minimal ESRI writer: rings from read_shp drive the operator
        to the same answers as the literal rings."""
        from afg_data_pipeline_spark.sources.shapefile import (
            read_dbf,
            read_shp,
        )

        write_polygon_shapefile(
            tmp_path / "layer",
            [rings for _, rings in POLYS],
            [{"name": p} for p, _ in POLYS],
        )
        shapes = read_shp(str(tmp_path / "layer.shp"))
        names = [
            r["name"].strip()
            for r in read_dbf(str(tmp_path / "layer.dbf"))
        ]
        parsed = list(zip(names, [s.rings for s in shapes]))
        assert self._run(spark, parsed, 32) == _expected(
            _points()
        )
