"""S5/M5: shapefile parsing, projection math, and the in-engine
centroid path (sources/shapefile.py).

The reference snapshot ships the comunas layer's sidecars
(.dbf/.prj/.shx) but not the .shp itself, so geometry tests run on
synthesized shapefiles written by the minimal writer below; the
attribute/index parsers are tested against the real sidecars.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from afg_data_pipeline_spark.sources.shapefile import (
    geodetic_to_webmercator,
    polygon_centroid,
    read_dbf,
    read_shp,
    read_shx,
    shapefile_to_centroids,
    utm_forward,
    utm_inverse,
    webmercator_to_geodetic,
)

REF_DBF = "/root/reference/datos/Comunas/comunas.dbf"
REF_SHX = "/root/reference/datos/Comunas/comunas.shx"

WEBMERC_PRJ = (
    'PROJCS["WGS_1984_Web_Mercator_Auxiliary_Sphere",'
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
    'PROJECTION["Mercator_Auxiliary_Sphere"],UNIT["Meter",1.0]]'
)


def write_polygon_shapefile(base, polygons, attrs, prj=WEBMERC_PRJ):
    """Minimal ESRI polygon shapefile writer (enough for tests):
    ``polygons`` = list of ring-lists, ``attrs`` = list of dicts
    with identical keys (C/N fields inferred)."""
    records = []
    for i, rings in enumerate(polygons):
        n_points = sum(len(r) for r in rings)
        parts = []
        acc = 0
        for r in rings:
            parts.append(acc)
            acc += len(r)
        xs = [p[0] for r in rings for p in r]
        ys = [p[1] for r in rings for p in r]
        content = struct.pack("<i", 5)
        content += struct.pack(
            "<4d", min(xs), min(ys), max(xs), max(ys)
        )
        content += struct.pack("<ii", len(rings), n_points)
        content += struct.pack(f"<{len(parts)}i", *parts)
        for r in rings:
            for x, y in r:
                content += struct.pack("<2d", x, y)
        records.append(
            struct.pack(">ii", i + 1, len(content) // 2) + content
        )
    body = b"".join(records)
    all_x = [p[0] for rings in polygons for r in rings for p in r]
    all_y = [p[1] for rings in polygons for r in rings for p in r]
    header = struct.pack(
        ">iiiiiii", 9994, 0, 0, 0, 0, 0, (100 + len(body)) // 2
    )
    header += struct.pack("<ii", 1000, 5)
    header += struct.pack(
        "<4d", min(all_x), min(all_y), max(all_x), max(all_y)
    )
    header += struct.pack("<4d", 0, 0, 0, 0)
    (base.parent / (base.name + ".shp")).write_bytes(header + body)
    (base.parent / (base.name + ".prj")).write_text(prj)

    # dBASE III: infer C(40) for str, N(18,0/6) for numbers.
    keys = list(attrs[0].keys())
    fields = []
    for k in keys:
        v = attrs[0][k]
        if isinstance(v, str):
            fields.append((k, "C", 40, 0))
        elif isinstance(v, float):
            fields.append((k, "N", 18, 6))
        else:
            fields.append((k, "N", 18, 0))
    record_len = 1 + sum(f[2] for f in fields)
    header_len = 32 + 32 * len(fields) + 1
    dbf = bytearray()
    dbf += struct.pack(
        "<BBBBIHH20x", 3, 26, 8, 13, len(attrs), header_len, record_len
    )
    for name, ftype, flen, fdec in fields:
        dbf += struct.pack(
            "<11sc4xBB14x",
            name.encode("ascii"),
            ftype.encode("ascii"),
            flen,
            fdec,
        )
    dbf += b"\x0d"
    for row in attrs:
        dbf += b" "
        for name, ftype, flen, fdec in fields:
            v = row[name]
            if ftype == "C":
                dbf += str(v).encode("latin-1").ljust(flen)[:flen]
            elif fdec:
                dbf += f"{v:>{flen}.{fdec}f}".encode("ascii")[:flen]
            else:
                dbf += f"{v:>{flen}d}".encode("ascii")[:flen]
    dbf += b"\x1a"
    (base.parent / (base.name + ".dbf")).write_bytes(bytes(dbf))
    return str(base.parent / (base.name + ".shp"))


class TestRealSidecars:
    """The snapshot's actual .dbf/.shx — parser ground truth."""

    def test_dbf_records_and_fields(self):
        rows = read_dbf(REF_DBF)
        assert len(rows) == 346
        assert {"Comuna", "codregion", "Region", "Provincia"} <= set(
            rows[0]
        )
        rm = [r for r in rows if r["codregion"] == 13]
        # Región Metropolitana has exactly 52 comunas.
        assert len(rm) == 52
        names = {r["Comuna"] for r in rm}
        assert "Santiago" in names
        # UTF-8 via the .CPG sidecar: accented names decode intact.
        assert any("ñ" in n or "í" in n for n in names)

    def test_shx_agrees_with_dbf(self):
        idx = read_shx(REF_SHX)
        assert len(idx) == len(read_dbf(REF_DBF)) == 346
        assert idx[0][0] == 100  # first record right after header
        # Offsets strictly increase by the previous record's length.
        for (o0, l0), (o1, _) in zip(idx, idx[1:]):
            assert o1 == o0 + 8 + l0


class TestProjectionMath:
    def test_utm_anchor_points(self):
        # Equator on the central meridian: exact by construction.
        assert utm_forward(0.0, -69.0, zone=19, south=True) == (
            500000.0,
            10000000.0,
        )
        e, n = utm_forward(0.0, -69.0, zone=19, south=False)
        assert (e, n) == (500000.0, 0.0)

    def test_meridian_arc_against_numerical_integral(self):
        # Independent check: on the central meridian, northing =
        # FN - k0 * M(|lat|) where M is the meridian arc — computed
        # here by brute-force quadrature of the ellipsoid integrand,
        # sharing no code with the Krüger series.
        a, f = 6378137.0, 1 / 298.257223563
        e2 = f * (2 - f)
        lat = 33.0
        theta = np.linspace(0.0, math.radians(lat), 2_000_001)
        integrand = (
            a * (1 - e2) / (1 - e2 * np.sin(theta) ** 2) ** 1.5
        )
        arc = float(np.trapz(integrand, theta))
        _, northing = utm_forward(-lat, -69.0, zone=19, south=True)
        assert abs((10000000.0 - 0.9996 * arc) - northing) < 0.01

    def test_roundtrip_over_utm_band(self):
        rng = np.random.default_rng(3)
        for _ in range(200):
            lat = float(rng.uniform(-80, 0))
            lon = float(rng.uniform(-72, -66))
            e, n = utm_forward(lat, lon)
            lat2, lon2 = utm_inverse(e, n)
            assert abs(lat2 - lat) < 1e-9
            assert abs(lon2 - lon) < 1e-9

    def test_webmercator_known_values_and_roundtrip(self):
        assert webmercator_to_geodetic(0.0, 0.0) == (0.0, 0.0)
        # Closed form: y(45°) = R ln(tan(π/4 + φ/2)).
        r = 6378137.0
        y45 = r * math.log(math.tan(math.pi / 4 + math.radians(45) / 2))
        lat, lon = webmercator_to_geodetic(0.0, y45)
        assert abs(lat - 45.0) < 1e-12
        x, y = geodetic_to_webmercator(-33.5, -70.7)
        lat2, lon2 = webmercator_to_geodetic(x, y)
        assert abs(lat2 + 33.5) < 1e-12 and abs(lon2 + 70.7) < 1e-12

    def test_polygon_centroid_with_hole(self):
        # 10x10 square with a 2x2 hole offset from center: exact
        # closed-form weighted centroid.
        shell = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
        hole = [(6, 6), (6, 8), (8, 8), (8, 6), (6, 6)]  # reversed
        cx, cy = polygon_centroid([shell, hole])
        # (100*(5,5) - 4*(7,7)) / 96
        assert abs(cx - (500 - 28) / 96) < 1e-12
        assert abs(cy - (500 - 28) / 96) < 1e-12


class TestShapefileToCentroids:
    def _mk(self, tmp_path, polys_geodetic, attrs):
        polys = [
            [
                [geodetic_to_webmercator(lat, lon) for lat, lon in ring]
                for ring in rings
            ]
            for rings in polys_geodetic
        ]
        return write_polygon_shapefile(
            tmp_path / "comunas", polys, attrs
        )

    def _square(self, lat, lon, d=0.02):
        return [
            (lat - d, lon - d),
            (lat - d, lon + d),
            (lat + d, lon + d),
            (lat + d, lon - d),
            (lat - d, lon - d),
        ]

    def test_end_to_end_centroids(self, tmp_path):
        shp = self._mk(
            tmp_path,
            [
                [self._square(-33.45, -70.66)],
                [self._square(-33.60, -70.70)],
                [self._square(-36.80, -73.05)],  # filtered out
            ],
            [
                {"Comuna": "Santiago", "codregion": 13},
                {"Comuna": "San Bernardo", "codregion": 13},
                {"Comuna": "Concepción", "codregion": 8},
            ],
        )
        rows = shapefile_to_centroids(
            shp,
            name_field="Comuna",
            filter_field="codregion",
            filter_value=13,
        )
        got = {r["Comuna"]: r for r in rows}
        assert set(got) == {"Santiago", "San Bernardo"}
        # A small square's projected centroid is its center to well
        # under the projection's curvature error at this size.
        for name, lat, lon in [
            ("Santiago", -33.45, -70.66),
            ("San Bernardo", -33.60, -70.70),
        ]:
            assert abs(got[name]["lat_centroid"] - lat) < 1e-5
            assert abs(got[name]["lon_centroid"] - lon) < 1e-5

    def test_mismatched_sidecar_raises(self, tmp_path):
        shp = self._mk(
            tmp_path,
            [[self._square(-33.45, -70.66)]],
            [{"Comuna": "Santiago", "codregion": 13}],
        )
        # Truncate the .dbf record count to force a mismatch.
        dbf = tmp_path / "comunas.dbf"
        raw = bytearray(dbf.read_bytes())
        raw[4:8] = struct.pack("<I", 0)
        dbf.write_bytes(bytes(raw))
        with pytest.raises(ValueError, match="shapes vs"):
            shapefile_to_centroids(shp, name_field="Comuna")

    def test_pipeline_entrypoint(self, spark, tmp_path):
        from afg_data_pipeline_spark.pipelines.temperaturas import (
            comunas_from_shapefile,
        )

        shp = self._mk(
            tmp_path,
            [[self._square(-33.45, -70.66)]],
            [{"Comuna": "Santiago", "codregion": 13}],
        )
        df = comunas_from_shapefile(spark, shp)
        rows = df.collect()
        assert [r.Comuna for r in rows] == ["Santiago"]
        assert df.columns == [
            "Comuna",
            "lat_centroid",
            "lon_centroid",
        ]
        # Unreadable path follows the reference's None contract.
        assert (
            comunas_from_shapefile(spark, str(tmp_path / "nope.shp"))
            is None
        )
