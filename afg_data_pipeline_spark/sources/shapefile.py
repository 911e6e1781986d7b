"""S5/M5: shapefile → comuna centroids, in-engine.

Reference: temperaturas_rm.py:106-119 — gpd.read_file(shapefile),
filter codregion == 13, to_crs(EPSG:32719), .centroid, to_crs
(EPSG:4326), keep (lat_centroid, lon_centroid). Round 1 consumed
precomputed centroids (SURVEY M5); this module closes the gap so the
pipeline runs from a raw ``.shp`` with no geo dependencies — the
sandbox has no geopandas/pyproj, and none are needed: the formats
and projections are small public specs.

- ``.shp``/``.shx``/``.dbf`` parsing follows the ESRI shapefile
  whitepaper and the dBASE III header layout.
- CRS math: spherical Web-Mercator (the snapshot's ``.prj``:
  WGS_1984_Web_Mercator_Auxiliary_Sphere) → geodetic, then
  geodetic ↔ UTM via the 6th-order Krüger series (Karney 2011,
  "Transverse Mercator with an accuracy of a few nanometers") —
  sub-millimeter agreement with pyproj over UTM's validity band.
- Centroid: signed-shoelace area-weighted over all rings, so holes
  (opposite winding) subtract exactly as geopandas' ``.centroid``.

Everything here is driver-side on purpose: a comuna layer is a
dimension table (hundreds of rows) that feeds a broadcast join; the
scalable side of J3 lives in operators/spatial.py.
"""

from __future__ import annotations

import math
import os
import struct
from dataclasses import dataclass

# --- WGS84 ellipsoid ---------------------------------------------------
_A = 6378137.0
_F = 1.0 / 298.257223563
_E = math.sqrt(_F * (2.0 - _F))
_N = _F / (2.0 - _F)
# Rectifying radius: A_bar = a/(1+n) (1 + n²/4 + n⁴/64 + n⁶/256)
_ABAR = (
    _A
    / (1.0 + _N)
    * (1.0 + _N**2 / 4.0 + _N**4 / 64.0 + _N**6 / 256.0)
)
# Krüger series coefficients (Karney 2011 eqs. 35/36/6), order n⁶.
_ALPHA = (
    _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16 + 41 * _N**4 / 180
    - 127 * _N**5 / 288 + 7891 * _N**6 / 37800,
    13 * _N**2 / 48 - 3 * _N**3 / 5 + 557 * _N**4 / 1440
    + 281 * _N**5 / 630 - 1983433 * _N**6 / 1935360,
    61 * _N**3 / 240 - 103 * _N**4 / 140 + 15061 * _N**5 / 26880
    + 167603 * _N**6 / 181440,
    49561 * _N**4 / 161280 - 179 * _N**5 / 168
    + 6601661 * _N**6 / 7257600,
    34729 * _N**5 / 80640 - 3418889 * _N**6 / 1995840,
    212378941 * _N**6 / 319334400,
)
_BETA = (
    _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96 - _N**4 / 360
    - 81 * _N**5 / 512 + 96199 * _N**6 / 604800,
    _N**2 / 48 + _N**3 / 15 - 437 * _N**4 / 1440 + 46 * _N**5 / 105
    - 1118711 * _N**6 / 3870720,
    17 * _N**3 / 480 - 37 * _N**4 / 840 - 209 * _N**5 / 4480
    + 5569 * _N**6 / 90720,
    4397 * _N**4 / 161280 - 11 * _N**5 / 504
    - 830251 * _N**6 / 7257600,
    4583 * _N**5 / 161280 - 108847 * _N**6 / 3991680,
    20648693 * _N**6 / 638668800,
)
_DELTA = (
    2 * _N - 2 * _N**2 / 3 - 2 * _N**3 + 116 * _N**4 / 45
    + 26 * _N**5 / 45 - 2854 * _N**6 / 675,
    7 * _N**2 / 3 - 8 * _N**3 / 5 - 227 * _N**4 / 45
    + 2704 * _N**5 / 315 + 2323 * _N**6 / 945,
    56 * _N**3 / 15 - 136 * _N**4 / 35 - 1262 * _N**5 / 105
    + 73814 * _N**6 / 2835,
    4279 * _N**4 / 630 - 332 * _N**5 / 35 - 399572 * _N**6 / 14175,
    4174 * _N**5 / 315 - 144838 * _N**6 / 6237,
    601676 * _N**6 / 22275,
)


def utm_forward(
    lat: float,
    lon: float,
    zone: int = 19,
    south: bool = True,
    k0: float = 0.9996,
) -> tuple[float, float]:
    """Geodetic WGS84 → UTM easting/northing (meters)."""
    lon0 = math.radians(zone * 6 - 183)
    phi = math.radians(lat)
    dlam = math.radians(lon) - lon0
    s = math.sin(phi)
    # Conformal latitude via its tangent (exact).
    t = math.sinh(
        math.atanh(s) - _E * math.atanh(_E * s)
    )
    xi_p = math.atan2(t, math.cos(dlam))
    eta_p = math.asinh(
        math.sin(dlam) / math.hypot(t, math.cos(dlam))
    )
    xi = xi_p
    eta = eta_p
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * math.sin(2 * j * xi_p) * math.cosh(2 * j * eta_p)
        eta += a * math.cos(2 * j * xi_p) * math.sinh(2 * j * eta_p)
    easting = 500000.0 + k0 * _ABAR * eta
    northing = (10000000.0 if south else 0.0) + k0 * _ABAR * xi
    return easting, northing


def utm_inverse(
    easting: float,
    northing: float,
    zone: int = 19,
    south: bool = True,
    k0: float = 0.9996,
) -> tuple[float, float]:
    """UTM easting/northing → geodetic WGS84 (lat, lon) degrees."""
    lon0 = math.radians(zone * 6 - 183)
    xi = (northing - (10000000.0 if south else 0.0)) / (k0 * _ABAR)
    eta = (easting - 500000.0) / (k0 * _ABAR)
    xi_p = xi
    eta_p = eta
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        eta_p -= b * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
    chi = math.asin(math.sin(xi_p) / math.cosh(eta_p))
    phi = chi
    for j, d in enumerate(_DELTA, start=1):
        phi += d * math.sin(2 * j * chi)
    dlam = math.atan2(math.sinh(eta_p), math.cos(xi_p))
    return math.degrees(phi), math.degrees(lon0 + dlam)


def webmercator_to_geodetic(x: float, y: float) -> tuple[float, float]:
    """EPSG:3857 (spherical, radius = WGS84 semi-major) → (lat, lon)
    degrees. The 'auxiliary sphere' projection treats the ellipsoid
    as a sphere, so the inverse is exact closed form."""
    lon = math.degrees(x / _A)
    lat = math.degrees(math.atan(math.sinh(y / _A)))
    return lat, lon


def geodetic_to_webmercator(lat: float, lon: float) -> tuple[float, float]:
    x = _A * math.radians(lon)
    y = _A * math.asinh(math.tan(math.radians(lat)))
    return x, y


# --- file parsing ------------------------------------------------------


@dataclass
class ShapeRecord:
    """One .shp record: rings of (x, y) points in file order."""

    shape_type: int
    rings: list[list[tuple[float, float]]]


def read_dbf(path: str, encoding: str | None = None) -> list[dict]:
    """dBASE III attribute table → list of row dicts. Numeric (N/F)
    fields parse to int/float, D stays an 8-char string, L → bool,
    C → stripped str; deleted rows ('*' flag) are skipped."""
    with open(path, "rb") as fh:
        raw = fh.read()
    n_records = struct.unpack_from("<I", raw, 4)[0]
    header_len, record_len = struct.unpack_from("<HH", raw, 8)
    if encoding is None:
        cpg = os.path.splitext(path)[0] + ".CPG"
        if not os.path.exists(cpg):
            cpg = os.path.splitext(path)[0] + ".cpg"
        if os.path.exists(cpg):
            with open(cpg, "rb") as fh:
                encoding = fh.read().decode("ascii", "ignore").strip()
        encoding = encoding or "latin-1"
    fields = []
    off = 32
    while off < header_len - 1 and raw[off] != 0x0D:
        name = raw[off : off + 11].split(b"\x00", 1)[0].decode("ascii")
        ftype = chr(raw[off + 11])
        flen = raw[off + 16]
        fields.append((name, ftype, flen))
        off += 32
    rows = []
    for i in range(n_records):
        base = header_len + i * record_len
        if base >= len(raw) or raw[base : base + 1] == b"*":
            continue
        pos = base + 1
        row = {}
        for name, ftype, flen in fields:
            cell = raw[pos : pos + flen]
            pos += flen
            if ftype in ("N", "F"):
                txt = cell.decode("ascii", "ignore").strip()
                if not txt:
                    row[name] = None
                elif ftype == "N" and "." not in txt:
                    row[name] = int(txt)
                else:
                    row[name] = float(txt)
            elif ftype == "L":
                row[name] = cell[:1] in b"YyTt"
            else:
                row[name] = cell.decode(encoding, "replace").strip()
        rows.append(row)
    return rows


def read_shx(path: str) -> list[tuple[int, int]]:
    """.shx index → [(record offset, content length)] in bytes."""
    with open(path, "rb") as fh:
        raw = fh.read()
    out = []
    for off in range(100, len(raw), 8):
        o, ln = struct.unpack_from(">ii", raw, off)
        out.append((o * 2, ln * 2))
    return out


def read_shp(path: str) -> list[ShapeRecord]:
    """.shp geometry file → polygon/polyline records (shape types 3,
    5; 15/25 parse by reading only the XY block). Null shapes (0)
    yield empty ring lists."""
    with open(path, "rb") as fh:
        raw = fh.read()
    if struct.unpack_from(">i", raw, 0)[0] != 9994:
        raise ValueError(f"{path}: not a shapefile (bad magic)")
    out = []
    off = 100
    while off < len(raw):
        _, content_words = struct.unpack_from(">ii", raw, off)
        body = off + 8
        shape_type = struct.unpack_from("<i", raw, body)[0]
        rings: list[list[tuple[float, float]]] = []
        if shape_type in (3, 5, 13, 15, 23, 25):
            n_parts, n_points = struct.unpack_from("<ii", raw, body + 36)
            parts = list(
                struct.unpack_from(f"<{n_parts}i", raw, body + 44)
            )
            pts_off = body + 44 + 4 * n_parts
            flat = struct.unpack_from(f"<{2 * n_points}d", raw, pts_off)
            pts = [
                (flat[2 * i], flat[2 * i + 1]) for i in range(n_points)
            ]
            bounds = parts + [n_points]
            rings = [
                pts[bounds[i] : bounds[i + 1]]
                for i in range(n_parts)
            ]
        elif shape_type == 1:  # point
            x, y = struct.unpack_from("<2d", raw, body + 4)
            rings = [[(x, y)]]
        out.append(ShapeRecord(shape_type, rings))
        off = body + content_words * 2
    return out


def polygon_centroid(
    rings: list[list[tuple[float, float]]],
) -> tuple[float, float]:
    """Area-weighted centroid of a polygon (all rings, signed
    shoelace — holes wind opposite to shells and subtract). Falls
    back to the vertex mean for degenerate (zero-area) input."""
    a2 = cx = cy = 0.0
    for ring in rings:
        for (x0, y0), (x1, y1) in zip(ring, ring[1:]):
            cross = x0 * y1 - x1 * y0
            a2 += cross
            cx += (x0 + x1) * cross
            cy += (y0 + y1) * cross
    if a2 == 0.0:
        pts = [p for ring in rings for p in ring]
        return (
            sum(p[0] for p in pts) / len(pts),
            sum(p[1] for p in pts) / len(pts),
        )
    return cx / (3.0 * a2), cy / (3.0 * a2)


def _detect_crs(shp_path: str) -> str:
    prj = os.path.splitext(shp_path)[0] + ".prj"
    if not os.path.exists(prj):
        return "geodetic"
    with open(prj, encoding="ascii", errors="ignore") as fh:
        wkt = fh.read()
    if "Mercator_Auxiliary_Sphere" in wkt or "3857" in wkt:
        return "webmercator"
    if "Transverse_Mercator" in wkt or "UTM" in wkt:
        return "utm"
    return "geodetic"


def shapefile_to_centroids(
    shp_path: str,
    name_field: str,
    filter_field: str | None = None,
    filter_value: object | None = None,
    zone: int = 19,
    south: bool = True,
) -> list[dict]:
    """temperaturas_rm.py:106-119 in-engine: parse the shapefile,
    optionally filter attributes (codregion == 13), reproject rings
    to UTM, take the planar centroid there (matching geopandas'
    "centroid in a projected CRS" discipline), and return
    [{name_field, lat_centroid, lon_centroid}] in WGS84.

    Source CRS is sniffed from the ``.prj`` sidecar (the reference
    snapshot's layer is Web-Mercator); geodetic and already-UTM
    layers pass through the right branch.
    """
    crs = _detect_crs(shp_path)
    shapes = read_shp(shp_path)
    attrs = read_dbf(os.path.splitext(shp_path)[0] + ".dbf")
    if len(shapes) != len(attrs):
        raise ValueError(
            f"{shp_path}: {len(shapes)} shapes vs {len(attrs)} "
            "attribute rows"
        )
    out = []
    for shape, row in zip(shapes, attrs):
        if filter_field is not None and row.get(filter_field) != (
            filter_value
        ):
            continue
        if not shape.rings:
            continue
        utm_rings = []
        for ring in shape.rings:
            pts = []
            for x, y in ring:
                if crs == "webmercator":
                    lat, lon = webmercator_to_geodetic(x, y)
                    pts.append(utm_forward(lat, lon, zone, south))
                elif crs == "geodetic":
                    pts.append(utm_forward(y, x, zone, south))
                else:
                    pts.append((x, y))
            utm_rings.append(pts)
        ce, cn = polygon_centroid(utm_rings)
        lat, lon = utm_inverse(ce, cn, zone, south)
        out.append(
            {
                name_field: row.get(name_field),
                "lat_centroid": lat,
                "lon_centroid": lon,
            }
        )
    return out
