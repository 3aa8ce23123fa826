"""Geometry functions: WKT/WKB codec, planar ops, CRS transform.

The reference leans on DuckDB-spatial's ST_* family
(sql/migrations/003_db_makros.sql; 004_staging_transform_template.sql:
23-63). Vanilla Spark has no geometry type, so the engine models
geometry as WKB bytes / WKT text in ordinary columns and computes
with Arrow-batched pandas UDFs (SURVEY §2.7 "Spatial").

shapely/pyproj are NOT available in this container, so this module
ships a self-contained implementation built only on public formulas:

- WKT + WKB (ISO) parse/write for Point / LineString / Polygon /
  MultiPolygon / MultiLineString / MultiPoint
- centroid, representative point (≙ ST_PointOnSurface), shoelace
  area, length, geometry type, bbox, point-in-polygon, segment
  intersection, validity check (ring self-intersection) and a
  documented make_valid fallback
- SWEREF99 TM (EPSG:3006) ↔ WGS84 via the Karney–Krüger transverse
  Mercator series (the standard published formulation)

If shapely IS importable the repair path upgrades to
``shapely.make_valid`` automatically (import-try at call time); the
rest is exact arithmetic that needs no library.

Geometries are modeled as ``(type, coords)`` tuples:
  Point       -> ("Point", (x, y))
  LineString  -> ("LineString", [(x, y), ...])
  Polygon     -> ("Polygon", [ring, ...])        ring = [(x, y), ...]
  Multi*      -> ("MultiX", [coords_of_X, ...])
"""

from __future__ import annotations

import math
import struct
from typing import Any, Sequence

Geometry = tuple[str, Any]

# --------------------------------------------------------------------------
# WKT codec
# --------------------------------------------------------------------------


def _fmt_pt(p: Sequence[float]) -> str:
    return f"{p[0]:.9g} {p[1]:.9g}"


def to_wkt(geom: Geometry) -> str:
    t, c = geom
    if t == "Point":
        return f"POINT ({_fmt_pt(c)})"
    if t == "LineString":
        return "LINESTRING (" + ", ".join(_fmt_pt(p) for p in c) + ")"
    if t == "Polygon":
        rings = ", ".join("(" + ", ".join(_fmt_pt(p) for p in ring) + ")" for ring in c)
        return f"POLYGON ({rings})"
    if t == "MultiPoint":
        return "MULTIPOINT (" + ", ".join("(" + _fmt_pt(p) + ")" for p in c) + ")"
    if t == "MultiLineString":
        parts = ", ".join("(" + ", ".join(_fmt_pt(p) for p in ls) + ")" for ls in c)
        return f"MULTILINESTRING ({parts})"
    if t == "MultiPolygon":
        polys = ", ".join(
            "(" + ", ".join("(" + ", ".join(_fmt_pt(p) for p in ring) + ")" for ring in poly) + ")"
            for poly in c
        )
        return f"MULTIPOLYGON ({polys})"
    raise ValueError(f"unsupported geometry type: {t}")


def _parse_coords(body: str) -> list[tuple[float, float]]:
    pts = []
    for pair in body.split(","):
        parts = pair.strip().split()
        pts.append((float(parts[0]), float(parts[1])))
    return pts


def _split_groups(body: str) -> list[str]:
    """Split '(...), (...)' at top parenthesis level."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                groups.append(body[start:i])
    return groups


def from_wkt(wkt: str) -> Geometry:
    s = wkt.strip()
    upper = s.upper()
    if upper.startswith("POINT"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        return ("Point", _parse_coords(body)[0])
    if upper.startswith("LINESTRING"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        return ("LineString", _parse_coords(body))
    if upper.startswith("POLYGON"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        return ("Polygon", [_parse_coords(g) for g in _split_groups(body)])
    if upper.startswith("MULTIPOINT"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        if "(" in body:
            return ("MultiPoint", [_parse_coords(g)[0] for g in _split_groups(body)])
        return ("MultiPoint", _parse_coords(body))
    if upper.startswith("MULTILINESTRING"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        return ("MultiLineString", [_parse_coords(g) for g in _split_groups(body)])
    if upper.startswith("MULTIPOLYGON"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        polys = [
            [_parse_coords(g) for g in _split_groups(poly_body)]
            for poly_body in _split_groups(body)
        ]
        return ("MultiPolygon", polys)
    raise ValueError(f"cannot parse WKT: {wkt[:60]}")


# --------------------------------------------------------------------------
# WKB codec (ISO little-endian)
# --------------------------------------------------------------------------

_WKB_TYPES = {
    "Point": 1,
    "LineString": 2,
    "Polygon": 3,
    "MultiPoint": 4,
    "MultiLineString": 5,
    "MultiPolygon": 6,
}
_WKB_NAMES = {v: k for k, v in _WKB_TYPES.items()}


def to_wkb(geom: Geometry) -> bytes:
    t, c = geom
    out = [b"\x01", struct.pack("<I", _WKB_TYPES[t])]
    if t == "Point":
        out.append(struct.pack("<2d", *c))
    elif t == "LineString":
        out.append(struct.pack("<I", len(c)))
        for p in c:
            out.append(struct.pack("<2d", *p))
    elif t == "Polygon":
        out.append(struct.pack("<I", len(c)))
        for ring in c:
            out.append(struct.pack("<I", len(ring)))
            for p in ring:
                out.append(struct.pack("<2d", *p))
    elif t in ("MultiPoint", "MultiLineString", "MultiPolygon"):
        inner = {"MultiPoint": "Point", "MultiLineString": "LineString",
                 "MultiPolygon": "Polygon"}[t]
        out.append(struct.pack("<I", len(c)))
        for part in c:
            out.append(to_wkb((inner, part)))
    else:
        raise ValueError(f"unsupported geometry type: {t}")
    return b"".join(out)


def from_wkb(data: bytes) -> Geometry:
    geom, _ = _read_wkb(memoryview(data), 0)
    return geom


def _read_wkb(mv: memoryview, off: int) -> tuple[Geometry, int]:
    little = mv[off] == 1
    fmt = "<" if little else ">"
    (type_code,) = struct.unpack_from(fmt + "I", mv, off + 1)
    type_code &= 0xFF  # strip Z/M/SRID flags
    t = _WKB_NAMES[type_code]
    off += 5
    if t == "Point":
        x, y = struct.unpack_from(fmt + "2d", mv, off)
        return ("Point", (x, y)), off + 16
    if t == "LineString":
        (n,) = struct.unpack_from(fmt + "I", mv, off)
        off += 4
        pts = [struct.unpack_from(fmt + "2d", mv, off + 16 * i) for i in range(n)]
        return ("LineString", [tuple(p) for p in pts]), off + 16 * n
    if t == "Polygon":
        (nr,) = struct.unpack_from(fmt + "I", mv, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(fmt + "I", mv, off)
            off += 4
            ring = [tuple(struct.unpack_from(fmt + "2d", mv, off + 16 * i)) for i in range(n)]
            rings.append(ring)
            off += 16 * n
        return ("Polygon", rings), off
    # Multi*
    (n,) = struct.unpack_from(fmt + "I", mv, off)
    off += 4
    parts = []
    for _ in range(n):
        part, off = _read_wkb(mv, off)
        parts.append(part[1])
    return (t, parts), off


# --------------------------------------------------------------------------
# Planar measures
# --------------------------------------------------------------------------


def geometry_type(geom: Geometry) -> str:
    """≙ ST_GeometryType — returns POINT/LINESTRING/POLYGON/MULTI*."""
    return geom[0].upper()


def ring_area(ring: Sequence[tuple[float, float]]) -> float:
    """Signed shoelace area (positive = counter-clockwise)."""
    a = 0.0
    for i in range(len(ring) - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        a += x1 * y2 - x2 * y1
    return a / 2.0


def area(geom: Geometry) -> float:
    """≙ ST_Area: outer rings minus holes (planar units²)."""
    t, c = geom
    if t == "Polygon":
        return abs(ring_area(c[0])) - sum(abs(ring_area(r)) for r in c[1:])
    if t == "MultiPolygon":
        return sum(area(("Polygon", p)) for p in c)
    return 0.0


def length(geom: Geometry) -> float:
    t, c = geom
    if t == "LineString":
        return sum(math.dist(c[i], c[i + 1]) for i in range(len(c) - 1))
    if t == "MultiLineString":
        return sum(length(("LineString", ls)) for ls in c)
    return 0.0


def centroid(geom: Geometry) -> tuple[float, float]:
    """≙ ST_Centroid (area-weighted for polygons)."""
    t, c = geom
    if t == "Point":
        return c
    if t == "MultiPoint":
        return (sum(p[0] for p in c) / len(c), sum(p[1] for p in c) / len(c))
    if t == "LineString":
        sx = sy = sl = 0.0
        for i in range(len(c) - 1):
            seg = math.dist(c[i], c[i + 1])
            sx += (c[i][0] + c[i + 1][0]) / 2 * seg
            sy += (c[i][1] + c[i + 1][1]) / 2 * seg
            sl += seg
        if sl == 0:
            return c[0]
        return (sx / sl, sy / sl)
    if t == "MultiLineString":
        pts = [p for ls in c for p in ls]
        return centroid(("LineString", pts))
    if t == "Polygon":
        # Signed accumulation over ALL rings so holes subtract their
        # moment (matches area(), which already subtracts holes).
        # Stored winding is untrusted: normalize each ring to |area|,
        # then apply +1 for the outer ring, -1 for holes.
        a_total = 0.0
        cx = cy = 0.0
        for ri, ring in enumerate(c):
            a_r = ring_area(ring)
            if a_r == 0:
                continue
            scale = (1.0 if ri == 0 else -1.0) * (abs(a_r) / a_r)
            a_total += scale * a_r
            for i in range(len(ring) - 1):
                x1, y1 = ring[i]
                x2, y2 = ring[i + 1]
                cross = (x1 * y2 - x2 * y1) * scale
                cx += (x1 + x2) * cross
                cy += (y1 + y2) * cross
        if a_total == 0:
            ring = c[0]
            return centroid(("MultiPoint", ring[:-1] or ring))
        return (cx / (6 * a_total), cy / (6 * a_total))
    if t == "MultiPolygon":
        parts = [(area(("Polygon", p)), centroid(("Polygon", p))) for p in c]
        total = sum(a for a, _ in parts) or 1.0
        return (
            sum(a * p[0] for a, p in parts) / total,
            sum(a * p[1] for a, p in parts) / total,
        )
    raise ValueError(f"unsupported geometry type: {t}")


def point_in_polygon(pt: tuple[float, float], geom: Geometry) -> bool:
    """≙ ST_Intersects(point, polygon) via ray casting (holes honored)."""
    t, c = geom
    if t == "Polygon":
        if not _pt_in_ring(pt, c[0]):
            return False
        return not any(_pt_in_ring(pt, hole) for hole in c[1:])
    if t == "MultiPolygon":
        return any(point_in_polygon(pt, ("Polygon", p)) for p in c)
    return False


def _pt_in_ring(pt: tuple[float, float], ring: Sequence[tuple[float, float]]) -> bool:
    x, y = pt
    inside = False
    j = len(ring) - 1
    for i in range(len(ring)):
        xi, yi = ring[i]
        xj, yj = ring[j]
        if (yi > y) != (yj > y) and x < (xj - xi) * (y - yi) / (yj - yi) + xi:
            inside = not inside
        j = i
    return inside


def representative_point(geom: Geometry) -> tuple[float, float]:
    """≙ ST_PointOnSurface: a point guaranteed on the geometry.

    Polygons: centroid if interior, else scan midpoints of a
    horizontal chord through the bbox midline (the classic
    point-on-surface construction).
    """
    t, c = geom
    if t in ("Point", "MultiPoint", "LineString", "MultiLineString"):
        if t == "Point":
            return c
        if t == "MultiPoint":
            return c[0]
        if t == "LineString":
            mid = len(c) // 2
            return c[mid]
        return c[0][len(c[0]) // 2]
    cen = centroid(geom)
    if point_in_polygon(cen, geom):
        return cen
    # chord scan at the centroid's y
    xs: list[float] = []
    rings = c if t == "Polygon" else [r for poly in c for r in poly]
    y = cen[1]
    for ring in rings:
        for i in range(len(ring) - 1):
            (x1, y1), (x2, y2) = ring[i], ring[i + 1]
            if (y1 > y) != (y2 > y):
                xs.append(x1 + (y - y1) / (y2 - y1) * (x2 - x1))
    xs.sort()
    for i in range(0, len(xs) - 1, 2):
        mid = ((xs[i] + xs[i + 1]) / 2, y)
        if point_in_polygon(mid, geom):
            return mid
    return cen


def distance(a: Geometry, b: Geometry) -> float:
    """≙ ST_Distance for point-vs-point/line/polygon (the shapes the
    reference queries use, examples:184-188)."""
    if a[0] != "Point":
        a, b = b, a
    if a[0] != "Point":
        raise ValueError("distance supports point-vs-geometry")
    p = a[1]
    t, c = b
    if t == "Point":
        return math.dist(p, c)
    if t == "MultiPoint":
        return min(math.dist(p, q) for q in c)
    if t == "LineString":
        return min(_pt_seg_dist(p, c[i], c[i + 1]) for i in range(len(c) - 1))
    if t == "MultiLineString":
        return min(distance(a, ("LineString", ls)) for ls in c)
    if t in ("Polygon", "MultiPolygon"):
        if point_in_polygon(p, b):
            return 0.0
        rings = c if t == "Polygon" else [r for poly in c for r in poly]
        return min(
            _pt_seg_dist(p, ring[i], ring[i + 1])
            for ring in rings
            for i in range(len(ring) - 1)
        )
    raise ValueError(f"unsupported geometry type: {t}")


def _pt_seg_dist(p, a, b) -> float:
    ax, ay = a
    bx, by = b
    px, py = p
    dx, dy = bx - ax, by - ay
    if dx == dy == 0:
        return math.dist(p, a)
    t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / (dx * dx + dy * dy)))
    return math.dist(p, (ax + t * dx, ay + t * dy))


# --------------------------------------------------------------------------
# Validity / repair (≙ ST_IsValid / ST_MakeValid, 003:25-30)
# --------------------------------------------------------------------------


def _segs_cross(p1, p2, p3, p4) -> bool:
    """Proper intersection of open segments (shared endpoints ok)."""

    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    o1, o2 = orient(p1, p2, p3), orient(p1, p2, p4)
    o3, o4 = orient(p3, p4, p1), orient(p3, p4, p2)
    return o1 != o2 and o3 != o4 and 0 not in (o1, o2, o3, o4)


def is_valid(geom: Geometry) -> bool:
    """Ring self-intersection check for polygons (the validity issue
    the reference's fixtures exercise: bowtie quads, FIXTURES.md A1)."""
    t, c = geom
    if t == "Polygon":
        for ring in c:
            n = len(ring) - 1
            if n < 3:
                return False
            for i in range(n):
                for j in range(i + 1, n):
                    if abs(i - j) in (0, 1) or (i == 0 and j == n - 1):
                        continue
                    if _segs_cross(ring[i], ring[i + 1], ring[j], ring[j + 1]):
                        return False
        return True
    if t == "MultiPolygon":
        return all(is_valid(("Polygon", p)) for p in c)
    return True


def make_valid(geom: Geometry) -> Geometry:
    """≙ ST_MakeValid (003:25-30) / buffer(0) repair
    (zip_geopackage.py:327-343).

    Upgrades to shapely.make_valid when shapely is importable;
    otherwise repairs self-intersecting rings with their convex hull —
    a documented approximation adequate for the bowtie-quad fixtures
    (SURVEY §7 sharp edge #4: different-but-both-valid outputs are
    expected between repair implementations).
    """
    if is_valid(geom):
        return geom
    try:  # pragma: no cover - shapely not in this container
        import shapely
        import shapely.validation
        from shapely import wkt as swkt

        repaired = shapely.validation.make_valid(swkt.loads(to_wkt(geom)))
        return from_wkt(repaired.wkt)
    except ImportError:
        pass
    t, c = geom
    if t == "Polygon":
        return ("Polygon", [_convex_hull(c[0])])
    if t == "MultiPolygon":
        return ("MultiPolygon", [[_convex_hull(p[0])] for p in c])
    return geom


def _convex_hull(pts: Sequence[tuple[float, float]]) -> list[tuple[float, float]]:
    """Andrew's monotone chain; returns a closed ring."""
    pts = sorted(set(pts))
    if len(pts) <= 2:
        return list(pts) + list(pts[:1])

    def half(points):
        out: list[tuple[float, float]] = []
        for p in points:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
            ) <= 0:
                out.pop()
            out.append(p)
        return out

    lower, upper = half(pts), half(list(reversed(pts)))
    ring = lower[:-1] + upper[:-1]
    return ring + ring[:1]


# --------------------------------------------------------------------------
# SWEREF99 TM (EPSG:3006) <-> WGS84 — Karney–Krüger series
# --------------------------------------------------------------------------
# GRS80 ellipsoid; central meridian 15°E, k0 = 0.9996, FE = 500000.
# Series coefficients to n^4 give sub-mm accuracy in Sweden.

_A_GRS80 = 6378137.0
_F_GRS80 = 1.0 / 298.257222101
_N = _F_GRS80 / (2.0 - _F_GRS80)
_A_CAP = _A_GRS80 / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0)
_K0 = 0.9996
_FE = 500000.0
_LON0 = math.radians(15.0)

_ALPHA = (
    _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16 + 41 * _N**4 / 180,
    13 * _N**2 / 48 - 3 * _N**3 / 5 + 557 * _N**4 / 1440,
    61 * _N**3 / 240 - 103 * _N**4 / 140,
    49561 * _N**4 / 161280,
)
_BETA = (
    _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96 - _N**4 / 360,
    _N**2 / 48 + _N**3 / 15 - 437 * _N**4 / 1440,
    17 * _N**3 / 480 - 37 * _N**4 / 840,
    4397 * _N**4 / 161280,
)
_DELTA = (
    2 * _N - 2 * _N**2 / 3 - 2 * _N**3 + 116 * _N**4 / 45,
    7 * _N**2 / 3 - 8 * _N**3 / 5 - 227 * _N**4 / 45,
    56 * _N**3 / 15 - 136 * _N**4 / 35,
    4279 * _N**4 / 630,
)
_E2 = _F_GRS80 * (2 - _F_GRS80)
_E = math.sqrt(_E2)


def sweref99_to_wgs84(easting: float, northing: float) -> tuple[float, float]:
    """EPSG:3006 (E, N) -> (lat, lng) degrees."""
    xi = northing / (_K0 * _A_CAP)
    eta = (easting - _FE) / (_K0 * _A_CAP)
    xi_p, eta_p = xi, eta
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        eta_p -= b * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
    chi = math.asin(math.sin(xi_p) / math.cosh(eta_p))
    lat = chi
    for j, d in enumerate(_DELTA, start=1):
        lat += d * math.sin(2 * j * chi)
    lng = _LON0 + math.atan2(math.sinh(eta_p), math.cos(xi_p))
    return (math.degrees(lat), math.degrees(lng))


def wgs84_to_sweref99(lat: float, lng: float) -> tuple[float, float]:
    """(lat, lng) degrees -> EPSG:3006 (E, N)."""
    phi = math.radians(lat)
    lam = math.radians(lng) - _LON0
    # conformal latitude
    t = math.sinh(
        math.atanh(math.sin(phi)) - _E * math.atanh(_E * math.sin(phi))
    )
    xi_p = math.atan2(t, math.cos(lam))
    eta_p = math.atanh(math.sin(lam) / math.hypot(1.0, t))
    xi, eta = xi_p, eta_p
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * math.sin(2 * j * xi_p) * math.cosh(2 * j * eta_p)
        eta += a * math.cos(2 * j * xi_p) * math.sinh(2 * j * eta_p)
    return (_FE + _K0 * _A_CAP * eta, _K0 * _A_CAP * xi)


def transform_geom(geom: Geometry, fn) -> Geometry:
    """Apply a coordinate transform (x,y)->(x,y) to every vertex."""
    t, c = geom
    if t == "Point":
        return (t, fn(c))
    if t in ("LineString", "MultiPoint"):
        return (t, [fn(p) for p in c])
    if t in ("Polygon", "MultiLineString"):
        return (t, [[fn(p) for p in part] for part in c])
    if t == "MultiPolygon":
        return (t, [[[fn(p) for p in ring] for ring in poly] for poly in c])
    raise ValueError(f"unsupported geometry type: {t}")


def sweref_geom_to_wgs84(geom: Geometry) -> Geometry:
    """≙ g_to_wgs84 (003:12-23) — note the reference needed PROJ4
    strings to dodge a DuckDB bug (architecture.md:383-393); we
    transform directly."""

    def fn(p):
        lat, lng = sweref99_to_wgs84(p[0], p[1])
        return (lng, lat)  # geometries store (x=lng, y=lat)

    return transform_geom(geom, fn)


# --------------------------------------------------------------------------
# Buffering (≙ ST_Buffer; line branch of 004:53-54, examples:165-178)
# --------------------------------------------------------------------------


def buffer_point(
    pt: tuple[float, float], radius: float, n_segments: int = 32
) -> Geometry:
    """Circular buffer around a point as a regular n-gon polygon
    (≙ ST_Buffer(point, r) — the buffered-point query input,
    sql/examples/h3_polygon_queries.sql:165-178)."""
    x, y = pt
    ring = [
        (
            x + radius * math.cos(2 * math.pi * i / n_segments),
            y + radius * math.sin(2 * math.pi * i / n_segments),
        )
        for i in range(n_segments)
    ]
    ring.append(ring[0])
    return ("Polygon", [ring])


def buffer_line(
    coords: Sequence[tuple[float, float]], radius: float, n_segments: int = 16
) -> Geometry:
    """Approximate line buffer: convex hull of circles sampled along
    the line (≙ the ST_Buffer(line, 10 m) branch of the cell
    dispatch, 004:53-54). Exact for convex paths; an approximation
    (hull) for concave ones — adequate for cell coverage, and
    upgraded automatically when shapely is importable."""
    try:  # pragma: no cover - shapely absent in this container
        import shapely
        from shapely import wkt as swkt

        g = swkt.loads(to_wkt(("LineString", list(coords)))).buffer(radius)
        return from_wkt(g.wkt)
    except ImportError:
        pass
    pts: list[tuple[float, float]] = []
    step = max(radius / 2.0, 1e-9)
    sampled = [coords[0]]
    for i in range(len(coords) - 1):
        a, b = coords[i], coords[i + 1]
        seg = math.dist(a, b)
        n = max(int(seg / step), 1)
        for j in range(1, n + 1):
            t = j / n
            sampled.append((a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1])))
    for cx, cy in sampled:
        for i in range(n_segments):
            pts.append(
                (
                    cx + radius * math.cos(2 * math.pi * i / n_segments),
                    cy + radius * math.sin(2 * math.pi * i / n_segments),
                )
            )
    return ("Polygon", [_convex_hull(pts)])


def clip_polygon(geom: Geometry, clip_ring: Sequence[tuple[float, float]]) -> Geometry | None:
    """≙ ST_Intersection(geom, convex_polygon) — Sutherland–Hodgman
    clipping (the standard published algorithm). ``clip_ring`` must be
    CONVEX (query windows — bboxes, buffered points, map viewports —
    are); subject polygons may be arbitrary simple polygons. Holes are
    clipped independently. Returns None when the intersection is
    empty.
    """
    ring = list(clip_ring)
    if ring[0] == ring[-1]:
        ring = ring[:-1]
    if ring_area(ring + [ring[0]]) < 0:  # normalize clip to CCW
        ring = ring[::-1]

    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= 0

    def isect(p, q, a, b):
        x1, y1 = p; x2, y2 = q; x3, y3 = a; x4, y4 = b
        den = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
        if den == 0:
            return q
        t = ((x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)) / den
        return (x1 + t * (x2 - x1), y1 + t * (y2 - y1))

    def clip_one(subject: Sequence[tuple[float, float]]):
        out = list(subject)
        if out and out[0] == out[-1]:
            out = out[:-1]
        for i in range(len(ring)):
            a, b = ring[i], ring[(i + 1) % len(ring)]
            if not out:
                return None
            nxt = []
            for j in range(len(out)):
                p, q = out[j], out[(j + 1) % len(out)]
                pin, qin = inside(p, a, b), inside(q, a, b)
                if pin:
                    nxt.append(p)
                    if not qin:
                        nxt.append(isect(p, q, a, b))
                elif qin:
                    nxt.append(isect(p, q, a, b))
            out = nxt
        if len(out) < 3:
            return None
        return out + [out[0]]

    t, c = geom
    if t == "Polygon":
        outer = clip_one(c[0])
        if outer is None:
            return None
        rings = [outer]
        for hole in c[1:]:
            ch = clip_one(hole)
            if ch is not None:
                rings.append(ch)
        return ("Polygon", rings)
    if t == "MultiPolygon":
        parts = []
        for poly in c:
            clipped = clip_polygon(("Polygon", poly), clip_ring)
            if clipped is not None:
                parts.append(clipped[1])
        if not parts:
            return None
        return ("MultiPolygon", parts)
    raise ValueError(f"clip_polygon supports polygons, got {t}")


def intersection_area(geom: Geometry, clip_ring: Sequence[tuple[float, float]]) -> float:
    """Area of geom ∩ convex clip polygon (0.0 when disjoint)."""
    clipped = clip_polygon(geom, clip_ring)
    return 0.0 if clipped is None else area(clipped)


def triangulate(ring: Sequence[tuple[float, float]]) -> list[list[tuple[float, float]]]:
    """Ear-clipping triangulation of a SIMPLE polygon ring (convex or
    nonconvex, no holes) — the standard published O(n²) algorithm.
    Returns a list of CCW triangles partitioning the polygon.
    """
    pts = list(ring)
    if pts[0] == pts[-1]:
        pts = pts[:-1]
    if ring_area(pts + [pts[0]]) < 0:  # normalize to CCW
        pts = pts[::-1]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def in_triangle(p, a, b, c):
        # strict interior / edge containment for reflex-vertex checks
        d1, d2, d3 = cross(a, b, p), cross(b, c, p), cross(c, a, p)
        return d1 >= 0 and d2 >= 0 and d3 >= 0

    tris: list[list[tuple[float, float]]] = []
    idx = list(range(len(pts)))
    # each pass clips exactly one ear, so n-3 passes suffice for any
    # simple polygon — a fixed cap would silently fan-triangulate
    # (wrongly, if nonconvex) the remainder of large rings. The
    # for-else below still catches genuinely degenerate input.
    guard = 0
    while len(idx) > 3 and guard < len(pts):
        guard += 1
        n = len(idx)
        for k in range(n):
            i0, i1, i2 = idx[(k - 1) % n], idx[k], idx[(k + 1) % n]
            a, b, c = pts[i0], pts[i1], pts[i2]
            if cross(a, b, c) <= 0:  # reflex or collinear — not an ear
                continue
            if any(
                in_triangle(pts[j], a, b, c)
                for j in idx
                if j not in (i0, i1, i2)
            ):
                continue
            tris.append([a, b, c])
            del idx[k]
            break
        else:
            # numerically stuck (degenerate input): fan out the rest
            break
    if len(idx) == 3:
        tris.append([pts[idx[0]], pts[idx[1]], pts[idx[2]]])
    else:  # degenerate remainder: fan from the first vertex
        for k in range(1, len(idx) - 1):
            tris.append([pts[idx[0]], pts[idx[k]], pts[idx[k + 1]]])
    return tris


def intersection_area_any(
    geom: Geometry, clip_ring: Sequence[tuple[float, float]]
) -> float:
    """Area of geom ∩ ARBITRARY simple clip polygon: ear-clip the
    window into triangles (each convex), Sutherland–Hodgman the
    subject against each, and sum — the triangles partition the
    window, so shared edges contribute zero area. Lifts
    `intersection_area`'s convex-window restriction (NEXT.md item 1).
    """
    return sum(intersection_area(geom, tri) for tri in triangulate(clip_ring))


class _GHVertex:
    """Greiner–Hormann traversal node (doubly-linked ring vertex)."""

    __slots__ = ("pt", "next", "prev", "intersect", "neighbor", "entry", "visited", "alpha")

    def __init__(self, pt, alpha=0.0, intersect=False):
        self.pt = pt
        self.next = None
        self.prev = None
        self.intersect = intersect
        self.neighbor = None
        self.entry = False
        self.visited = False
        self.alpha = alpha


def _gh_ring(pts) -> "_GHVertex":
    first = None
    prev = None
    for p in pts:
        v = _GHVertex(p)
        if first is None:
            first = v
        else:
            prev.next = v
            v.prev = prev
        prev = v
    prev.next = first
    first.prev = prev
    return first


def _gh_vertices(first):
    v = first
    while True:
        yield v
        v = v.next
        if v is first:
            return


def _gh_insert(start, end, vtx):
    """Insert intersection vtx between start and end (alpha-ordered
    among existing intersection nodes on that edge)."""
    cur = start
    while cur.next is not end and cur.next.alpha <= vtx.alpha:
        cur = cur.next
    vtx.next = cur.next
    vtx.prev = cur
    cur.next.prev = vtx
    cur.next = vtx


class _GHDegenerate(Exception):
    pass


def _close_ring(pts):
    pts = list(pts)
    if pts[0] != pts[-1]:
        pts.append(pts[0])
    return pts


def _open_ccw(ring):
    pts = list(ring)
    if pts[0] == pts[-1]:
        pts = pts[:-1]
    if ring_area(pts + [pts[0]]) < 0:
        pts = pts[::-1]
    return pts


def _gh_union_once(a_pts, b_pts) -> list[list[tuple[float, float]]]:
    """One Greiner–Hormann union pass over two open CCW rings.
    Raises _GHDegenerate on non-transversal intersections (vertex on
    edge, collinear overlap) — the caller perturbs and retries."""
    eps = 1e-11
    sub = _gh_ring(a_pts)
    clp = _gh_ring(b_pts)

    # 1. pairwise edge intersections, inserted into both rings
    n_inter = 0
    for sv in [v for v in _gh_vertices(sub) if not v.intersect]:
        se = sv.next
        while se.intersect:
            se = se.next
        for cv in [v for v in _gh_vertices(clp) if not v.intersect]:
            ce = cv.next
            while ce.intersect:
                ce = ce.next
            p1, p2, q1, q2 = sv.pt, se.pt, cv.pt, ce.pt
            den = (p2[0] - p1[0]) * (q2[1] - q1[1]) - (p2[1] - p1[1]) * (q2[0] - q1[0])
            if abs(den) < 1e-30:
                # parallel: overlapping collinear edges are degenerate
                if _pt_seg_dist(q1, p1, p2) < eps or _pt_seg_dist(q2, p1, p2) < eps:
                    raise _GHDegenerate("collinear edges")
                continue
            t = ((q1[0] - p1[0]) * (q2[1] - q1[1]) - (q1[1] - p1[1]) * (q2[0] - q1[0])) / den
            u = ((q1[0] - p1[0]) * (p2[1] - p1[1]) - (q1[1] - p1[1]) * (p2[0] - p1[0])) / den
            if -eps < t < eps or 1 - eps < t < 1 + eps or -eps < u < eps or 1 - eps < u < 1 + eps:
                if -eps < t < 1 + eps and -eps < u < 1 + eps:
                    raise _GHDegenerate("vertex-on-edge intersection")
                continue
            if not (0 < t < 1 and 0 < u < 1):
                continue
            pt = (p1[0] + t * (p2[0] - p1[0]), p1[1] + t * (p2[1] - p1[1]))
            iv_s = _GHVertex(pt, alpha=t, intersect=True)
            iv_c = _GHVertex(pt, alpha=u, intersect=True)
            iv_s.neighbor = iv_c
            iv_c.neighbor = iv_s
            _gh_insert(sv, se, iv_s)
            _gh_insert(cv, ce, iv_c)
            n_inter += 1

    if n_inter == 0:
        return []  # caller handles containment/disjoint
    if n_inter % 2 == 1:
        raise _GHDegenerate("odd intersection count")

    # 2. entry/exit marking (union parameterization: start flag is
    #    "entry" iff the ring's first vertex is INSIDE the other)
    a_poly = ("Polygon", [_close_ring(a_pts)])
    b_poly = ("Polygon", [_close_ring(b_pts)])
    for first, other in ((sub, b_poly), (clp, a_poly)):
        entry = point_in_polygon(first.pt, other)
        for v in _gh_vertices(first):
            if v.intersect:
                v.entry = entry
                entry = not entry

    # 3. traversal: forward through entries, backward through exits,
    #    switching rings at every intersection
    rings: list[list[tuple[float, float]]] = []
    unvisited = [v for v in _gh_vertices(sub) if v.intersect]
    for start in unvisited:
        if start.visited:
            continue
        ring = [start.pt]
        node = start
        guard = 0
        max_steps = 4 * (len(a_pts) + len(b_pts) + 2 * n_inter)
        while True:
            node.visited = True
            node.neighbor.visited = True
            # forward through an entry, backward through an exit,
            # until the next intersection on the current ring
            forward = node.entry
            while True:
                node = node.next if forward else node.prev
                guard += 1
                if guard > max_steps:
                    raise _GHDegenerate("traversal did not close")
                if node.intersect:
                    break
                ring.append(node.pt)
            # switch rings at the intersection; closed when we are
            # back at the start node (on either ring)
            if node is start or node.neighbor is start:
                break
            ring.append(node.pt)
            node = node.neighbor
        if len(ring) >= 3:
            rings.append(_close_ring(ring))
    return rings


def polygon_union(a: Geometry, b: Geometry) -> Geometry:
    """Union SHAPE of two simple hole-free polygons (NEXT.md item 1 —
    beyond ``union_area``'s measure): Greiner–Hormann clipping
    (published algorithm, Greiner & Hormann TOG 1998) with the union
    entry/exit parameterization.

    Degenerate configurations (shared vertices, vertex-on-edge,
    collinear overlapping edges) are handled by deterministically
    perturbing B by ~1e-9 of the bbox span and retrying — the result
    is exact for transversal inputs and correct to the perturbation
    scale otherwise (snap-rounding semantics).

    Returns ("Polygon", [outer, hole...]) or ("MultiPolygon", ...)
    for disjoint inputs. Driver-side by design, like the rest of the
    geometry family: polygons are bounded per-row payloads; the
    distributed story is a pandas-UDF map over rows.
    """
    for t, c in (a, b):
        if t != "Polygon":
            raise ValueError(f"polygon_union supports Polygon, got {t}")
        if len(c) > 1:
            raise ValueError("polygon_union supports hole-free input polygons")
    for label, g in (("a", a), ("b", b)):
        if not is_valid(g):
            # a self-intersecting ring would traverse to silent garbage;
            # refuse loudly (repair first: make_valid, the P3 stage)
            raise ValueError(
                f"polygon_union: input {label} is not a simple polygon "
                "(self-intersecting ring) — repair with make_valid first"
            )
    a_pts = _open_ccw(a[1][0])
    span = max(
        max(p[0] for p in a_pts) - min(p[0] for p in a_pts),
        max(p[1] for p in a_pts) - min(p[1] for p in a_pts),
        1.0,
    )
    rings: list[list[tuple[float, float]]] | None = None
    b_ring = _open_ccw(b[1][0])
    bcx = sum(p[0] for p in b_ring) / len(b_ring)
    bcy = sum(p[1] for p in b_ring) / len(b_ring)
    for attempt in range(7):
        if attempt == 0:
            b_pts = b_ring  # exact input first
        else:
            # EXPAND b slightly about its centroid (touching edges
            # become overlaps, so adjacency unions into one ring —
            # the closure semantics a union wants) plus a tiny
            # translation for identical-centroid pathologies
            s = 1.0 + 1e-9 * (4**attempt)
            jit = span * 1e-10 * (4**attempt)
            b_pts = [
                (bcx + (x - bcx) * s + jit, bcy + (y - bcy) * s + jit * 0.7)
                for x, y in b_ring
            ]
        try:
            rings = _gh_union_once(a_pts, b_pts)
            break
        except _GHDegenerate:
            continue
    if rings is None:
        raise ValueError("polygon_union: degenerate input (perturbation exhausted)")

    if not rings:  # no intersections: containment or disjoint
        if point_in_polygon(b[1][0][0], a):
            return a
        if point_in_polygon(a[1][0][0], b):
            return b
        return ("MultiPolygon", [[_close_ring(a[1][0])], [_close_ring(b[1][0])]])

    # classify traversal output by NESTING PARITY (robust to the
    # traversal's ring orientation): probe each ring with one of its
    # edge midpoints (on the ring, generically on no other ring) —
    # contained in an even number of other rings → outer boundary,
    # odd → hole of its innermost container.
    def _probe(r):
        return ((r[0][0] + r[1][0]) / 2.0, (r[0][1] + r[1][1]) / 2.0)

    containers: list[list[int]] = []
    for i, r in enumerate(rings):
        p = _probe(r)
        containers.append(
            [j for j, s in enumerate(rings) if j != i and _pt_in_ring(p, s)]
        )
    outer_idx = [i for i, c in enumerate(containers) if len(c) % 2 == 0]
    polys = {i: [rings[i] if ring_area(rings[i]) > 0 else rings[i][::-1]] for i in outer_idx}
    for i, c in enumerate(containers):
        if len(c) % 2 == 1:
            inner = min(
                (j for j in c if j in polys),
                key=lambda j: abs(ring_area(rings[j])),
                default=None,
            )
            hole = rings[i] if ring_area(rings[i]) < 0 else rings[i][::-1]
            if inner is not None:
                polys[inner].append(hole)
    out = list(polys.values())
    if len(out) == 1:
        return ("Polygon", out[0])
    return ("MultiPolygon", out)


def union_area(a: Geometry, b: Geometry) -> float:
    """Area of a ∪ b for simple polygons via inclusion–exclusion:
    |A| + |B| − |A∩B|, with the intersection measured by
    triangulating A's outer ring and clipping B against each
    triangle (intersection_area_any — both operands may be
    nonconvex). Holes in A are handled by subtracting their
    intersection with B from the overlap term."""
    t, c = a
    if t != "Polygon":
        raise ValueError(f"union_area supports Polygon, got {t}")
    overlap = intersection_area_any(b, c[0])
    for hole in c[1:]:
        overlap -= intersection_area_any(b, hole)
    return area(a) + area(b) - overlap
