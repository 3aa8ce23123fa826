"""Arrow-batched pandas UDFs over the pure-Python geometry core.

Geometry travels as WKB bytes in ordinary BinaryType columns; every
UDF here is scalar (one Python round-trip per Arrow batch, not per
row). These are the ONLY Python hot paths in the engine — everything
relational around them stays JVM-side.

≙ reference ST_*/h3_* usage in 004_staging_transform_template.sql:23-63
and 003_db_makros.sql.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
)

from g_etl_spark.functions import geo, grid


def _each(s: pd.Series, fn):
    return s.map(lambda v: None if v is None else fn(v))


@F.pandas_udf(BooleanType())
def st_is_valid(wkb: pd.Series) -> pd.Series:
    return _each(wkb, lambda b: geo.is_valid(geo.from_wkb(bytes(b))))


@F.pandas_udf(BinaryType())
def st_make_valid(wkb: pd.Series) -> pd.Series:
    """≙ g_validate_geom (003:25-30): NULL→NULL, valid→unchanged,
    invalid→repaired."""
    return _each(wkb, lambda b: geo.to_wkb(geo.make_valid(geo.from_wkb(bytes(b)))))


@F.pandas_udf(StringType())
def st_as_text(wkb: pd.Series) -> pd.Series:
    return _each(wkb, lambda b: geo.to_wkt(geo.from_wkb(bytes(b))))


@F.pandas_udf(BinaryType())
def st_geom_from_text(wkt: pd.Series) -> pd.Series:
    return _each(wkt, lambda t: geo.to_wkb(geo.from_wkt(t)))


@F.pandas_udf(StringType())
def st_geometry_type(wkb: pd.Series) -> pd.Series:
    return _each(wkb, lambda b: geo.geometry_type(geo.from_wkb(bytes(b))))


@F.pandas_udf(DoubleType())
def st_area(wkb: pd.Series) -> pd.Series:
    return _each(wkb, lambda b: geo.area(geo.from_wkb(bytes(b))))


@F.pandas_udf(DoubleType())
def centroid_lat_wgs84(wkb: pd.Series) -> pd.Series:
    """≙ `_centroid_lat = ST_Y(ST_Centroid(to_wgs84(geom)))` (004:43,
    003:42-49). Input geometry is SWEREF99; centroid computed planar
    then transformed (same order as the reference macro)."""

    def fn(b):
        cx, cy = geo.centroid(geo.from_wkb(bytes(b)))
        lat, _ = geo.sweref99_to_wgs84(cx, cy)
        return lat

    return _each(wkb, fn)


@F.pandas_udf(DoubleType())
def centroid_lng_wgs84(wkb: pd.Series) -> pd.Series:
    def fn(b):
        cx, cy = geo.centroid(geo.from_wkb(bytes(b)))
        _, lng = geo.sweref99_to_wgs84(cx, cy)
        return lng

    return _each(wkb, fn)


@F.pandas_udf(BinaryType())
def st_point_on_surface(wkb: pd.Series) -> pd.Series:
    """≙ ST_PointOnSurface (aab_ext_restr/001:27)."""
    return _each(
        wkb,
        lambda b: geo.to_wkb(("Point", geo.representative_point(geo.from_wkb(bytes(b))))),
    )


def _line_sample(coords, step: float):
    """Points every `step` units along a line (for line cell coverage)."""
    import math

    pts = [coords[0]]
    carry = 0.0
    for i in range(len(coords) - 1):
        a, b = coords[i], coords[i + 1]
        seg = math.dist(a, b)
        if seg == 0:
            continue
        d = step - carry
        while d <= seg:
            t = d / seg
            pts.append((a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1])))
            d += step
        carry = (seg - (d - step)) % step
    pts.append(coords[-1])
    return pts


def _cells_for_geom(b: bytes, idx=grid) -> list[int] | None:
    """Geometry-type dispatch → grid cells (≙ 004:50-58 CASE):

    POLYGON  → polyfill at POLYGON_RES (cells covering the area)
    LINESTRING → cells of points sampled at half-cell spacing at
                 LINE_RES, with grid_disk(1) dilation (≙ the 10 m
                 buffer + polyfill branch)
    POINT    → single cell at POINT_RES
    other    → NULL

    ``idx`` is any cell-index provider (functions/cellindex.py);
    default is the quadtree module.
    """
    g = geo.from_wkb(b)
    t = g[0]
    wgs = geo.sweref_geom_to_wgs84(g)
    if t in ("Polygon", "MultiPolygon"):
        rings = [wgs[1][0]] if t == "Polygon" else [p[0] for p in wgs[1]]
        cells: set[int] = set()
        for ring in rings:
            cells.update(idx.polyfill(ring, idx.POLYGON_RES))
            # boundary coverage: polyfill is center-containment, so thin
            # polygons can miss — add cells of the ring vertices
            for lng, lat in ring:
                cells.add(idx.latlng_to_cell(lat, lng, idx.POLYGON_RES))
        return sorted(cells)
    if t in ("LineString", "MultiLineString"):
        lines = [g[1]] if t == "LineString" else g[1]
        cells = set()
        for line in lines:
            # ~19 m cells at LINE_RES; sample every ~10 m in SWEREF
            # meters before transforming (≙ the 10 m buffer radius)
            for x, y in _line_sample(line, 10.0):
                lat, lng = geo.sweref99_to_wgs84(x, y)
                cells.update(idx.grid_disk_py(idx.latlng_to_cell(lat, lng, idx.LINE_RES), 1))
        return sorted(cells)
    if t in ("Point", "MultiPoint"):
        pts = [wgs[1]] if t == "Point" else wgs[1]
        return sorted(
            {idx.latlng_to_cell(lat, lng, idx.POINT_RES) for lng, lat in pts}
        )
    return None


def make_cell_udfs(idx):
    """Build the three indexing UDFs against a cell-index provider
    (functions/cellindex.py). Provider objects are captured by value
    in the closure, so injected/faked backends travel to executors.
    The module-level UDFs below are this factory applied to the
    default quadtree."""

    @F.pandas_udf(ArrayType(LongType()))
    def cells_for_geom(wkb: pd.Series) -> pd.Series:
        return _each(wkb, lambda b: _cells_for_geom(bytes(b), idx))

    @F.pandas_udf(LongType())
    def center_cell(wkb: pd.Series) -> pd.Series:
        def fn(b):
            cx, cy = geo.centroid(geo.from_wkb(bytes(b)))
            lat, lng = geo.sweref99_to_wgs84(cx, cy)
            return idx.latlng_to_cell(lat, lng, idx.CENTERPOINT_RES)

        return _each(wkb, fn)

    @F.pandas_udf(ArrayType(LongType()))
    def compact_cells(cells: pd.Series) -> pd.Series:
        return cells.map(lambda v: None if v is None else idx.compact_cells(list(v)))

    return {
        "cells_for_geom": cells_for_geom,
        "center_cell": center_cell,
        "compact_cells": compact_cells,
    }


_default_cell_udfs = make_cell_udfs(grid)

# ≙ g_h3 family bound to the default quadtree index:
#   grid_cells_for_geom ≙ 004:50-58 CASE dispatch
#   grid_center_cell    ≙ g_h3_center (003:56-61)
#   grid_compact_cells  ≙ h3_compact_cells (aab_ext_restr/003:14)
grid_cells_for_geom = _default_cell_udfs["cells_for_geom"]
grid_center_cell = _default_cell_udfs["center_cell"]
grid_compact_cells = _default_cell_udfs["compact_cells"]


@F.pandas_udf(DoubleType())
def st_distance_point(wkb: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
    """≙ ST_Distance(geom, ST_Point(x, y)) (examples:184-188)."""
    out = []
    for b, px, py in zip(wkb, x, y):
        if b is None:
            out.append(None)
        else:
            out.append(geo.distance(("Point", (px, py)), geo.from_wkb(bytes(b))))
    return pd.Series(out)


def st_intersection_area(wkt: str):
    """Column builder: area of (WKB polygon column ∩ CONSTANT convex
    query polygon) — ≙ ST_Area(ST_Intersection(geom, query)), the
    exact-refine step for coverage/overlap analytics (clip windows
    are convex: bboxes, buffers, viewports). Sutherland–Hodgman in
    the Python core, Arrow-batched here."""
    ring = geo.from_wkt(wkt)[1][0]

    @F.pandas_udf(DoubleType())
    def _udf(wkb: pd.Series) -> pd.Series:
        return _each(wkb, lambda b: geo.intersection_area(geo.from_wkb(bytes(b)), ring))

    return _udf


def st_intersects_polygon(wkt: str):
    """Column builder: WKB column intersects a CONSTANT polygon —
    the exact-refine filter of the two-phase H3 pattern (reference J4,
    docs/H3_POLYGON_ANALYSIS.md:325-355). Point/centroid containment
    check against the query polygon."""
    poly = geo.from_wkt(wkt)

    @F.pandas_udf(BooleanType())
    def _udf(wkb: pd.Series) -> pd.Series:
        def fn(b):
            g = geo.from_wkb(bytes(b))
            pt = g[1] if g[0] == "Point" else geo.representative_point(g)
            return geo.point_in_polygon(pt, poly)

        return _each(wkb, fn)

    return _udf


def st_intersection_area_any(wkt: str):
    """Column builder: area of (WKB polygon column ∩ CONSTANT simple
    query polygon, convex OR nonconvex) — the clip window is
    ear-clipped into triangles ONCE at build time, then each batch
    clips against the (convex) triangles and sums
    (geo.intersection_area_any)."""
    tris = geo.triangulate(geo.from_wkt(wkt)[1][0])

    @F.pandas_udf(DoubleType())
    def _udf(wkb: pd.Series) -> pd.Series:
        def one(b):
            g = geo.from_wkb(bytes(b))
            return sum(geo.intersection_area(g, t) for t in tris)

        return _each(wkb, one)

    return _udf
