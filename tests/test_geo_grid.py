"""Geometry core + grid index unit tests (hypothesis-backed where
round-trip properties apply)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from g_etl_spark.functions import geo, grid

# --- geometry codec ---------------------------------------------------

coord = st.tuples(
    st.floats(min_value=-1e7, max_value=1e7, allow_nan=False, width=32),
    st.floats(min_value=-1e7, max_value=1e7, allow_nan=False, width=32),
).map(lambda p: (float(p[0]), float(p[1])))


@given(st.lists(coord, min_size=2, max_size=8))
@settings(max_examples=50, deadline=None)
def test_wkb_roundtrip_linestring(pts):
    g = ("LineString", pts)
    assert geo.from_wkb(geo.to_wkb(g)) == g


@given(coord)
@settings(max_examples=50, deadline=None)
def test_wkt_roundtrip_point(p):
    g = ("Point", p)
    t, c = geo.from_wkt(geo.to_wkt(g))
    assert t == "Point"
    assert math.isclose(c[0], p[0], rel_tol=1e-6, abs_tol=1e-6)
    assert math.isclose(c[1], p[1], rel_tol=1e-6, abs_tol=1e-6)


def test_polygon_measures():
    poly = ("Polygon", [[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]])
    assert geo.area(poly) == 16.0
    assert geo.centroid(poly) == (2.0, 2.0)
    assert geo.point_in_polygon((1.0, 1.0), poly)
    assert not geo.point_in_polygon((9.0, 9.0), poly)
    assert geo.distance(("Point", (6.0, 2.0)), poly) == 2.0


def test_polygon_with_hole():
    poly = (
        "Polygon",
        [
            [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)],
            [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)],
        ],
    )
    assert geo.area(poly) == 96.0
    assert not geo.point_in_polygon((5.0, 5.0), poly)  # in the hole
    assert geo.point_in_polygon((1.0, 1.0), poly)


def test_centroid_honors_holes():
    """An off-center hole must pull the centroid away (matching
    ST_Centroid), regardless of hole winding direction."""
    # 10×10 square, hole in the lower-left quadrant → centroid moves
    # up-right of (5, 5).
    hole_ccw = [(1.0, 1.0), (4.0, 1.0), (4.0, 4.0), (1.0, 4.0), (1.0, 1.0)]
    outer = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
    poly = ("Polygon", [outer, hole_ccw])
    cx, cy = geo.centroid(poly)
    # exact: (100*5 - 9*2.5) / 91 = 5.24725...
    assert math.isclose(cx, (500.0 - 22.5) / 91.0, rel_tol=1e-9)
    assert math.isclose(cy, cx, rel_tol=1e-9)
    # same answer with the hole stored clockwise
    poly_cw = ("Polygon", [outer, list(reversed(hole_ccw))])
    cx2, cy2 = geo.centroid(poly_cw)
    assert math.isclose(cx2, cx, rel_tol=1e-12) and math.isclose(cy2, cy, rel_tol=1e-12)
    # no-hole polygon unchanged
    assert geo.centroid(("Polygon", [outer])) == (5.0, 5.0)


def test_bowtie_invalid_and_repair():
    bow = ("Polygon", [[(0.0, 0.0), (4.0, 4.0), (4.0, 0.0), (0.0, 4.0), (0.0, 0.0)]])
    assert not geo.is_valid(bow)
    fixed = geo.make_valid(bow)
    assert geo.is_valid(fixed)


def test_representative_point_in_concave_polygon():
    # U-shape whose centroid may fall outside
    u = (
        "Polygon",
        [
            [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (7.0, 10.0), (7.0, 2.0),
             (3.0, 2.0), (3.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
        ],
    )
    p = geo.representative_point(u)
    assert geo.point_in_polygon(p, u)


@given(
    st.floats(min_value=55.0, max_value=69.0, allow_nan=False),
    st.floats(min_value=10.5, max_value=24.0, allow_nan=False),
)
@settings(max_examples=50, deadline=None)
def test_sweref_roundtrip(lat, lng):
    e, n = geo.wgs84_to_sweref99(lat, lng)
    lat2, lng2 = geo.sweref99_to_wgs84(e, n)
    assert abs(lat2 - lat) < 1e-8
    assert abs(lng2 - lng) < 1e-8


# --- grid -------------------------------------------------------------


@given(
    st.floats(min_value=-85.0, max_value=85.0, allow_nan=False),
    st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
    st.integers(min_value=1, max_value=24),
)
@settings(max_examples=100, deadline=None)
def test_cell_contains_its_point(lat, lng, res):
    c = grid.latlng_to_cell(lat, lng, res)
    lat_min, lat_max, lng_min, lng_max = grid.cell_to_bounds(c)
    assert lat_min - 1e-9 <= lat <= lat_max + 1e-9
    assert lng_min - 1e-9 <= lng <= lng_max + 1e-9
    r, x, y = grid.unpack(c)
    assert r == res


def test_parent_contains_child():
    c = grid.latlng_to_cell(59.33, 18.07, 20)
    r, x, y = grid.unpack(c)
    p = grid.pack(r - 2, x >> 2, y >> 2)
    plat_min, plat_max, plng_min, plng_max = grid.cell_to_bounds(p)
    lat_min, lat_max, lng_min, lng_max = grid.cell_to_bounds(c)
    assert plat_min <= lat_min and lat_max <= plat_max
    assert plng_min <= lng_min and lng_max <= plng_max


def test_polyfill_covers_rectangle():
    ring = [(13.0, 57.0), (17.0, 57.0), (17.0, 60.0), (13.0, 60.0), (13.0, 57.0)]
    cells = grid.polyfill(ring, 10)
    assert len(cells) > 50
    # every cell center inside the rectangle
    for c in cells:
        lat, lng = grid.cell_to_latlng(c)
        assert 13.0 <= lng <= 17.0 and 57.0 <= lat <= 60.0


def test_compact_uncompact_invariant():
    ring = [(13.0, 57.0), (14.0, 57.0), (14.0, 58.0), (13.0, 58.0), (13.0, 57.0)]
    cells = grid.polyfill(ring, 12)
    compacted = grid.compact_cells(cells)
    assert len(compacted) < len(cells)
    assert grid.uncompact_cells(compacted, 12) == sorted(cells)


def test_cell_sql_matches_python(spark):
    import duckdb

    pts = [(59.3293, 18.0686), (55.0, 11.0), (64.99, 22.99), (-33.9, 151.2)]
    sql = grid.cell_sql("lat", "lng", 15)
    con = duckdb.connect()
    for lat, lng in pts:
        expected = grid.latlng_to_cell(lat, lng, 15)
        got_duck = con.sql(
            f"SELECT {sql} FROM (SELECT {lat} AS lat, {lng} AS lng)"
        ).fetchone()[0]
        got_spark = (
            spark.createDataFrame([(lat, lng)], "lat double, lng double")
            .selectExpr(f"{sql} AS c")
            .head()
            .c
        )
        assert got_duck == expected == got_spark


def test_cell_ancestor_sql(spark):
    c = grid.latlng_to_cell(59.33, 18.07, 20)
    r, x, y = grid.unpack(c)
    expected = grid.pack(14, x >> 6, y >> 6)
    got = (
        spark.createDataFrame([(c,)], "grid_cell bigint")
        .selectExpr(grid.cell_ancestor_sql("grid_cell", 14) + " AS a")
        .head()
        .a
    )
    assert got == expected


def test_clip_polygon_intersection():
    """Sutherland–Hodgman clip: exact intersection with convex
    windows, holes honored, disjoint → None."""
    square = ("Polygon", [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]])
    clip = [(5.0, 5.0), (15.0, 5.0), (15.0, 15.0), (5.0, 15.0), (5.0, 5.0)]
    out = geo.clip_polygon(square, clip)
    assert out is not None and geo.area(out) == 25.0  # overlapping quarter
    assert geo.intersection_area(square, clip) == 25.0
    # clip winding must not matter
    assert geo.intersection_area(square, list(reversed(clip))) == 25.0
    # fully inside / fully containing
    assert geo.intersection_area(square, [(-5.0, -5.0), (20.0, -5.0), (20.0, 20.0), (-5.0, 20.0)]) == 100.0
    inner = [(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0)]
    assert geo.intersection_area(square, inner) == 4.0
    # disjoint
    assert geo.clip_polygon(square, [(20.0, 20.0), (30.0, 20.0), (30.0, 30.0), (20.0, 30.0)]) is None
    # hole subtracts from the clipped area
    holed = (
        "Polygon",
        [
            [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)],
            [(6.0, 6.0), (8.0, 6.0), (8.0, 8.0), (6.0, 8.0), (6.0, 6.0)],
        ],
    )
    assert geo.intersection_area(holed, clip) == 25.0 - 4.0
    # triangle clip (non-axis-aligned edges)
    tri = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]
    assert abs(geo.intersection_area(square, tri) - 50.0) < 1e-9
    # multipolygon: parts clip independently
    mp = ("MultiPolygon", [square[1], [[(20.0, 0.0), (24.0, 0.0), (24.0, 4.0), (20.0, 4.0), (20.0, 0.0)]]])
    assert geo.intersection_area(mp, [(-1.0, -1.0), (30.0, -1.0), (30.0, 30.0), (-1.0, 30.0)]) == 116.0


def test_st_intersection_area_udf(spark):
    from g_etl_spark.functions import geo_udfs

    rows = [
        (1, geo.to_wkb(("Polygon", [[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]]))),
        (2, geo.to_wkb(("Polygon", [[(10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 12.0), (10.0, 10.0)]]))),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id int, geom binary")
    area_udf = geo_udfs.st_intersection_area("POLYGON ((2 2, 20 2, 20 20, 2 20, 2 2))")
    got = {r.id: r.a for r in df.select("id", area_udf("geom").alias("a")).collect()}
    assert got[1] == 4.0 and got[2] == 4.0 and got[3] is None


def test_cell_ancestor_sql_clamps_coarser_cells(spark):
    """A stored cell COARSER than the target res must pass through
    unchanged (clamped shift), not produce a negative-shift result."""
    import duckdb

    coarse = grid.latlng_to_cell(59.33, 18.07, 10)
    sql = grid.cell_ancestor_sql("grid_cell", 14)
    got_spark = (
        spark.createDataFrame([(coarse,)], "grid_cell bigint")
        .selectExpr(sql + " AS a")
        .head()
        .a
    )
    got_duck = duckdb.sql(
        f"SELECT {sql.replace('grid_cell', str(coarse))} AS a"
    ).fetchone()[0]
    r10, x, y = grid.unpack(coarse)
    assert got_spark == got_duck == grid.pack(14, x, y)


def test_triangulate_and_nonconvex_intersection():
    """Ear-clipping triangulation partitions simple polygons; the
    triangle-sum intersection area lifts the convex-window limit."""
    # L-shape (nonconvex, area 75): triangles must sum to the area
    L = [(0.0, 0.0), (10.0, 0.0), (10.0, 5.0), (5.0, 5.0), (5.0, 10.0), (0.0, 10.0)]
    tris = geo.triangulate(L)
    assert len(tris) == 4  # n-2 triangles for a simple 6-gon
    assert abs(sum(geo.area(("Polygon", [t + [t[0]]])) for t in tris) - 75.0) < 1e-9

    sq = ("Polygon", [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]])
    # L fully inside the square
    assert abs(geo.intersection_area_any(sq, L) - 75.0) < 1e-9
    # U-shape straddling the square edge: only the in-square part counts
    U = [(2.0, -5.0), (8.0, -5.0), (8.0, 8.0), (6.0, 8.0), (6.0, -2.0),
         (4.0, -2.0), (4.0, 8.0), (2.0, 8.0)]
    assert abs(geo.intersection_area_any(sq, U) - 32.0) < 1e-6
    # convex windows agree with the Sutherland–Hodgman fast path
    clip = [(5.0, 5.0), (15.0, 5.0), (15.0, 15.0), (5.0, 15.0)]
    assert geo.intersection_area_any(sq, clip) == geo.intersection_area(sq, clip)
    # clockwise input is normalized
    assert abs(geo.intersection_area_any(sq, list(reversed(L))) - 75.0) < 1e-9


def test_union_area_inclusion_exclusion():
    sq = ("Polygon", [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]])
    shifted = ("Polygon", [[(5.0, 0.0), (15.0, 0.0), (15.0, 10.0), (5.0, 10.0), (5.0, 0.0)]])
    assert abs(geo.union_area(sq, shifted) - 150.0) < 1e-9  # 100+100-50
    # disjoint: plain sum
    far = ("Polygon", [[(20.0, 0.0), (25.0, 0.0), (25.0, 5.0), (20.0, 5.0), (20.0, 0.0)]])
    assert abs(geo.union_area(sq, far) - 125.0) < 1e-9
    # containment: union = outer
    inner = ("Polygon", [[(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0)]])
    assert abs(geo.union_area(sq, inner) - 100.0) < 1e-9
    # L-shaped (nonconvex) ∪ square overlapping one leg
    L = ("Polygon", [[(0.0, 0.0), (10.0, 0.0), (10.0, 5.0), (5.0, 5.0), (5.0, 10.0), (0.0, 10.0), (0.0, 0.0)]])
    box = ("Polygon", [[(8.0, 3.0), (12.0, 3.0), (12.0, 7.0), (8.0, 7.0), (8.0, 3.0)]])
    # box area 16; overlap with L: x 8-10, y 3-5 => 4
    assert abs(geo.union_area(L, box) - (75.0 + 16.0 - 4.0)) < 1e-9


# --- polygon_union: the union SHAPE (NEXT.md item 1) ----------------------


def _sq(x0, y0, x1, y1):
    return ("Polygon", [[(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]])


def _union_shape_area(u):
    if u[0] == "Polygon":
        return geo.area(u)
    return sum(geo.area(("Polygon", p)) for p in u[1])


def _in_union_shape(pt, u):
    if u[0] == "Polygon":
        return geo.point_in_polygon(pt, u)
    return any(geo.point_in_polygon(pt, ("Polygon", p)) for p in u[1])


def _assert_union_matches(a, b, n_samples=500, seed=1):
    """The shape oracle: ring area equals the independent
    inclusion-exclusion measure, and sampled point membership equals
    (in A) OR (in B)."""
    import random

    u = geo.polygon_union(a, b)
    want = geo.union_area(a, b)
    got = _union_shape_area(u)
    assert abs(got - want) < 1e-6 * max(want, 1.0), (got, want)
    xs = [p[0] for ring in a[1] + b[1] for p in ring]
    ys = [p[1] for ring in a[1] + b[1] for p in ring]
    rng = random.Random(seed)
    for _ in range(n_samples):
        pt = (
            rng.uniform(min(xs) - 1, max(xs) + 1),
            rng.uniform(min(ys) - 1, max(ys) + 1),
        )
        assert _in_union_shape(pt, u) == (
            geo.point_in_polygon(pt, a) or geo.point_in_polygon(pt, b)
        ), pt
    return u


def test_polygon_union_basic_shapes():
    u = _assert_union_matches(_sq(0, 0, 2, 2), _sq(1, 1, 3, 3))
    assert u[0] == "Polygon" and len(u[1]) == 1  # single outer ring

    u = _assert_union_matches(_sq(0, 0, 1, 1), _sq(3, 3, 4, 4))
    assert u[0] == "MultiPolygon" and len(u[1]) == 2  # disjoint

    u = _assert_union_matches(_sq(0, 0, 5, 5), _sq(1, 1, 2, 2))
    assert u[0] == "Polygon"  # containment → the container

    # crossing rectangles (4-armed plus: 8 intersections, nonconvex result)
    u = _assert_union_matches(_sq(-1, 2, 6, 3), _sq(2, -1, 3, 6))
    assert u[0] == "Polygon" and len(u[1]) == 1


def test_polygon_union_degenerate_adjacency():
    # shared edge: perturbation EXPANDS b, so adjacency merges (union
    # closure semantics) instead of drifting apart
    u = _assert_union_matches(_sq(0, 0, 1, 1), _sq(1, 0, 2, 1))
    assert u[0] == "Polygon" and len(u[1]) == 1
    # identical polygons
    u = _assert_union_matches(_sq(0, 0, 2, 2), _sq(0, 0, 2, 2))
    assert u[0] == "Polygon"
    # corner touch
    u = _assert_union_matches(_sq(0, 0, 2, 2), _sq(2, 2, 4, 4))
    assert abs(_union_shape_area(u) - 8.0) < 1e-6


def test_polygon_union_emits_hole():
    """U-shape + cap enclose an empty region: the union must carry it
    as an interior RING, not cover it."""
    u_shape = ("Polygon", [[(0, 0), (5, 0), (5, 4), (4, 4), (4, 1), (1, 1), (1, 4), (0, 4), (0, 0)]])
    cap = ("Polygon", [[(0, 3), (5, 3), (5, 5), (0, 5), (0, 3)]])
    u = _assert_union_matches(u_shape, cap)
    assert u[0] == "Polygon" and len(u[1]) == 2  # outer + hole
    assert abs(_union_shape_area(u) - 19.0) < 1e-6
    # the hole interior is outside the union
    assert not _in_union_shape((2.5, 2.0), u)
    assert _in_union_shape((2.5, 4.5), u)


def test_polygon_union_fuzz_quads_and_convex():
    import random

    rng = random.Random(99)
    for trial in range(60):
        if trial % 2 == 0:
            def mk():
                x0, y0 = rng.uniform(0, 5), rng.uniform(0, 5)
                return _sq(x0, y0, x0 + rng.uniform(0.5, 4), y0 + rng.uniform(0.5, 4))
        else:
            def mk():
                cx, cy = rng.uniform(0, 5), rng.uniform(0, 5)
                angs = sorted(rng.uniform(0, 2 * math.pi) for _ in range(rng.randint(3, 8)))
                r = rng.uniform(0.5, 3)
                ring = [(cx + r * math.cos(t), cy + r * math.sin(t)) for t in angs]
                ring.append(ring[0])
                return ("Polygon", [ring])

        a, b = mk(), mk()
        u = geo.polygon_union(a, b)
        want = geo.union_area(a, b)
        assert abs(_union_shape_area(u) - want) < 1e-6 * max(want, 1.0), (a, b)


def test_polygon_union_wkt_roundtrip():
    u = geo.polygon_union(_sq(0, 0, 2, 2), _sq(1, 1, 3, 3))
    back = geo.from_wkt(geo.to_wkt(u))
    assert abs(_union_shape_area(back) - 7.0) < 1e-9


def test_polygon_union_fuzz_nonconvex_stars():
    """400 random SIMPLE nonconvex (star-shaped) polygon pairs: the
    union ring area must match the independent inclusion-exclusion
    measure. (Generator keeps angular gaps < pi and validity-checks,
    since a radial polygon with a reflex wedge can self-intersect.)"""
    import random

    rng = random.Random(7)

    def star(cx, cy):
        while True:
            n = rng.randint(5, 10)
            angs = sorted(rng.uniform(0, 2 * math.pi) for _ in range(n))
            gaps = [
                (angs[(i + 1) % n] - angs[i]) if i < n - 1
                else 2 * math.pi - angs[-1] + angs[0]
                for i in range(n)
            ]
            if max(gaps) < math.pi * 0.95:
                break
        ring = [
            (cx + rng.uniform(0.4, 3.0) * math.cos(t),
             cy + rng.uniform(0.4, 3.0) * math.sin(t))
            for t in angs
        ]
        ring.append(ring[0])
        p = ("Polygon", [ring])
        return p if geo.is_valid(p) else None

    trials = 0
    while trials < 60:
        a = star(rng.uniform(0, 4), rng.uniform(0, 4))
        b = star(rng.uniform(0, 4), rng.uniform(0, 4))
        if a is None or b is None:
            continue
        trials += 1
        u = geo.polygon_union(a, b)
        want = geo.union_area(a, b)
        assert abs(_union_shape_area(u) - want) < 1e-6 * max(want, 1.0), (a, b)


def test_polygon_union_rejects_invalid_input():
    """A self-intersecting ring must raise, not silently traverse to
    a wrong shape; make_valid is the documented repair path."""
    import pytest

    bowtie = ("Polygon", [[(0, 0), (2, 2), (2, 0), (0, 2), (0, 0)]])
    sq = ("Polygon", [[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]])
    with pytest.raises(ValueError, match="not a simple polygon"):
        geo.polygon_union(bowtie, sq)
    with pytest.raises(ValueError, match="not a simple polygon"):
        geo.polygon_union(sq, bowtie)
