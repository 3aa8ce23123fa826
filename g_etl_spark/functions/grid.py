"""Hierarchical spatial grid index — the engine's H3-cell equivalent.

The reference's central design is indexing every geometry into H3
cells at ingest so spatial queries become equi-joins on cell IDs
(reference docs/H3_POLYGON_ANALYSIS.md:7-12; macros
sql/migrations/003_db_makros.sql:56-92). The `h3` library is not
available in this environment, so the engine ships a hierarchical
**quadtree grid** with the same algebra:

- ``cell(lat, lng, res)``     ≙ h3_latlng_to_cell_string   (003:56-61)
- ``polyfill(coords, res)``   ≙ h3_polygon_wkt_to_cells    (003:64-68)
- ``cell_to_boundary_wkt``    ≙ h3_cell_to_boundary_wkt    (003:87-92)
- ``cell_to_latlng``          ≙ h3_cell_to_latlng          (aab/002:18)
- ``compact_cells``           ≙ h3_compact_cells           (aab/003:14)

Deliberate scale choice: the per-row cell computation is **pure Spark
SQL arithmetic** (floor + bit shifts on longs), not a Python UDF — it
stays inside whole-stage codegen, so indexing 100 TB of points costs
no Python round-trip at all. H3 itself would require a pandas UDF
(see ``h3_adapter``); the quadtree keeps identical pipeline semantics
(hierarchical containment, prefix compaction, equi-join queries)
while being strictly faster on vanilla Spark.

Cell encoding: a packed 64-bit long ``res<<58 | x<<29 | y`` with
``x = floor((lng+180)/360 * 2^res)``, ``y = floor((90-lat)/180 *
2^res)``; res ≤ 28. Parent = ``x>>1, y>>1`` at res-1 (exact
hierarchical containment, like H3's cell_to_parent).
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column

RES_SHIFT = 58
X_SHIFT = 29
MAX_RES = 28

# Reference default resolutions (settings.py:82-86, config/config.yml:19-24)
# mapped onto quadtree levels of comparable CELL AREA at Swedish
# latitudes (~60°N, where a lng-degree is ~55.8 km):
#   H3 res 13 ~ 43 m²   -> quad res 22 (~4.8 m cells, ~23 m²)
#   H3 res 11 ~ 2149 m² -> quad res 19 (~38 m cells, ~1450 m²)
#   H3 res 12 ~ 307 m²  -> quad res 20 (~19 m cells, ~360 m²)
CENTERPOINT_RES = 22
POLYGON_RES = 19
LINE_RES = 20
POINT_RES = 22
# Query/rollup resolution: coarse enough that per-cell stats are
# non-trivial at the testdata densities (≙ reference's res-8 default
# relative to its data density, examples:249-263).
QUERY_RES = 10


def _two_pow(res: int) -> Column:
    return F.shiftleft(F.lit(1).cast("long"), res)


def cell_x(lng: Column, res: int) -> Column:
    """Grid x ordinate at resolution ``res`` (pure SQL, codegen'd)."""
    n = _two_pow(res)
    x = F.floor((lng + F.lit(180.0)) / F.lit(360.0) * n).cast("long")
    return F.least(F.greatest(x, F.lit(0).cast("long")), n - 1)


def cell_y(lat: Column, res: int) -> Column:
    """Grid y ordinate at resolution ``res``."""
    n = _two_pow(res)
    y = F.floor((F.lit(90.0) - lat) / F.lit(180.0) * n).cast("long")
    return F.least(F.greatest(y, F.lit(0).cast("long")), n - 1)


def cell(lat: Column, lng: Column, res: int) -> Column:
    """Packed 64-bit cell ID — ≙ g_h3_center (003:56-61).

    ``res<<58 | x<<29 | y``; monotone within a row of cells, and the
    whole expression is built-in arithmetic (no UDF).
    """
    return (
        F.shiftleft(F.lit(res).cast("long"), RES_SHIFT)
        .bitwiseOR(F.shiftleft(cell_x(lng, res), X_SHIFT))
        .bitwiseOR(cell_y(lat, res))
    )


def cell_res(c: Column) -> Column:
    return F.shiftright(c, RES_SHIFT).bitwiseAND(F.lit(63))


def cell_parent(c: Column, steps: int = 1) -> Column:
    """Parent cell ``steps`` levels up (hierarchical containment)."""
    r = F.shiftright(c, RES_SHIFT).bitwiseAND(F.lit(63))
    x = F.shiftright(c, X_SHIFT).bitwiseAND(F.lit((1 << 29) - 1))
    y = c.bitwiseAND(F.lit((1 << 29) - 1))
    return (
        F.shiftleft(r - steps, RES_SHIFT)
        .bitwiseOR(F.shiftleft(F.shiftright(x, steps), X_SHIFT))
        .bitwiseOR(F.shiftright(y, steps))
    )


def cell_str(c: Column) -> Column:
    """Human-readable ``res_x_y`` form (≙ H3 string IDs)."""
    r = F.shiftright(c, RES_SHIFT).bitwiseAND(F.lit(63))
    x = F.shiftright(c, X_SHIFT).bitwiseAND(F.lit((1 << 29) - 1))
    y = c.bitwiseAND(F.lit((1 << 29) - 1))
    return F.concat_ws("_", r.cast("string"), x.cast("string"), y.cast("string"))


def cell_ancestor_sql(col: str, res: int) -> str:
    """SQL text: ancestor of ``col`` at fixed resolution ``res`` —
    handles mixed-resolution cell columns (shift amount is per-row).
    Runs in Spark SQL and DuckDB alike."""
    mask = (1 << 29) - 1
    r = f"((({col}) >> {RES_SHIFT}) & 63)"
    # Clamp: a stored cell coarser than `res` would make the shift
    # negative (engine-dependent result); treat it as already-coarse.
    dr = f"(greatest({r} - {res}, 0))"
    x = f"((({col}) >> {X_SHIFT}) & {mask})"
    y = f"(({col}) & {mask})"
    return (
        f"((CAST({res} AS BIGINT) << {RES_SHIFT}) | "
        f"(({x} >> {dr}) << {X_SHIFT}) | ({y} >> {dr}))"
    )


# --- SQL-text builders (for the DuckDB oracle and spark.sql users) ---------


def cell_sql(lat_expr: str, lng_expr: str, res: int) -> str:
    """The exact same cell computation as ANSI SQL text.

    Runs identically in Spark SQL and DuckDB — used by oracle queries
    and available to spark.sql() users as an inline macro.
    """
    n = 1 << res
    x = (
        f"least(greatest(CAST(floor((({lng_expr}) + 180.0) / 360.0 * {n}) AS BIGINT), 0), {n - 1})"
    )
    y = (
        f"least(greatest(CAST(floor((90.0 - ({lat_expr})) / 180.0 * {n}) AS BIGINT), 0), {n - 1})"
    )
    return f"((CAST({res} AS BIGINT) << {RES_SHIFT}) | ({x} << {X_SHIFT}) | {y})"


# --- driver-side (query-side) cell math ------------------------------------
# The query side of the cell join is one polygon -> at most a few
# thousand cells; computed on the driver and broadcast (SURVEY §3.2).


def cell_str_py(c: int) -> str:
    """Python-side ``res_x_y`` form (matches cell_str)."""
    res, x, y = unpack(c)
    return f"{res}_{x}_{y}"


def pack(res: int, x: int, y: int) -> int:
    return (res << RES_SHIFT) | (x << X_SHIFT) | y


def unpack(c: int) -> tuple[int, int, int]:
    return (c >> RES_SHIFT) & 63, (c >> X_SHIFT) & ((1 << 29) - 1), c & ((1 << 29) - 1)


def latlng_to_cell(lat: float, lng: float, res: int) -> int:
    n = 1 << res
    x = min(max(int(math.floor((lng + 180.0) / 360.0 * n)), 0), n - 1)
    y = min(max(int(math.floor((90.0 - lat) / 180.0 * n)), 0), n - 1)
    return pack(res, x, y)


def cell_to_bounds(c: int) -> tuple[float, float, float, float]:
    """(lat_min, lat_max, lng_min, lng_max) of a cell."""
    res, x, y = unpack(c)
    n = 1 << res
    lng_min = x / n * 360.0 - 180.0
    lng_max = (x + 1) / n * 360.0 - 180.0
    lat_max = 90.0 - y / n * 180.0
    lat_min = 90.0 - (y + 1) / n * 180.0
    return lat_min, lat_max, lng_min, lng_max


def grid_disk_py(c: int, k: int = 1) -> list[int]:
    """Cells within Chebyshev distance ``k``, center included —
    ≙ h3 grid_disk/k_ring (the quadtree's k-neighborhood)."""
    res, x, y = unpack(c)
    n = 1 << res
    out = []
    for dx in range(-k, k + 1):
        for dy in range(-k, k + 1):
            nx, ny = x + dx, y + dy
            if 0 <= nx < n and 0 <= ny < n:
                out.append(pack(res, nx, ny))
    return sorted(out)


def cell_parent_py(c: int, steps: int = 1) -> int:
    """Python-side parent (matches cell_parent)."""
    res, x, y = unpack(c)
    return pack(res - steps, x >> steps, y >> steps)


def cell_to_latlng(c: int) -> tuple[float, float]:
    """Cell center — ≙ h3_cell_to_latlng (aab_ext_restr/002:18)."""
    lat_min, lat_max, lng_min, lng_max = cell_to_bounds(c)
    return (lat_min + lat_max) / 2.0, (lng_min + lng_max) / 2.0


def cell_to_boundary_wkt(c: int) -> str:
    """Cell boundary polygon — ≙ h3_cell_to_boundary_wkt (003:87-92)."""
    lat_min, lat_max, lng_min, lng_max = cell_to_bounds(c)
    ring = [
        (lng_min, lat_min),
        (lng_max, lat_min),
        (lng_max, lat_max),
        (lng_min, lat_max),
        (lng_min, lat_min),
    ]
    coords = ", ".join(f"{lng:.9f} {lat:.9f}" for lng, lat in ring)
    return f"POLYGON (({coords}))"


def _point_in_ring(lat: float, lng: float, ring: Sequence[tuple[float, float]]) -> bool:
    """Ray-casting point-in-polygon; ring = [(lng, lat), ...]."""
    inside = False
    j = len(ring) - 1
    for i in range(len(ring)):
        xi, yi = ring[i]
        xj, yj = ring[j]
        if (yi > lat) != (yj > lat) and lng < (xj - xi) * (lat - yi) / (yj - yi) + xi:
            inside = not inside
        j = i
    return inside


def polyfill(ring: Sequence[tuple[float, float]], res: int) -> list[int]:
    """Cells whose center falls inside the polygon ring —
    ≙ h3_polygon_wkt_to_cells_string (003:64-68,138-146), which uses
    H3's center-containment polyfill semantics (SURVEY §7 edge #2).

    ``ring`` is [(lng, lat), ...], closed or open. Driver-side by
    design: one query polygon covers at most a few thousand cells at
    query resolutions, and the result is broadcast into the cell join.
    """
    lngs = [p[0] for p in ring]
    lats = [p[1] for p in ring]
    c_lo = latlng_to_cell(min(lats), min(lngs), res)
    c_hi = latlng_to_cell(max(lats), max(lngs), res)
    _, x_lo, y_hi = unpack(c_lo)  # min lat -> max y
    _, x_hi, y_lo = unpack(c_hi)
    cells: list[int] = []
    for x in range(x_lo, x_hi + 1):
        for y in range(y_lo, y_hi + 1):
            c = pack(res, x, y)
            clat, clng = cell_to_latlng(c)
            if _point_in_ring(clat, clng, ring):
                cells.append(c)
    return sorted(cells)


def compact_cells(cells: Iterable[int]) -> list[int]:
    """Hierarchical compaction — ≙ h3_compact_cells (aab/003:14).

    Any complete sibling group of 4 collapses into its parent,
    repeatedly. The union of the compacted set's descendants at the
    original resolution equals the input set (tested invariant).
    """
    cur = set(cells)
    changed = True
    while changed:
        changed = False
        by_parent: dict[int, list[int]] = {}
        for c in cur:
            res, x, y = unpack(c)
            if res == 0:
                continue
            p = pack(res - 1, x >> 1, y >> 1)
            by_parent.setdefault(p, []).append(c)
        for p, kids in by_parent.items():
            if len(kids) == 4:
                cur.difference_update(kids)
                cur.add(p)
                changed = True
    return sorted(cur)


def uncompact_cells(cells: Iterable[int], res: int) -> list[int]:
    """Expand compacted cells back to a uniform resolution."""
    out: list[int] = []
    for c in cells:
        r, x, y = unpack(c)
        if r > res:
            raise ValueError(f"cell res {r} finer than target {res}")
        span = 1 << (res - r)
        for dx in range(span):
            for dy in range(span):
                out.append(pack(res, (x << (res - r)) + dx, (y << (res - r)) + dy))
    return sorted(out)


def wkt_polygon_ring(wkt: str) -> list[tuple[float, float]]:
    """Parse the outer ring of a POLYGON WKT into [(lng, lat), ...]."""
    body = wkt.strip()
    if not body.upper().startswith("POLYGON"):
        raise ValueError(f"expected POLYGON wkt, got: {wkt[:40]}")
    inner = body[body.index("((") + 2 : body.index("))")]
    first_ring = inner.split("),")[0].strip("() ")
    pts = []
    for pair in first_ring.split(","):
        xs, ys = pair.strip().split()[:2]
        pts.append((float(xs), float(ys)))
    return pts
