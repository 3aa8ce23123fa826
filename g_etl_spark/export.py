"""Exports — ≙ src/g_etl/export.py (K1-K5).

All formats derive from ONE logical query (export.py:27-41): the grid
index grouped by (cell, dataset, leverantor, klass, classification)
with COUNT(*), ordered by count, optional limit, cell boundary
geometry re-derived from the cell id.

Formats:
- parquet (K1): native writer, zstd.
- csv (K2): Kepler.gl convention — ``hex_id`` column + count.
- geojson (K3): FeatureCollection written driver-side (exports are
  aggregated/bounded outputs — the reference also runs them through
  one process). GPKG/FlatGeobuf need GDAL → import-try stub.
- html (K4): self-contained Leaflet-free SVG map (folium absent);
  same content: colored hexes per dataset, legend, row cap.
- per-table smart export (K5): iterate mart tables, skip empties,
  stringify array columns, route geo vs csv (export.py:344-521).
"""

from __future__ import annotations

import html as _html
import json
import os
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from g_etl_spark import warehouse as wh
from g_etl_spark.functions import grid

DEFAULT_HTML_LIMIT = 5000  # ≙ export.py:170


def grouped_cells(spark: SparkSession, warehouse: str, limit: int | None = None) -> DataFrame:
    """The shared export query (≙ export.py:27-41)."""
    idx = wh.grid_index(spark, warehouse)
    out = (
        idx.groupBy("grid_cell", "dataset_id", "leverantor", "klass", "classification")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("grid_cell"))
    )
    return out.limit(limit) if limit else out


def cells_to_json(cells_col, cell_str=None):
    """Serialize a native ``array<long>`` cell column into the
    reference's ``_h3_cells`` byte format (≙ g_h3_polygon_cells /
    g_h3_point_cells, 003_db_makros.sql:64-83): DuckDB's
    ``to_json(list_of_cell_strings)::VARCHAR`` — i.e. a compact JSON
    array of cell-id strings, ``["7_1_2","7_1_3"]``.

    The engine stores cells natively (SURVEY §1.1) and serializes
    ONLY at this export border. ``cell_str`` converts one cell id to
    its string form (default: quadtree grid.cell_str; pass the H3
    provider's form for real-H3 warehouses). Byte-compat is pinned by
    a hash-equality test against DuckDB's to_json on a fixed fixture.
    """
    if cell_str is None:
        cell_str = grid.cell_str
    return F.to_json(F.transform(cells_col, cell_str))


def export_parquet(df: DataFrame, path: str) -> None:
    """K1 (plugins/base.py:107-111; export.py:259-281)."""
    df.write.mode("overwrite").option("compression", "zstd").parquet(path)


# binary columns serialized as WKT in CSV exports; WKB is
# indistinguishable from other binary payloads by type alone, so the
# convention is by name (the engine's own tables use these). Callers
# exporting a differently-named geometry column can extend this set
# or alias the column; unlisted binary columns hex-encode.
WKT_CSV_COLUMNS = {"geom", "centerpoint", "geometry"}


def export_csv(df: DataFrame, path: str) -> None:
    """K2 Kepler.gl CSV (export.py:23-48): hex_id + count columns.
    Arrays join with ';' (≙ the DOUBLE[]→VARCHAR cast, :446-448);
    binary columns named in WKT_CSV_COLUMNS serialize as WKT
    (≙ ST_AsText on geo exports), other binaries as hex."""
    from g_etl_spark.functions import geo_udfs

    out = df
    if "grid_cell" in df.columns:
        out = df.withColumn("hex_id", grid.cell_str(F.col("grid_cell"))).drop("grid_cell")
    for fld in out.schema.fields:
        kind = fld.dataType.simpleString()
        if kind.startswith("array"):
            out = out.withColumn(fld.name, F.array_join(F.col(fld.name).cast("array<string>"), ";"))
        elif kind == "binary":
            if fld.name in WKT_CSV_COLUMNS:
                out = out.withColumn(fld.name, geo_udfs.st_as_text(F.col(fld.name)))
            else:
                out = out.withColumn(fld.name, F.hex(F.col(fld.name)))
    out.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def _cells_to_features(rows: list[dict]) -> list[dict]:
    feats = []
    for row in rows:
        cell = row.get("grid_cell")
        props = {k: v for k, v in row.items() if k != "grid_cell"}
        if cell is None:
            feats.append({"type": "Feature", "geometry": None, "properties": props})
            continue
        lat_min, lat_max, lng_min, lng_max = grid.cell_to_bounds(int(cell))
        ring = [
            [lng_min, lat_min],
            [lng_max, lat_min],
            [lng_max, lat_max],
            [lng_min, lat_max],
            [lng_min, lat_min],
        ]
        props["hex_id"] = grid.cell_str_py(int(cell))
        feats.append(
            {
                "type": "Feature",
                "geometry": {"type": "Polygon", "coordinates": [ring]},
                "properties": props,
            }
        )
    return feats


def export_geojson(df: DataFrame, path: str, limit: int = 50000) -> None:
    """K3 GeoJSON: driver-side FeatureCollection with cell-boundary
    geometry (≙ h3_cell_to_boundary_wkt route, export.py:143-154).
    Bounded by ``limit`` — exports are aggregates, not raw data."""
    rows = [r.asDict() for r in df.limit(limit).collect()]
    fc = {"type": "FeatureCollection", "features": _cells_to_features(rows)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(fc, f)


def _load_pyogrio():
    """Import hook — patched by tests to inject a fake pyogrio."""
    try:
        import pyogrio
    except ImportError as e:  # pragma: no cover - lib absent here
        raise ImportError(
            "GPKG/FlatGeobuf export needs pyogrio/GDAL (absent in this "
            "container); use export_geojson/export_parquet"
        ) from e
    return pyogrio


def _gdal_rows(df: DataFrame, limit: int = 500_000) -> tuple[list, list[dict]]:
    """Rows → (WKB cell polygons, property dicts) for the GDAL writers.

    Same content contract as export_geojson: cell boundary polygon +
    hex_id + the remaining columns as fields.
    """
    from g_etl_spark.functions import geo

    rows = [r.asDict() for r in df.limit(limit).collect()]
    wkbs: list = []
    props: list[dict] = []
    for row in rows:
        cell = row.get("grid_cell")
        p = {k: v for k, v in row.items() if k != "grid_cell"}
        if cell is None:
            wkbs.append(None)
        else:
            lat_min, lat_max, lng_min, lng_max = grid.cell_to_bounds(int(cell))
            ring = [
                (lng_min, lat_min),
                (lng_max, lat_min),
                (lng_max, lat_max),
                (lng_min, lat_max),
                (lng_min, lat_min),
            ]
            wkbs.append(geo.to_wkb(("Polygon", [ring])))
            p["hex_id"] = grid.cell_str_py(int(cell))
        props.append(p)
    return wkbs, props


def export_gpkg(df: DataFrame, path: str, layer: str = "export", driver: str = "GPKG") -> str:
    """K3 GeoPackage via GDAL (≙ src/g_etl/export.py:284-341).

    Uses ``pyogrio.raw.write`` (WKB + field arrays — no geopandas
    needed). The lib is absent in this container, so the import is
    hook-gated; the row→WKB conversion and the write call are
    exercised by an injected fake in tests/test_export_streaming.py.
    """
    import numpy as np

    pyogrio = _load_pyogrio()
    wkbs, props = _gdal_rows(df)
    fields = sorted({k for p in props for k in p})
    field_data = [np.array([p.get(f) for p in props], dtype=object) for f in fields]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pyogrio.raw.write(
        path,
        geometry=np.array(wkbs, dtype=object),
        field_data=field_data,
        fields=fields,
        geometry_type="Polygon",
        crs="EPSG:4326",
        driver=driver,
        layer=layer,
    )
    return path


def export_flatgeobuf(df: DataFrame, path: str, layer: str = "export") -> str:
    """K3 FlatGeobuf — same GDAL route, different driver."""
    return export_gpkg(df, path, layer=layer, driver="FlatGeobuf")


_COLORS = ["#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd", "#8c564b",
           "#e377c2", "#7f7f7f", "#bcbd22", "#17becf"]


def export_html_map(df: DataFrame, path: str, limit: int = DEFAULT_HTML_LIMIT) -> None:
    """K4 HTML map (≙ export.py:161-256): one self-contained HTML file,
    hex cells as SVG rectangles colored per dataset, legend, tooltip
    titles, row cap 5000. No folium dependency — the file is
    standalone exactly like the reference's output artifact."""
    rows = [r.asDict() for r in df.limit(limit).collect()]
    if not rows:
        rows = []
    cells = [r for r in rows if r.get("grid_cell") is not None]
    datasets = sorted({r.get("dataset_id", "?") for r in cells})
    color = {d: _COLORS[i % len(_COLORS)] for i, d in enumerate(datasets)}
    bounds = [grid.cell_to_bounds(int(r["grid_cell"])) for r in cells]
    if bounds:
        lat_lo = min(b[0] for b in bounds); lat_hi = max(b[1] for b in bounds)
        lng_lo = min(b[2] for b in bounds); lng_hi = max(b[3] for b in bounds)
    else:
        lat_lo, lat_hi, lng_lo, lng_hi = 0, 1, 0, 1
    w, h = 900.0, 700.0

    def sx(lng):
        return (lng - lng_lo) / max(lng_hi - lng_lo, 1e-9) * w

    def sy(lat):
        return h - (lat - lat_lo) / max(lat_hi - lat_lo, 1e-9) * h

    svg = []
    for r, b in zip(cells, bounds):
        d = r.get("dataset_id", "?")
        # Escape data-derived text: values containing markup (e.g.
        # '</title>' or quotes) must not corrupt or script the artifact.
        title = _html.escape(
            ", ".join(f"{k}={v}" for k, v in r.items() if k != "grid_cell"), quote=True
        )
        svg.append(
            f'<rect x="{sx(b[2]):.1f}" y="{sy(b[1]):.1f}" '
            f'width="{max(sx(b[3]) - sx(b[2]), 1):.1f}" '
            f'height="{max(sy(b[0]) - sy(b[1]), 1):.1f}" '
            f'fill="{color.get(d, "#333")}" fill-opacity="0.6" stroke="#222" '
            f'stroke-width="0.2"><title>{title}</title></rect>'
        )
    legend = "".join(
        f'<div><span style="background:{color[d]};display:inline-block;'
        f'width:12px;height:12px;margin-right:6px"></span>{_html.escape(str(d), quote=True)}</div>'
        for d in datasets
    )
    html = (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        "<title>grid export</title></head><body>"
        f"<h3>grid cells ({len(cells)} shown)</h3>"
        f"<div style='display:flex'><svg width='{w:.0f}' height='{h:.0f}' "
        f"style='border:1px solid #999'>{''.join(svg)}</svg>"
        f"<div style='margin-left:12px;font-family:sans-serif'>{legend}</div></div>"
        "</body></html>"
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write(html)


def export_mart_tables(
    spark: SparkSession,
    warehouse: str,
    out_dir: str,
    fmt: str = "csv",
    limit: int | None = None,
) -> dict[str, str]:
    """K5 per-table smart export (≙ export.py:344-521): iterate mart
    tables, skip empty, stringify arrays (≙ DOUBLE[]→VARCHAR cast,
    :446-448), route by columns present (:451-508)."""
    mart = os.path.join(warehouse, "mart")
    results: dict[str, str] = {}
    for name in sorted(os.listdir(mart)) if os.path.isdir(mart) else []:
        df = wh.read_table(spark, warehouse, "mart", name)
        if limit:
            df = df.limit(limit)
        if not df.take(1):
            results[name] = "skipped: empty"  # ≙ skip logic :411-426
            continue
        dest = os.path.join(out_dir, f"{name}.{fmt}")
        if fmt == "geojson" and "grid_cell" in df.columns:
            export_geojson(df, dest)
        elif fmt == "parquet":
            export_parquet(df, dest)
        else:
            export_csv(df, dest)
        results[name] = dest
    return results
