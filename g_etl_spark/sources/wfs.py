"""WFS source — ≙ plugins/wfs.py:69-201 (S5) / wfs_geopandas.py (S6).

The reference builds WFS 2.0 GetFeature URLs (GeoJSON output) and
paginates with count/startIndex, stopping on a short page or
max_features. Here the page-fetch is pluggable (``fetcher``) so the
pagination/stop/parse logic is unit-testable without network; the
default fetcher uses ``requests`` (import-try — absent in this
container).

Each GeoJSON page parses into rows of (properties..., geom WKB);
pages concatenate via unionByName — the driver fetches (network I/O
is driver-side, like the reference's thread executor), Spark owns
everything after.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from urllib.parse import urlencode

from pyspark.sql import DataFrame, SparkSession

from g_etl_spark.config import DatasetConfig
from g_etl_spark.functions import geo
from g_etl_spark.sources import register_plugin

DEFAULT_PAGE_SIZE = 1000


def build_getfeature_url(
    base_url: str,
    type_name: str,
    count: int | None = None,
    start_index: int | None = None,
    srs: str = "EPSG:3006",
) -> str:
    """≙ wfs.py:69-108 URL construction (WFS 2.0, GeoJSON output)."""
    params = {
        "service": "WFS",
        "version": "2.0.0",
        "request": "GetFeature",
        "typeNames": type_name,
        "outputFormat": "application/json",
        "srsName": srs,
    }
    if count is not None:
        params["count"] = str(count)
    if start_index is not None:
        params["startIndex"] = str(start_index)
    return f"{base_url}?{urlencode(params)}"


def _geojson_geom_to_wkb(g: dict) -> bytes | None:
    if g is None:
        return None
    t = g["type"]
    c = g["coordinates"]

    def pt(p):
        return (float(p[0]), float(p[1]))

    if t == "Point":
        return geo.to_wkb(("Point", pt(c)))
    if t == "LineString":
        return geo.to_wkb(("LineString", [pt(p) for p in c]))
    if t == "Polygon":
        return geo.to_wkb(("Polygon", [[pt(p) for p in ring] for ring in c]))
    if t == "MultiPolygon":
        return geo.to_wkb(
            ("MultiPolygon", [[[pt(p) for p in ring] for ring in poly] for poly in c])
        )
    if t == "MultiLineString":
        return geo.to_wkb(("MultiLineString", [[pt(p) for p in ls] for ls in c]))
    if t == "MultiPoint":
        return geo.to_wkb(("MultiPoint", [pt(p) for p in c]))
    raise ValueError(f"unsupported GeoJSON geometry: {t}")


def parse_geojson_page(payload: str | dict) -> list[dict]:
    """One GeoJSON FeatureCollection → rows with geom WKB."""
    data = json.loads(payload) if isinstance(payload, str) else payload
    rows = []
    for feat in data.get("features", []):
        row = dict(feat.get("properties") or {})
        row["geom"] = _geojson_geom_to_wkb(feat.get("geometry"))
        rows.append(row)
    return rows


def fetch_paginated(
    base_url: str,
    type_name: str,
    fetcher: Callable[[str], str],
    page_size: int = DEFAULT_PAGE_SIZE,
    max_features: int | None = None,
) -> list[dict]:
    """≙ the pagination loop (wfs.py:110-201): fetch count/startIndex
    pages, stop on short page or max_features."""
    rows: list[dict] = []
    start = 0
    while True:
        url = build_getfeature_url(base_url, type_name, count=page_size, start_index=start)
        page = parse_geojson_page(fetcher(url))
        rows.extend(page)
        # Cap check first: a short final page must not bypass the trim.
        if max_features is not None and len(rows) >= max_features:
            rows = rows[:max_features]
            break
        if len(page) < page_size:
            break
        start += page_size
    return rows


def _requests_fetcher(url: str) -> str:  # pragma: no cover - no network here
    try:
        import requests
    except ImportError as e:
        raise ImportError(
            "wfs plugin needs 'requests' (absent in this container); "
            "pass options.fetcher for offline use"
        ) from e
    resp = requests.get(url, timeout=300)
    resp.raise_for_status()
    return resp.text


@register_plugin("wfs")
def extract_wfs(spark: SparkSession, cfg: DatasetConfig) -> DataFrame:
    fetcher = cfg.options.get("fetcher", _requests_fetcher)
    rows = fetch_paginated(
        cfg.url,
        cfg.layer or cfg.id,
        fetcher,
        page_size=int(cfg.options.get("page_size", DEFAULT_PAGE_SIZE)),
        max_features=cfg.options.get("max_features"),
    )
    if not rows:
        raise ValueError(f"dataset {cfg.id}: WFS returned no features")
    return spark.createDataFrame(rows)


@register_plugin("rest")
def extract_rest(spark: SparkSession, cfg: DatasetConfig) -> DataFrame:
    """≙ lantmateriet.py:34-110 (S7): bearer-token GET → GeoJSON."""
    fetcher = cfg.options.get("fetcher")
    if fetcher is None:  # pragma: no cover - no network here

        def fetcher(url, _cfg=cfg):
            try:
                import requests
            except ImportError as e:
                raise ImportError("rest plugin needs 'requests'") from e
            headers = {}
            if token := _cfg.options.get("token"):
                headers["Authorization"] = f"Bearer {token}"
            resp = requests.get(url, headers=headers, timeout=300)
            resp.raise_for_status()
            return resp.text

    rows = parse_geojson_page(fetcher(cfg.url))
    if not rows:
        raise ValueError(f"dataset {cfg.id}: REST returned no features")
    return spark.createDataFrame(rows)
