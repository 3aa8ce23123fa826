"""Geo-file source (GeoPackage / Shapefile / zipped variants) with a
download cache — ≙ plugins/zip_geopackage.py, zip_shapefile.py,
geopackage.py (S2-S4, S9).

GDAL/pyogrio is not in this container, so the actual file decode is
import-try gated; everything around it — the download cache with
per-URL locking, zip extraction, layer selection, encoding option,
geometry-repair fallback — is implemented and unit-tested with local
fixtures (geometry repair runs through functions.geo.make_valid, the
same path S9 exercises via shapely buffer(0)).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import threading
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from g_etl_spark.config import DatasetConfig
from g_etl_spark.sources import register_plugin

# ≙ module-level download cache + per-URL locks (zip_geopackage.py:15-57)
_CACHE_DIR = os.path.join(tempfile.gettempdir(), "g_etl_spark_downloads")
_CACHE: dict[str, str] = {}
_LOCKS: dict[str, threading.Lock] = {}
_LOCKS_GUARD = threading.Lock()


def _url_lock(url: str) -> threading.Lock:
    with _LOCKS_GUARD:
        return _LOCKS.setdefault(url, threading.Lock())


def download_cached(
    url: str,
    fetcher: Callable[[str, str], None] | None = None,
    progress: Callable[[int, int], None] | None = None,
) -> str:
    """Download once per URL (streaming, 8KB chunks — ≙ utils/
    downloader.py:22-89 incl. its progress callbacks), serialized per
    URL so concurrent datasets sharing a source zip fetch it once.

    ``progress(bytes_done, bytes_total)`` fires per chunk
    (bytes_total = -1 when unknown), for both http and local paths.
    """
    with _url_lock(url):
        if url in _CACHE and os.path.exists(_CACHE[url]):
            return _CACHE[url]
        os.makedirs(_CACHE_DIR, exist_ok=True)
        dest = os.path.join(
            _CACHE_DIR, hashlib.md5(url.encode()).hexdigest() + "_" + os.path.basename(url)
        )
        if url.startswith(("http://", "https://")):  # pragma: no cover - no network
            if fetcher is not None:
                fetcher(url, dest)
            else:
                _stream_download(url, dest, progress)
        else:
            _chunked_copy(url, dest, progress)
        _CACHE[url] = dest
        return dest


def _chunked_copy(
    src: str, dest: str, progress: Callable[[int, int], None] | None = None
) -> None:
    total = os.path.getsize(src)
    done = 0
    with open(src, "rb") as fin, open(dest, "wb") as fout:
        while chunk := fin.read(8192):
            fout.write(chunk)
            done += len(chunk)
            if progress:
                progress(done, total)


def _stream_download(
    url: str, dest: str, progress: Callable[[int, int], None] | None = None
) -> None:  # pragma: no cover
    try:
        import requests
    except ImportError as e:
        raise ImportError("geofile download needs 'requests'") from e
    with requests.get(url, stream=True, timeout=300) as r:
        r.raise_for_status()
        total = int(r.headers.get("Content-Length", -1))
        done = 0
        with open(dest, "wb") as f:
            for chunk in r.iter_content(chunk_size=8192):
                f.write(chunk)
                done += len(chunk)
                if progress:
                    progress(done, total)


def clear_download_cache() -> None:
    """≙ cache cleanup after extract (pipeline_runner.py:427)."""
    _CACHE.clear()
    shutil.rmtree(_CACHE_DIR, ignore_errors=True)


def unzip_to_temp(zip_path: str, suffixes: tuple[str, ...]) -> str:
    """Extract and return the first member matching ``suffixes``
    (≙ zip_geopackage.py:96-147 / zip_shapefile.py:61-119)."""
    out_dir = tempfile.mkdtemp(prefix="g_etl_spark_zip_")
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(out_dir)
    for root, _dirs, fnames in os.walk(out_dir):
        for fname in sorted(fnames):
            if fname.lower().endswith(suffixes):
                return os.path.join(root, fname)
    raise FileNotFoundError(f"no {suffixes} member in {zip_path}")


def _load_pyogrio():
    """Import hook — patched by tests to inject a fake pyogrio."""
    import pyogrio  # pragma: no cover - lib absent in this container

    return pyogrio  # pragma: no cover


def _arrow_rows(table) -> list[dict]:
    """Arrow table → row dicts with the geometry column renamed to
    ``geom`` (pyogrio emits ``wkb_geometry`` for OGR sources,
    ``geometry`` for others — take whichever is present)."""
    rows = table.to_pylist()
    for r in rows:
        geom = r.pop("wkb_geometry", None)
        if geom is None:
            geom = r.pop("geometry", None)
        r["geom"] = geom
    return rows


def read_geofile_rows(
    path: str, layer: str | None = None, encoding: str | None = None
) -> list[dict]:
    """pyogrio/GDAL decode (hook-gated; ≙ ST_Read + the pyogrio
    fallback S9, plugins/zip_geopackage.py:188-235). Returns rows
    with ``geom`` WKB. The decode branch is exercised in CI by an
    injected fake pyogrio (tests/test_sources.py) since GDAL is
    absent in this container."""
    try:
        pyogrio = _load_pyogrio()
    except ImportError as e:
        raise ImportError(
            "geofile decode needs pyogrio/GDAL (absent in this container); "
            "use the parquet/wfs/memory plugins or provide options.reader"
        ) from e
    _meta, table = pyogrio.read_arrow(path, layer=layer, encoding=encoding)
    return _arrow_rows(table)


@register_plugin("zip_geopackage")
def extract_zip_geopackage(spark: SparkSession, cfg: DatasetConfig) -> DataFrame:
    local = download_cached(cfg.url, cfg.options.get("fetcher"))
    gpkg = unzip_to_temp(local, (".gpkg",))
    reader = cfg.options.get("reader", read_geofile_rows)
    return spark.createDataFrame(reader(gpkg, layer=cfg.layer, encoding=cfg.encoding))


@register_plugin("zip_shapefile")
def extract_zip_shapefile(spark: SparkSession, cfg: DatasetConfig) -> DataFrame:
    local = download_cached(cfg.url, cfg.options.get("fetcher"))
    shp = unzip_to_temp(local, (".shp",))
    reader = cfg.options.get("reader", read_geofile_rows)
    # ≙ DBF encoding default LATIN1 (zip_shapefile.py:142-143)
    return spark.createDataFrame(
        reader(shp, layer=cfg.layer, encoding=cfg.encoding or "LATIN1")
    )


@register_plugin("geopackage")
def extract_geopackage(spark: SparkSession, cfg: DatasetConfig) -> DataFrame:
    local = download_cached(cfg.url, cfg.options.get("fetcher"))
    reader = cfg.options.get("reader", read_geofile_rows)
    return spark.createDataFrame(reader(local, layer=cfg.layer, encoding=cfg.encoding))
