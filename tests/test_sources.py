"""Source-plugin tests: WFS pagination/parse, zip+cache, registry.

Network and GDAL are absent here, so fetchers are faked — exactly the
seam the plugins expose for this purpose (≙ the reference's fake
concrete plugin strategy, tests/test_plugins.py:40-120).
"""

from __future__ import annotations

import json
import os
import zipfile

import pytest

from g_etl_spark.config import DatasetConfig
from g_etl_spark.functions import geo
from g_etl_spark.sources import extract, get_plugin
from g_etl_spark.sources import geofile, wfs


def _page(features):
    return json.dumps({"type": "FeatureCollection", "features": features})


def _feat(i, lng, lat):
    return {
        "type": "Feature",
        "properties": {"fid": i, "namn": f"obj{i}"},
        "geometry": {"type": "Point", "coordinates": [lng, lat]},
    }


def test_wfs_url_construction():
    url = wfs.build_getfeature_url("http://x/wfs", "ns:lager", count=100, start_index=200)
    assert "service=WFS" in url and "version=2.0.0" in url
    assert "typeNames=ns%3Alager" in url
    assert "count=100" in url and "startIndex=200" in url
    assert "outputFormat=application%2Fjson" in url


def test_wfs_pagination_stops_on_short_page():
    calls = []

    def fetcher(url):
        calls.append(url)
        start = int(url.split("startIndex=")[1].split("&")[0]) if "startIndex" in url else 0
        n = 3 if start == 0 else 1  # second page short -> stop
        return _page([_feat(start + i, 15.0, 59.0) for i in range(n)])

    rows = wfs.fetch_paginated("http://x/wfs", "t", fetcher, page_size=3)
    assert len(rows) == 4
    assert len(calls) == 2
    assert rows[0]["namn"] == "obj0"
    g = geo.from_wkb(rows[0]["geom"])
    assert g == ("Point", (15.0, 59.0))


def test_wfs_pagination_max_features():
    def fetcher(url):
        start = int(url.split("startIndex=")[1].split("&")[0]) if "startIndex" in url else 0
        return _page([_feat(start + i, 15.0, 59.0) for i in range(5)])

    rows = wfs.fetch_paginated("http://x/wfs", "t", fetcher, page_size=5, max_features=7)
    assert len(rows) == 7


def test_wfs_parses_polygon_and_null_geometry():
    rows = wfs.parse_geojson_page(
        _page(
            [
                {
                    "type": "Feature",
                    "properties": {"fid": 1},
                    "geometry": {
                        "type": "Polygon",
                        "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]],
                    },
                },
                {"type": "Feature", "properties": {"fid": 2}, "geometry": None},
            ]
        )
    )
    assert geo.from_wkb(rows[0]["geom"])[0] == "Polygon"
    assert rows[1]["geom"] is None


def test_wfs_plugin_via_spark(spark):
    def fetcher(url):
        return _page([_feat(i, 11.0 + i, 55.0) for i in range(4)])

    cfg = DatasetConfig(
        id="wfs_test", plugin="wfs", url="http://x/wfs", layer="t",
        options={"fetcher": fetcher, "page_size": 10},
    )
    df = extract(spark, cfg)
    assert df.count() == 4
    assert "geom" in df.columns


def test_zip_extract_and_download_cache(tmp_path):
    inner = tmp_path / "data.gpkg"
    inner.write_bytes(b"not-really-a-gpkg")
    zpath = tmp_path / "bundle.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(inner, "sub/dir/data.gpkg")

    # local-path "download" goes through the cache
    p1 = geofile.download_cached(str(zpath))
    p2 = geofile.download_cached(str(zpath))
    assert p1 == p2 and os.path.exists(p1)

    member = geofile.unzip_to_temp(p1, (".gpkg",))
    assert member.endswith("data.gpkg")
    assert open(member, "rb").read() == b"not-really-a-gpkg"

    with pytest.raises(FileNotFoundError):
        geofile.unzip_to_temp(p1, (".shp",))
    geofile.clear_download_cache()


def test_geofile_plugin_with_injected_reader(spark, tmp_path):
    """The zip plugins' full path with a fake GDAL reader (the
    import-gated seam, ≙ S9 fallback injection)."""
    inner = tmp_path / "x.gpkg"
    inner.write_bytes(b"zz")
    zpath = tmp_path / "b.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(inner, "x.gpkg")

    def reader(path, layer=None, encoding=None):
        assert path.endswith(".gpkg")
        return [
            {"fid": 1, "geom": geo.to_wkb(("Point", (674000.0, 6580000.0)))},
            {"fid": 2, "geom": geo.to_wkb(("Point", (675000.0, 6581000.0)))},
        ]

    cfg = DatasetConfig(
        id="gf", plugin="zip_geopackage", url=str(zpath), options={"reader": reader}
    )
    df = extract(spark, cfg)
    assert df.count() == 2
    geofile.clear_download_cache()


def test_registry_unknown_plugin():
    with pytest.raises(KeyError):
        get_plugin("definitely_not_a_plugin")


def test_geofile_decode_requires_gdal():
    with pytest.raises(ImportError):
        geofile.read_geofile_rows("/tmp/whatever.gpkg")


def test_wfs_short_final_page_respects_max_features():
    """Regression: a short LAST page must still be trimmed to the cap."""

    def fetcher(url):
        start = int(url.split("startIndex=")[1].split("&")[0]) if "startIndex" in url else 0
        n = 5 if start == 0 else 2  # second page short AND crosses the cap
        return _page([_feat(start + i, 15.0, 59.0) for i in range(n)])

    rows = wfs.fetch_paginated("http://x/wfs", "t", fetcher, page_size=5, max_features=6)
    assert len(rows) == 6


def test_geofile_decode_with_fake_pyogrio(monkeypatch, spark, tmp_path):
    """Exercise the GDAL decode branch itself (not the options.reader
    bypass) by injecting a fake pyogrio through the import hook."""
    import pyarrow as pa

    calls = {}

    class FakePyogrio:
        @staticmethod
        def read_arrow(path, layer=None, encoding=None):
            calls.update(path=path, layer=layer, encoding=encoding)
            table = pa.table(
                {
                    "fid": [1, 2],
                    "namn": ["å-objekt", "b"],
                    "wkb_geometry": [
                        geo.to_wkb(("Point", (674000.0, 6580000.0))),
                        geo.to_wkb(("Point", (675000.0, 6581000.0))),
                    ],
                }
            )
            return {"crs": "EPSG:3006"}, table

    monkeypatch.setattr(geofile, "_load_pyogrio", lambda: FakePyogrio)

    rows = geofile.read_geofile_rows("/data/x.gpkg", layer="lager", encoding="LATIN1")
    assert calls == {"path": "/data/x.gpkg", "layer": "lager", "encoding": "LATIN1"}
    assert [r["fid"] for r in rows] == [1, 2]
    assert "wkb_geometry" not in rows[0]
    assert geo.from_wkb(rows[0]["geom"]) == ("Point", (674000.0, 6580000.0))

    # and through the full zip plugin path (download→unzip→decode)
    inner = tmp_path / "x.gpkg"
    inner.write_bytes(b"zz")
    zpath = tmp_path / "b.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(inner, "x.gpkg")
    cfg = DatasetConfig(id="gf2", plugin="zip_geopackage", url=str(zpath), layer="lager")
    df = extract(spark, cfg)
    assert df.count() == 2 and "geom" in df.columns
    geofile.clear_download_cache()


def test_arrow_rows_geometry_column_variants():
    """pyogrio emits wkb_geometry OR geometry; only the present one is
    consumed (regression: eager-default pop used to drop both)."""
    import pyarrow as pa

    both = pa.table(
        {"fid": [1], "wkb_geometry": [b"\x01"], "geometry": [b"\x02"]}
    )
    rows = geofile._arrow_rows(both)
    assert rows[0]["geom"] == b"\x01"
    assert rows[0]["geometry"] == b"\x02"  # untouched when wkb_geometry wins

    only_geometry = pa.table({"fid": [1], "geometry": [b"\x02"]})
    assert geofile._arrow_rows(only_geometry)[0]["geom"] == b"\x02"


def test_binary_file_source(spark, tmp_path):
    (tmp_path / "a.img").write_bytes(b"\x89fakepng" * 10)
    (tmp_path / "b.img").write_bytes(b"\x89other" * 5)
    (tmp_path / "skip.txt").write_text("no")
    cfg = DatasetConfig(
        id="media", plugin="binary", url=str(tmp_path),
        options={"pathGlobFilter": "*.img"},
    )
    df = extract(spark, cfg)
    rows = df.collect()
    assert len(rows) == 2
    assert {"path", "length", "content"} <= set(df.columns)
    by_name = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in rows}
    assert by_name["a.img"].startswith(b"\x89fakepng")

    # feed straight into the multimodal decode plumbing
    import pyspark.sql.functions as F
    from g_etl_spark.operators import multimodal as M

    prepared = df.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.col("length").cast("long").alias("byte_len"),
        ).alias("media_meta"),
    )
    feats = M.fake_decode_features(prepared).collect()
    assert len(feats) == 2 and all(f.width >= 16 for f in feats)


def test_download_progress_callback(tmp_path):
    big = tmp_path / "big.bin"
    big.write_bytes(b"x" * 20000)  # > 2 chunks
    seen = []
    geofile.clear_download_cache()
    geofile.download_cached(str(big), progress=lambda d, t: seen.append((d, t)))
    assert len(seen) >= 3
    assert seen[-1] == (20000, 20000)
    assert [d for d, _ in seen] == sorted(d for d, _ in seen)
    geofile.clear_download_cache()
