"""Source plugins — ≙ reference plugins/ (base.py:21-53 contract).

Each plugin is ``extract(spark, config) -> DataFrame``; the registry
maps plugin names from datasets.yml. Network/GDAL-dependent sources
are import-try gated (requests/pyogrio are not in this container) but
their control flow — pagination, caching, encoding, schema handling —
is implemented and unit-tested against local fixtures.

| plugin      | ≙ reference                  | Spark path |
|-------------|------------------------------|------------|
| parquet     | geoparquet.py:57-60 (S1)     | native scan |
| csv / json  | (format variants)            | native scan |
| memory      | tests' fake plugin           | createDataFrame |
| geofile     | zip_geopackage/shapefile (S2-S4,S9) | pyogrio→Arrow |
| wfs         | wfs.py:69-201 (S5-S6)        | driver pagination → union |
| rest        | lantmateriet.py (S7)         | driver GET → json |
| jdbc        | mssql.py:40-166 (S8)         | spark.read.jdbc |
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from g_etl_spark.config import DatasetConfig

ExtractFn = Callable[[SparkSession, DatasetConfig], DataFrame]

_REGISTRY: dict[str, ExtractFn] = {}


def register_plugin(name: str):
    def deco(fn: ExtractFn) -> ExtractFn:
        _REGISTRY[name] = fn
        return fn

    return deco


def get_plugin(name: str) -> ExtractFn:
    """≙ registry get_plugin errors (tests/test_plugins.py)."""
    _load()
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown plugin '{name}'; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def _load() -> None:
    from g_etl_spark.sources import files, geofile, jdbc, wfs  # noqa: F401


def extract(spark: SparkSession, cfg: DatasetConfig) -> DataFrame:
    """Run the configured plugin for one dataset."""
    return get_plugin(cfg.plugin)(spark, cfg)
