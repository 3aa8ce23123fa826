"""File-format sources: parquet / csv / json — native Spark scans.

≙ S1 parquet scan (pipeline_runner.py:534-537; plugins/geoparquet.py:
57-60 — including http/s3 URLs, which Hadoop FS handles via s3a://).
Native scans keep predicate pushdown and column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from g_etl_spark.config import DatasetConfig
from g_etl_spark.sources import register_plugin


@register_plugin("parquet")
def extract_parquet(spark: SparkSession, cfg: DatasetConfig) -> DataFrame:
    if not cfg.url:
        raise ValueError(f"dataset {cfg.id}: parquet plugin requires url")
    return spark.read.parquet(cfg.url)


@register_plugin("csv")
def extract_csv(spark: SparkSession, cfg: DatasetConfig) -> DataFrame:
    opts = {"header": "true", "inferSchema": "true"}
    opts.update({k: str(v) for k, v in cfg.options.get("csv", {}).items()})
    if cfg.encoding:
        opts["encoding"] = cfg.encoding  # ≙ DBF LATIN1 handling, S3
    return spark.read.options(**opts).csv(cfg.url)


@register_plugin("json")
def extract_json(spark: SparkSession, cfg: DatasetConfig) -> DataFrame:
    return spark.read.json(cfg.url)


@register_plugin("memory")
def extract_memory(spark: SparkSession, cfg: DatasetConfig) -> DataFrame:
    """In-memory rows for tests (≙ the fake concrete plugin in
    tests/test_plugins.py:40-120)."""
    rows = cfg.options.get("rows")
    schema = cfg.options.get("schema")
    if rows is None:
        raise ValueError(f"dataset {cfg.id}: memory plugin requires options.rows")
    return spark.createDataFrame(rows, schema=schema)


@register_plugin("binary")
def extract_binary_files(spark: SparkSession, cfg: DatasetConfig) -> DataFrame:
    """Raw media ingestion for multimodal pipelines: one row per file
    with (path, modificationTime, length, content BinaryType) via
    Spark's binaryFile source. Feeds operators/multimodal decode
    (mapInPandas) directly; pathGlobFilter narrows to one modality."""
    reader = spark.read.format("binaryFile")
    if glob := cfg.options.get("pathGlobFilter"):
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(cfg.url)
