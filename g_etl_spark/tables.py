"""Testdata table access.

The driver provides deterministic TPC-H-ish parquet under
``/root/testdata/sf*/`` (see TESTDATA.md). ``load`` is a thin wrapper
over ``spark.read.parquet`` — scans stay native (predicate pushdown,
column pruning, partition pruning all apply).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table as a DataFrame (native parquet scan).

    events.parquet carries TIMESTAMP(NANOS) which Spark's reader
    rejects by default; read nanos as long and truncate to micros —
    the same µs value DuckDB produces for its TIMESTAMP, so both
    engines agree.
    """
    # Defensive session configs: the caller (e.g. the verify driver)
    # may hand us a session with Spark 4 ANSI defaults; the engine's
    # cast/division semantics are the permissive ones (SURVEY §1.2,
    # TRY_CAST parity with the reference).
    spark.conf.set("spark.sql.ansi.enabled", "false")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            import pyspark.sql.functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
