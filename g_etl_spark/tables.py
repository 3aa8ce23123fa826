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


# Sessions already given engine semantics, keyed by the underlying
# SparkContext applicationId (stable for the context's lifetime and
# never reused by a fresh context, unlike id(spark) after GC); lets
# callers hand us a foreign session (the verify driver) exactly once
# instead of mutating confs on every load() call.
_CONFIGURED_SESSIONS: set[str] = set()


def _ensure_session_confs(spark: SparkSession) -> None:
    """Engine semantics on a possibly-foreign session: permissive casts
    (ANSI off — TRY_CAST parity with the reference, SURVEY §1.2) and a
    reader that tolerates TIMESTAMP(NANOS) parquet. Idempotent:
    applied once per live SparkContext."""
    key = spark.sparkContext.applicationId
    if key in _CONFIGURED_SESSIONS:
        return
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _CONFIGURED_SESSIONS.add(key)


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to TIMESTAMP regardless of
    how the parquet decodes under the active Spark version:

    - TIMESTAMP(NANOS) + nanosAsLong shim → bigint nanos → truncate to
      micros (the value DuckDB produces for its TIMESTAMP).
    - Spark 4.1 reads the same files as TIMESTAMP_NTZ directly →
      cast to TIMESTAMP. The session TZ is pinned UTC (session.py), so
      the micros value is identical to the NTZ payload and the DuckDB
      hash contract is unchanged — but downstream `unix_micros` /
      `cast(bigint)` / `withWatermark` (which reject NTZ) all work.
    """
    import pyspark.sql.functions as F

    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt is not None and dt.startswith("timestamp_ntz"):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table as a DataFrame (native parquet scan)."""
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
