"""Testdata table access.

The driver provides deterministic TPC-H-ish parquet under
``/root/testdata/sf*/`` (see TESTDATA.md). ``load`` is a thin wrapper
over ``spark.read.parquet`` — scans stay native (predicate pushdown,
column pruning, partition pruning all apply).
"""

from __future__ import annotations

import os
import weakref

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


# Sessions already given engine semantics. The confs below are
# per-SparkSession (spark.newSession() shares the context but NOT SQL
# confs), so the memo must be per-session too: a WeakSet keyed by the
# live session object — a dead session drops out on GC, so its slot
# can never alias a fresh session the way a bare id() (or a
# context-wide applicationId) key could.
_CONFIGURED_SESSIONS: weakref.WeakSet = weakref.WeakSet()


def _ensure_session_confs(spark: SparkSession) -> None:
    """Engine semantics on a possibly-foreign session: permissive casts
    (ANSI off — TRY_CAST parity with the reference, SURVEY §1.2) and a
    reader that tolerates TIMESTAMP(NANOS) parquet. Idempotent:
    applied once per live SparkSession (newSession() siblings each get
    their own application of the confs)."""
    if spark in _CONFIGURED_SESSIONS:
        return
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _CONFIGURED_SESSIONS.add(spark)


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
