"""Streaming ⇄ batch equivalence queries (driver-oracle coverage for
the Structured Streaming family, VERDICT r2 "Next round" #5).

Each query actually RUNS a structured-streaming pipeline
(readStream → transform → sink, trigger=availableNow) over the events
testdata staged into a temp source directory, then returns the sink
contents as a DataFrame. The DuckDB oracle is the batch-equivalent
SQL, so streaming correctness gets a full hash-compared CORRECTNESS
row instead of pytest-only coverage.

Determinism notes:
- the source is ONE parquet file (coalesce(1)) so availableNow
  processes everything in a single micro-batch — the watermark starts
  at -inf and nothing is ever late-dropped, making the streaming
  result exactly the batch result;
- timestamps are emitted as epoch micros (unix_micros / epoch_us) so
  both engines hash identical integers.

Reference scope: the reference engine is batch-only (DuckDB ETL); the
streaming family is a beyond-reference extension (SURVEY §1.1) whose
batch shapes are q11 (rollup), q50 (dedup), q37/q90 (time joins).
"""

from __future__ import annotations

import itertools
import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from g_etl_spark.queries import register
from g_etl_spark.streaming import pipeline as sp
from g_etl_spark.tables import load

_RUN_IDS = itertools.count()


def _run_stream(spark: SparkSession, source_df: DataFrame, build, mode: str) -> DataFrame:
    """Stage `source_df` as a single-file stream source, run the
    streaming transform `build(stream_df)` into a memory sink with
    trigger=availableNow, and return the sink table."""
    run = next(_RUN_IDS)
    name = f"stream_equiv_{run}"
    src = tempfile.mkdtemp(prefix=f"g_etl_{name}_")
    try:
        source_df.coalesce(1).write.mode("overwrite").parquet(src)
        stream = sp.read_parquet_stream(
            spark, src, schema=source_df.schema, max_files_per_trigger=10_000
        )
        q = (
            build(stream)
            .writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        # awaitTermination returns False on timeout; a partial memory
        # sink must never masquerade as the complete result, and the
        # source dir must outlive the query (it may still be reading).
        if not q.awaitTermination(300):
            q.stop()
            q.awaitTermination(30)
            raise RuntimeError(f"stream {name} did not finish within 300s")
    finally:
        shutil.rmtree(src, ignore_errors=True)
    # the memory sink holds the rows driver-side after the query ends;
    # bounded by the aggregated/deduped result size, not the stream.
    return spark.table(name)


@register(
    "q91_stream_rollup_equiv",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           event_type,
           count(*)                 AS n,
           round(sum(value), 2)     AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q91_stream_rollup_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked windowed streaming rollup == batch daily rollup.

    Runs streaming_event_rollup (withWatermark + window agg,
    streaming/pipeline.py) over the staged events stream; complete
    mode emits the final aggregate. Scale: state is one row per
    (day, event_type) inside the watermark horizon — bounded.
    """
    events = load(spark, sf_dir, "events")
    out = _run_stream(spark, events, sp.streaming_event_rollup, "complete")
    return out.orderBy("day", "event_type")


@register(
    "q92_stream_dedup_equiv",
    oracle="""
    SELECT event_id, user_id, event_type,
           epoch_us(ts)    AS ts_us,
           round(value, 3) AS value
    FROM events
    ORDER BY event_id
    """,
)
def q92_stream_dedup_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming watermark-bounded exact dedup == batch DISTINCT.

    Plants duplicates (every 10th event re-appended) and runs
    streaming_dedup (dropDuplicatesWithinWatermark on event_id): each
    key emits exactly its first arrival, so the result is the original
    event set. Scale: state per key is reaped once the watermark
    passes it (the only dedup that survives unbounded streams).
    """
    events = load(spark, sf_dir, "events")
    corpus = events.unionByName(events.filter(F.col("event_id") % 10 == 0))
    out = _run_stream(
        spark,
        corpus,
        lambda s: sp.streaming_dedup(s, ["event_id"], watermark="1 day"),
        "append",
    )
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.round("value", 3).alias("value"),
    ).orderBy("event_id")


@register(
    "q93_stream_join_equiv",
    oracle="""
    SELECT a.user_id,
           a.event_id   AS first_id,
           b.event_id   AS then_id,
           epoch_us(a.ts) AS first_us,
           epoch_us(b.ts) AS then_us
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 1 HOUR
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    ORDER BY first_id, then_id
    """,
)
def q93_stream_join_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream time-bounded join == batch range join.

    Runs streaming_followup_join (click → purchase within 1h per
    user, watermarks both sides): with everything in one micro-batch,
    the emitted matches are exactly the batch join (batch shape:
    q37/q90). Scale: join state is bounded by the watermark horizon
    and reaped as it advances.
    """
    events = load(spark, sf_dir, "events")
    out = _run_stream(spark, events, sp.streaming_followup_join, "append")
    return out.select(
        "user_id",
        "first_id",
        "then_id",
        F.unix_micros("first_ts").alias("first_us"),
        F.unix_micros("then_ts").alias("then_us"),
    ).orderBy("first_id", "then_id")
