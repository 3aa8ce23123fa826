"""Multimodal-column query family: binary payloads with typed
metadata, decoded via mapInPandas (operators/multimodal.py).

The fake decoder derives features deterministically from payload byte
length, so even the mapInPandas plumbing has a full DuckDB oracle —
the schema/batch contract is verified end-to-end, and a real decoder
(PIL/ffmpeg) drops into the same batch function.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from g_etl_spark.operators import multimodal as M
from g_etl_spark.queries import register
from g_etl_spark.tables import load


@register(
    "q70_multimodal_meta",
    oracle="""
    SELECT source,
           count(*)                                  AS n_docs,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           round(avg(octet_length(encode(text))), 2) AS avg_bytes,
           max(octet_length(encode(text)))           AS max_bytes
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def q70_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload column + typed metadata struct, aggregated per
    source (parquet BYTE_ARRAY plumbing; payload never crosses into
    Python)."""
    d = M.attach_binary_payload(load(spark, sf_dir, "documents"))
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("media_meta.byte_len")).alias("total_bytes"),
            F.round(F.avg(F.col("media_meta.byte_len")), 2).alias("avg_bytes"),
            F.max(F.col("media_meta.byte_len")).alias("max_bytes"),
        )
        .orderBy("source")
    )


@register(
    "q71_multimodal_decode",
    oracle="""
    SELECT doc_id,
           'text/plain'                         AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT)             AS byte_len,
           CAST(octet_length(encode(text)) % 640 + 16 AS INTEGER) AS width,
           CAST(octet_length(encode(text)) % 480 + 16 AS INTEGER) AS height,
           CAST(octet_length(encode(text)) % 24 + 1 AS INTEGER)   AS n_frames
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
)
def q71_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode/feature-extract over Arrow batches
    (operators/multimodal.fake_decode_features). The fake decode is
    deterministic from byte length, so the whole distributed path —
    binary column → Arrow batch → pandas → typed schema — is
    oracle-verified."""
    d = M.attach_binary_payload(
        load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    )
    return M.fake_decode_features(d).orderBy("doc_id")


@register(
    "q100_frame_sample",
    oracle="""
    WITH frames AS (
        SELECT doc_id,
               CAST(unnest(range(0, CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT), 4)) AS INTEGER) AS frame_idx,
               text
        FROM documents
        WHERE doc_id < 100
    )
    SELECT doc_id, frame_idx,
           CAST(octet_length(encode(substr(text, frame_idx * 64 + 1, 64))) AS BIGINT) AS frame_bytes,
           md5(substr(text, frame_idx * 64 + 1, 64)) AS frame_md5
    FROM frames
    ORDER BY doc_id, frame_idx
    """,
)
def q100_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe sampling over binary payloads: every 4th 64-byte
    frame per document, FAN-OUT inside mapInPandas
    (operators/multimodal.sample_frames) — one input row yields many
    typed frame rows without any shuffle; frames are hashed in
    Python, only features leave the executor. The fake frame decode
    is a byte slice, so DuckDB reproduces it exactly (ascii corpus:
    char offsets == byte offsets) and the whole fan-out contract is
    hash-verified.
    """
    d = M.attach_binary_payload(
        load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    )
    return M.sample_frames(d).orderBy("doc_id", "frame_idx")
