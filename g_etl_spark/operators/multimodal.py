"""Multimodal column plumbing: opaque binary payloads + typed
metadata, decoded/feature-extracted via Arrow-batched pandas UDFs.

Image/audio/video libraries are not available in this environment, so
the decode step is a clearly-marked deterministic fake (see
``fake_decode_features``) — but the Spark-side plumbing is real and
what matters at scale: binary columns travel as parquet BYTE_ARRAY,
the decoder runs as ``mapInPandas`` over Arrow batches (one Python
round-trip per batch, not per row), and the output schema is typed
and stable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal row: binary payload + typed metadata struct.

    In production the payload is the raw media bytes (read via
    ``spark.read.format('binaryFile')`` or from a parquet binary
    column); here it is the utf-8 encoding of the text column, which
    keeps everything deterministic and oracle-checkable.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumns(
        {
            "payload": payload,
            "media_meta": F.struct(
                F.lit("text/plain").alias("media_type"),
                F.length(payload).cast("long").alias("byte_len"),
            ),
        }
    )


def fake_decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode + feature-extract via ``mapInPandas``.

    REAL DECODERS NOT AVAILABLE IN THIS CONTAINER: a production build
    plugs PIL/ffmpeg/soundfile into ``_decode_batch`` below; this
    implementation derives deterministic fake features from the
    payload length so the distributed plumbing (Arrow batch shape,
    schema contract, partition-parallel execution) is fully exercised
    and testable.
    """

    def _decode_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            # -- deterministic fake decode (stands in for PIL.Image.open etc.)
            blen = pdf["payload"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media_type": pdf["media_meta"].map(lambda m: m["media_type"]),
                    "byte_len": blen,
                    "width": (blen % 640 + 16).astype("int32"),
                    "height": (blen % 480 + 16).astype("int32"),
                    "n_frames": (blen % 24 + 1).astype("int32"),
                }
            )

    return df.mapInPandas(_decode_batch, FEATURE_SCHEMA)


def real_decode_stub(*_args, **_kwargs):
    """Placeholder for the real media decoder."""
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg/soundfile, not present in this "
        "container; wire the real decoder into fake_decode_features._decode_batch"
    )
