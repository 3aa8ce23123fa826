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
    BinaryType,
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

    The input is projected to exactly the columns ``_decode_batch``
    reads before the Python boundary: Spark cannot see which columns
    an opaque map function touches, so without the explicit select
    every other column (here: the full document text NEXT TO its
    encoded payload copy) is shipped through Arrow and read from
    storage for nothing (optimization guide §4.1).
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

    return df.select(id_col, "payload", "media_meta").mapInPandas(
        _decode_batch, FEATURE_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    frame_bytes: int = 64,
    every_n: int = 4,
) -> DataFrame:
    """Frame sampling: FAN-OUT mapInPandas — each input row yields one
    output row per sampled frame (every ``every_n``-th fixed-size
    chunk of the payload, the video-keyframe access pattern).

    REAL DECODERS NOT AVAILABLE IN THIS CONTAINER: production swaps
    the byte-slice "frame" for ffmpeg keyframe extraction inside the
    same batch function; what this exercises for real is the
    distributed shape — binary column in, Arrow batches through
    Python once, a typed MULTI-ROW-PER-INPUT result out, partition
    parallelism preserved (no shuffle: the fan-out happens inside the
    map stage, exactly where a 100 TB video corpus needs it — frames
    never travel, only their features do).
    """

    def _sample_batch(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, idxs, sizes, md5s = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(payload)
                n_frames = (len(raw) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, every_n):
                    chunk = raw[fi * frame_bytes : (fi + 1) * frame_bytes]
                    ids.append(int(doc_id))
                    idxs.append(fi)
                    sizes.append(len(chunk))
                    md5s.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": pd.Series(sizes, dtype="int64"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                }
            )

    # project to the two columns the batch fn reads (guide §4.1)
    return df.select(id_col, "payload").mapInPandas(_sample_batch, FRAME_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def fake_resize(
    df: DataFrame, id_col: str = "doc_id", target_w: int = 32, target_h: int = 32
) -> DataFrame:
    """Resize plumbing: binary-in → binary-OUT mapInPandas (the
    round-trip shape a thumbnailing pipeline needs — decoded, resized,
    re-encoded bytes leave the UDF as a binary column that writes
    straight back to parquet).

    Fake resize = truncate-or-pad the payload to target_w*target_h
    bytes (deterministic); production swaps in PIL's
    ``Image.resize`` + re-encode inside the same batch function.
    """
    size = target_w * target_h

    def _resize_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            raws = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": [
                        (r + b"\x00" * size)[:size] for r in raws
                    ],
                    "width": pd.Series([target_w] * len(raws), dtype="int32"),
                    "height": pd.Series([target_h] * len(raws), dtype="int32"),
                }
            )

    # project to the two columns the batch fn reads (guide §4.1)
    return df.select(id_col, "payload").mapInPandas(_resize_batch, RESIZED_SCHEMA)


def real_decode_stub(*_args, **_kwargs):
    """Placeholder for the real media decoder."""
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg/soundfile, not present in this "
        "container; wire the real decoder into fake_decode_features._decode_batch"
    )
