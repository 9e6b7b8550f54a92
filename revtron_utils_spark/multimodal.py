"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side architecture is real and tested — schema contract,
partition-preserving batch iteration, bounded batch sizes
(``spark.sql.execution.arrow.maxRecordsPerBatch``), no driver collect.
The actual media decode is STUBBED: this container has no image/audio
libraries, so ``decode_image`` raises ``NotImplementedError`` and the
feature extractor uses a deterministic byte-level stand-in. Swapping the
stub for PIL/librosa/ffmpeg changes only the inside of the pandas
function — the distributed plumbing is identical.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("feat_hash", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires an imaging library not present in
    this container. The pipeline around it is fully functional; plug in
    PIL here on a real cluster."""
    raise NotImplementedError("image decode requires PIL/opencv; not available in this container")


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a media feature vector: bytes →
    sha256 → ``dim`` floats in [0, 1). Stable across runs and engines."""
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str = "doc_id") -> DataFrame:
    """Demo adapter: treat each document's UTF-8 bytes as an opaque media
    payload with metadata columns (a real pipeline reads these from blob
    storage with ``binaryFile`` format: spark.read.format('binaryFile'))."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads. Runs
    per-partition (``mapInPandas``) — each task streams record batches,
    never materializing the partition; scales to arbitrarily large media
    tables as long as individual payloads fit executor memory."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "feat_hash": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()[:16]
                    ),
                    "feature": payloads.map(lambda b: _fake_features(b or b"", dim)),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: explodes a (stubbed)
    frame index per row. With a real decoder the pandas function would
    emit one row per sampled frame; here frame count derives
    deterministically from payload length."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                n_frames = (len(r["payload"]) if r["payload"] is not None else 0) // 100 + 1
                for idx in range(0, n_frames, every_nth):
                    rows.append((r["doc_id"], idx, hashlib.sha256(
                        (r["payload"] or b"") + idx.to_bytes(4, "big")
                    ).hexdigest()[:16]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_hash"])

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_hash", T.StringType(), True),
        ]
    )
    return df.mapInPandas(batches, schema)
