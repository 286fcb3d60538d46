"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata,
processed by Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is STUBBED
(``decode_image`` raises NotImplementedError; ``fake_decode_features`` is
the deterministic stand-in) — but everything Spark-side is real and
tested: the schema contract, the Arrow batch shape, the iterator-of-
DataFrames UDF signature, and the partition-level parallelism.  Swapping
the stub for PIL/ffmpeg changes one inner function, not the plan.

Scale notes: binary payloads ride the normal columnar path (parquet
BYTE_ARRAY); ``mapInPandas`` processes whole Arrow batches per call, so
per-row Python overhead is amortized ~10k×.  Metadata extraction that's
expressible as expressions (length, hash) stays JVM-side — Python is only
for the actual decode.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, sha256 string, crc32 bigint"
)
FAKE_FEATURE_DIM = 16
FAKE_FEATURES_SCHEMA = "doc_id bigint, features array<double>"


def attach_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Turn documents into multimodal rows: an opaque binary payload column
    (here: the utf-8 bytes of the text, standing in for image/audio bytes)
    plus typed metadata columns.  JVM-side only."""
    blob = F.encode(F.col(text_col), "utf-8")
    return df.select(
        "doc_id",
        blob.alias("blob"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(blob).alias("n_bytes"),
    )


def blob_meta_pandas(df: DataFrame) -> DataFrame:
    """Extract metadata from the binary column with mapInPandas — the real
    Arrow-batched UDF plumbing a decoder would use.  Deterministic, so it
    is oracle-checkable (sha256/crc32 have exact SQL equivalents).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(len).astype("int64"),
                    "sha256": blobs.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "crc32": blobs.map(
                        lambda b: zlib.crc32(bytes(b)) & 0xFFFFFFFF
                    ).astype("int64"),
                }
            )

    return df.select("doc_id", "blob").mapInPandas(extract, BLOB_META_SCHEMA)


def decode_image(df: DataFrame) -> DataFrame:
    """Image decode — STUB.  The container ships no image codecs; a real
    deployment would decode inside the same mapInPandas shape as
    ``fake_decode_features`` (PIL.Image.open over each blob)."""
    raise NotImplementedError(
        "image decode requires an image codec (PIL/opencv) not present in "
        "this environment; use fake_decode_features for the plumbing path"
    )


def fake_decode_features(df: DataFrame) -> DataFrame:
    """Deterministic stand-in for decode + feature-extract: a 16-bucket
    byte histogram (normalized) per blob.  Exercises the exact batch
    shape, schema, and partition parallelism a real decoder would."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["blob"]:
                raw = bytes(b)
                hist = [0] * FAKE_FEATURE_DIM
                for byte in raw:
                    hist[byte % FAKE_FEATURE_DIM] += 1
                total = max(len(raw), 1)
                feats.append([round(h / total, 6) for h in hist])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.select("doc_id", "blob").mapInPandas(
        extract, FAKE_FEATURES_SCHEMA
    )


def frame_sample_stub(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: pretend each blob is a container of
    fixed-size 'frames' and emit every n-th frame's offset + a frame hash.
    Real ffmpeg sampling drops into the same explode-shaped contract:
    one input row → many frame rows."""
    frame_size = 64
    n_frames = F.floor(F.octet_length("blob") / frame_size).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n)))
    # blobs shorter than one frame yield no rows (sequence(0,-1) would
    # descend, not return empty — filter first)
    df = df.where(n_frames >= 1)
    return df.select("doc_id", "blob", idx.alias("frame_idx")).select(
        "doc_id",
        "frame_idx",
        F.xxhash64(
            F.substring(F.col("blob"), F.col("frame_idx") * frame_size + 1, frame_size)
        ).alias("frame_hash"),
    )
