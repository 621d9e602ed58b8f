"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The decode step is STUBBED (no image/audio libs in this container) behind
``decode_stub`` — a deterministic fake that proves the Spark-side plumbing
(binary schema, Arrow batch shape, partition-friendly UDF signature) while
raising clearly if someone expects real pixels. Feature extraction over the
binary column (byte length, sha256 content id, chunking) is real.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOB_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha256_hex", T.StringType()),
        T.StructField("n_chunks", T.IntegerType()),
    ]
)


def to_blob(df: DataFrame, text_col: str = "text", out_col: str = "blob") -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 bytes of text —
    stand-in for image/audio payloads with identical downstream plumbing)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))


def blob_meta(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob",
              chunk_bytes: int = 1024) -> DataFrame:
    """Typed metadata over binary payloads via mapInPandas (Arrow carries
    bytes natively — no base64, no per-row Python function calls outside
    the vectorized loop)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            blobs = b[blob_col]
            yield pd.DataFrame(
                {
                    "doc_id": b[id_col].astype("int64"),
                    "byte_len": [len(x) if x is not None else 0 for x in blobs],
                    "sha256_hex": [
                        hashlib.sha256(x).hexdigest() if x is not None else None for x in blobs
                    ],
                    "n_chunks": [
                        -(-len(x) // chunk_bytes) if x is not None else 0 for x in blobs
                    ],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema=BLOB_META_SCHEMA)


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def decode_stub(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob",
                fake: bool = True) -> DataFrame:
    """Image/video decode placeholder. ``fake=True`` emits deterministic
    metadata derived from the byte content (so pipelines and tests run);
    ``fake=False`` raises NotImplementedError — the honest production stub
    until PIL/ffmpeg are provisioned on the cluster."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio libs not present in this container"
                )
            lens = [len(x) if x is not None else 0 for x in b[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": b[id_col].astype("int64"),
                    "width": [(n % 640) + 1 for n in lens],
                    "height": [(n % 480) + 1 for n in lens],
                    "n_frames": [(n % 24) + 1 for n in lens],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema=_DECODE_SCHEMA)
