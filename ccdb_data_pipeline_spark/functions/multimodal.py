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


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def frame_sample(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob",
                 stride: int = 4, fake: bool = True) -> DataFrame:
    """Video frame sampling plumbing: one INPUT row expands to one row per
    sampled frame (every ``stride``-th of the stream's frames). The 1->N
    expansion happens INSIDE the Arrow batch (the pandas DataFrame yielded
    is longer than the one received) — the shape a real ffmpeg-backed
    sampler needs: no explode shuffle, no driver involvement, output rows
    stay partition-local to their source blob. Frame count and digest are
    deterministic fakes of the byte content (``fake=False`` raises until
    media libs are provisioned); the schema, batching, and partitioning
    are the production plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not fake:
                raise NotImplementedError(
                    "frame decode requires ffmpeg/av libs not present in this container"
                )
            ids, idxs, digests = [], [], []
            for i, blob in zip(b[id_col], b[blob_col]):
                if blob is None:
                    continue
                n_frames = (len(blob) % 24) + 1
                for fi in range(0, n_frames, stride):
                    ids.append(i)
                    idxs.append(fi)
                    digests.append(
                        hashlib.md5(bytes(blob) + b":" + str(fi).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": pd.array(ids, dtype="int64"),
                 "frame_idx": pd.array(idxs, dtype="int32"),
                 "frame_md5": pd.array(digests, dtype=object)}
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema=_FRAME_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("scale_bp", T.LongType()),
    ]
)


def resize_stub(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob",
                box: int = 224, fake: bool = True) -> DataFrame:
    """Aspect-preserving resize-to-box plumbing over decoded dimensions
    (deterministic fake dims, same formula as decode_stub). All geometry
    is integer arithmetic (floor division) so the metadata is bit-stable
    across engines; the pixel resample itself is the stubbed step."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not fake:
                raise NotImplementedError(
                    "pixel resample requires image libs not present in this container"
                )
            lens = pd.array(
                [len(x) if x is not None else 0 for x in b[blob_col]], dtype="int64"
            )
            w = lens % 640 + 1
            h = lens % 480 + 1
            m = pd.array([max(a, c) for a, c in zip(w, h)], dtype="int64")
            yield pd.DataFrame(
                {
                    "doc_id": b[id_col].astype("int64"),
                    "width": pd.array(w, dtype="int32"),
                    "height": pd.array(h, dtype="int32"),
                    "out_w": pd.array(box * w // m, dtype="int32"),
                    "out_h": pd.array(box * h // m, dtype="int32"),
                    "scale_bp": pd.array(10000 * box // m, dtype="int64"),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema=_RESIZE_SCHEMA)


def blob_embed_stub(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob",
                    dim: int = 8, fake: bool = True) -> DataFrame:
    """Feature-extraction plumbing: binary payload -> dense embedding
    (array<double>), the input shape the similarity/ANN operators consume
    (operators/similarity.py). The fake embedding is the first ``dim``
    bytes of the content's md5, scaled by 1/256 — exact in IEEE double on
    every engine, so oracles can recompute it bit-for-bit. A production
    model server swaps into the same mapInPandas slot with identical
    schema and batching."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not fake:
                raise NotImplementedError(
                    "embedding extraction requires a model runtime not in this container"
                )
            embs = []
            for blob in b[blob_col]:
                if blob is None:
                    embs.append(None)
                    continue
                dg = hashlib.md5(bytes(blob)).digest()
                embs.append([dg[i] / 256.0 for i in range(dim)])
            yield pd.DataFrame({"doc_id": b[id_col].astype("int64"), "embedding": embs})

    return df.select(id_col, blob_col).mapInPandas(run, schema=out_schema)
