"""Python UDTF surface (SURVEY 2.8) — the one UDF kind the engine had not
exercised: a table-valued function usable in SQL's FROM clause with
LATERAL correlation.

`ChunkUdtf` re-expresses `operators/packing.chunk_tokens` (overlapping
token windows) as a UDTF so the two surfaces can be byte-compared — and
the comparison is the point: the UDTF is row-at-a-time Python (one eval()
per input row, pickled rows both ways unless arrow-optimized), while the
JVM explode/slice plan stays in whole-stage codegen. The engine SHIPS the
JVM plan (`chunk_windows` query); the UDTF exists as the extension surface
for logic that genuinely cannot be expressed with builtin generators —
registered per-session via `register_udtfs(spark)` and then usable as

    SELECT d.doc_id, c.*
    FROM docs d, LATERAL chunk_udtf(d.text, 32, 24) c

Tokenization matches chunk_tokens exactly: whitespace runs collapse to one
space, trim, split on single space (so an empty/null text yields one empty
token, hence one empty chunk — same as Spark's split semantics).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

_CHUNK_SCHEMA = StructType(
    [
        StructField("chunk_idx", IntegerType()),
        StructField("chunk_text", StringType()),
    ]
)


class ChunkUdtf:
    def eval(self, text: str, window: int, stride: int):
        if not (0 < stride <= window):
            raise ValueError(f"need 0 < stride <= window, got {stride=} {window=}")
        words = re.sub(r"\s+", " ", text or "").strip().split(" ")
        n = len(words)
        n_chunks = (max(n - window, 0) + stride - 1) // stride + 1
        for i in range(n_chunks):
            yield i, " ".join(words[i * stride : i * stride + window])


def chunk_udtf():
    """Decorated UDTF handle (decoration is deferred to call time: the
    ``udtf()`` wrapper resolves its return schema against the active
    session, so module import must stay session-free)."""
    return udtf(ChunkUdtf, returnType=_CHUNK_SCHEMA)


def register_udtfs(spark) -> None:
    """Register the UDTF catalog for SQL use (idempotent per session)."""
    spark.udtf.register("chunk_udtf", chunk_udtf())
