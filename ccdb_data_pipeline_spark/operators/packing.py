"""Training-batch assembly: context-window packing and token-window
chunking over the deduped document corpus.

These are round-2 training-data extensions (SURVEY.md 2.9) — the reference
pipeline ends at an indexed document store (complaints/ccdb/index_ccdb.py);
an LLM training pipeline continues from there by cutting documents into
model-context-sized sequences:

- ``pack_greedy``: first-fit-in-order packing — walk each shard's documents
  in a deterministic order, start a new pack whenever adding the next
  document would exceed the token budget. Packing is inherently sequential
  (pack N's boundary depends on every earlier document), so parallelism
  comes from SHARDS: each shard packs independently inside one Arrow batch
  (applyInPandas), and shards scale out with the cluster. State per shard
  is two integers, so a shard can stream through millions of rows.
- ``chunk_tokens``: overlapping fixed-size token windows (the classic
  pretraining chunker: window W, stride S < W). Pure JVM array ops —
  split once, explode a computed chunk-index sequence, slice per chunk —
  no Python in the path, row expansion bounded by ceil(n_tokens/stride).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType


def with_token_count(df: DataFrame, text_col: str = "text",
                     out_col: str = "n_tokens", tokenizer=None) -> DataFrame:
    """Token count per row. Default: whitespace count over normalized text
    (codegen'd; matches the DuckDB oracle's ``len(string_split(...))``
    exactly, including the empty-string -> 1 edge both engines share).

    With ``tokenizer`` (a functions.bpe.BpeTokenizer): TOKENIZER-FAITHFUL
    counts — the vocab's merge table rides in the Arrow-batched UDF
    closure and each unique pre-token encodes once per executor (round-2
    verdict #3: everything budgeted in "tokens" — pack_sequences,
    context_budget, mix_token_share — can now budget in real BPE tokens
    by passing the production vocab here)."""
    if tokenizer is not None:
        from ..functions.bpe import count_tokens_udf

        udf = count_tokens_udf(tokenizer.merges, tokenizer.byte_level)
        return df.withColumn(out_col, udf(F.col(text_col)))
    words = F.split(
        F.trim(F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), r"\s+", " ")),
        " ",
    )
    return df.withColumn(out_col, F.size(words))


def pack_greedy(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    shard_col: str,
    budget: int,
) -> DataFrame:
    """Assign each row a ``pack_id`` (per shard) by first-fit-in-order
    greedy packing under ``budget`` tokens, ordering rows by ``id_col``
    within the shard. A row larger than the budget gets a pack of its own
    (it still has to be trained on — truncation is the chunker's job).

    Returns the input columns plus ``pack_id`` (int). One shuffle
    (groupBy shard); the per-shard fold is a python loop over two ints —
    numeric-only work inside an Arrow batch, no string processing.
    """
    out_schema = StructType(
        df.select(id_col, shard_col, tokens_col).schema.fields
        + [StructField("pack_id", IntegerType(), False)]
    )

    def _pack(pdf):
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        toks = pdf[tokens_col].to_numpy()
        packs = []
        pack, acc = 0, 0
        for t in toks:
            t = int(t)
            if acc > 0 and acc + t > budget:
                pack += 1
                acc = t
            else:
                acc += t
            packs.append(pack)
        out = pdf[[id_col, shard_col, tokens_col]].copy()
        out["pack_id"] = packs
        return out

    return df.groupBy(shard_col).applyInPandas(_pack, out_schema)


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Cut each document into overlapping token windows: chunk ``i`` covers
    tokens ``[i*stride, i*stride + window)``; the last chunk is the first
    one whose window reaches the end of the document (it may be shorter).

    ``n_chunks = floor((max(n - window, 0) + stride - 1) / stride) + 1`` —
    integer-exact, so the DuckDB oracle recomputes it bit-for-bit.

    Entirely JVM-side (split / sequence / explode / slice / array_join):
    stays in whole-stage codegen, and the explode emits at most
    ``ceil(n/stride)`` rows per doc — the same expansion the training
    sampler needs anyway.
    """
    if not (0 < stride <= window):
        raise ValueError(f"need 0 < stride <= window, got {stride=} {window=}")
    words = F.split(
        F.trim(F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), r"\s+", " ")),
        " ",
    )
    n = F.size(F.col("_words"))
    n_chunks = (
        F.floor(
            (F.greatest(n - F.lit(window), F.lit(0)) + F.lit(stride - 1))
            / F.lit(stride)
        )
        + 1
    ).cast("int")
    chunk = F.slice(F.col("_words"), F.col("chunk_idx") * stride + 1, window)
    return (
        df.select(F.col(id_col), words.alias("_words"))
        .select(
            id_col,
            "_words",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.size(chunk).alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )
