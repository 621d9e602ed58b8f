"""Vocab-driven BPE (functions/bpe.py): hand-computed merge behavior,
byte-level base, learn/apply round trip, and the Arrow-batched Spark
counting path feeding the token-budgeted operators."""

import pytest
from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.functions.bpe import (
    BpeTokenizer,
    count_tokens_udf,
    learn_merges,
)
from ccdb_data_pipeline_spark.operators.packing import pack_greedy, with_token_count


def test_hand_computed_merges():
    # classic Sennrich example shapes, computed by hand:
    # merges: (l,o) -> lo ; (lo,w) -> low ; (e,r) -> er
    tok = BpeTokenizer([("l", "o"), ("lo", "w"), ("e", "r")])
    assert tok.encode_word("low") == ["low"]
    assert tok.encode_word("lower") == ["low", "er"]
    assert tok.encode_word("lowest") == ["low", "e", "s", "t"]
    assert tok.encode_word("newer") == ["n", "e", "w", "er"]
    # rank order decides: (e,r) outranks nothing here, but merge priority
    # is by RANK not position — "erer": (e,r) rank 2 merges both pairs
    assert tok.encode_word("erer") == ["er", "er"]
    assert tok.encode("low lower low") == ["low", "low", "er", "low"]
    assert tok.count("low lower low") == 4
    assert tok.count("") == 0 and tok.count(None) == 0


def test_rank_priority_over_position():
    # (b,c) has LOWER rank than (a,b): in "abc" the rank-0 pair merges
    # first even though (a,b) occurs earlier in the string
    tok = BpeTokenizer([("b", "c"), ("a", "bc")])
    assert tok.encode_word("abc") == ["abc"]
    tok2 = BpeTokenizer([("a", "b"), ("b", "c")])
    assert tok2.encode_word("abc") == ["ab", "c"]  # (b,c) blocked after (a,b)


def test_byte_level_base():
    tok = BpeTokenizer([], byte_level=True)
    assert tok.count("abc") == 3
    assert tok.count("héllo") == 6  # é is 2 utf-8 bytes
    assert tok.count("a b  c") == 3  # whitespace never counts
    tok2 = BpeTokenizer([], byte_level=False)
    assert tok2.count("héllo") == 5  # char base: 5 chars


def test_learn_then_apply_roundtrip():
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = learn_merges(counts, 8)
    assert len(merges) == 8
    # most frequent first pair in the corpus is (e,s): 6+3 occurrences
    assert merges[0] == ("e", "s")
    tok = BpeTokenizer(merges)
    # vocabulary words compress; an unseen word still encodes (fallback
    # to chars + any applicable learned merges)
    assert len(tok.encode_word("newest")) < 6
    assert tok.encode_word("zzz") == ["z", "z", "z"]


def test_spark_counts_match_local(spark):
    texts = ["low lower", "newest widest lowest", None, "", "zzz low"]
    merges = learn_merges({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 6)
    tok = BpeTokenizer(merges)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = {
        r["id"]: r["n_tokens"]
        for r in with_token_count(df, "text", tokenizer=tok).collect()
    }
    want = {i: tok.count(t or "") for i, t in enumerate(texts)}
    assert got == want
    # empty string: 0 BPE tokens (vs whitespace proxy's 1-token edge)
    assert got[3] == 0


def test_bpe_budget_changes_packing(spark):
    """The point of tokenizer-faithful counts: the SAME documents pack
    differently under BPE counts than under the whitespace proxy."""
    rows = [(i, "internationalization " * 4) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "shard", F.lit(0)
    )
    ws = pack_greedy(
        with_token_count(df, "text"), "doc_id", "n_tokens", "shard", budget=8
    )
    tok = BpeTokenizer([], byte_level=True)  # 20 bytes/word -> 80 tokens/doc
    bpe = pack_greedy(
        with_token_count(df, "text", tokenizer=tok),
        "doc_id", "n_tokens", "shard", budget=8,
    )
    n_ws = ws.select("pack_id").distinct().count()
    n_bpe = bpe.select("pack_id").distinct().count()
    assert n_ws == 4   # 4 ws-tokens/doc -> 2 docs per 8-token pack
    assert n_bpe == 8  # 80 BPE tokens/doc -> every doc overflows alone
