"""Semantics of the training-batch assembly ops (operators/packing.py) and
the distributed gaps-and-islands audit (operators/gaps.py)."""

import random

from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.operators.gaps import sequence_islands
from ccdb_data_pipeline_spark.operators.packing import (
    chunk_tokens,
    pack_greedy,
    with_token_count,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _packs(spark, token_rows, budget):
    df = spark.createDataFrame(
        [(i, 0, t) for i, t in enumerate(token_rows)],
        "doc_id long, shard int, n_tokens int",
    )
    out = pack_greedy(df, "doc_id", "n_tokens", "shard", budget=budget)
    return [r["pack_id"] for r in out.orderBy("doc_id").collect()]


def test_pack_respects_budget_and_order(spark):
    # budget 10: [4,4] fit, 3 would overflow -> new pack; [3,7] exact fit
    assert _packs(spark, [4, 4, 3, 7, 5], budget=10) == [0, 0, 1, 1, 2]


def test_pack_exact_fit_stays_in_pack(spark):
    assert _packs(spark, [5, 5, 5, 5], budget=10) == [0, 0, 1, 1]


def test_pack_oversize_doc_gets_own_pack(spark):
    # a doc larger than the budget still lands somewhere (its own pack),
    # and does not absorb followers
    assert _packs(spark, [3, 25, 3, 3], budget=10) == [0, 1, 2, 2]


def test_pack_shards_are_independent(spark):
    df = spark.createDataFrame(
        [(0, 0, 6), (1, 1, 6), (2, 0, 6), (3, 1, 6)],
        "doc_id long, shard int, n_tokens int",
    )
    out = {
        (r["shard"], r["doc_id"]): r["pack_id"]
        for r in pack_greedy(df, "doc_id", "n_tokens", "shard", budget=10).collect()
    }
    # each shard restarts at pack 0 and packs only its own tokens
    assert out == {(0, 0): 0, (0, 2): 1, (1, 1): 0, (1, 3): 1}


def test_token_count_matches_split_semantics(spark):
    d = _docs(spark, [(1, "a  b\tc"), (2, ""), (3, None), (4, " x ")])
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in with_token_count(d, "text").collect()
    }
    # ''.split(' ') == [''] in both engines -> count 1 for empty/null
    assert got == {1: 3, 2: 1, 3: 1, 4: 1}


def test_chunk_windows_cover_reconstructs_document(spark):
    words = [f"w{i}" for i in range(53)]
    d = _docs(spark, [(1, " ".join(words))])
    rows = (
        chunk_tokens(d, "doc_id", "text", window=16, stride=12)
        .orderBy("chunk_idx")
        .collect()
    )
    # chunk i starts at i*stride; gluing the stride-prefixes + last chunk
    # reconstructs the document exactly (the overlap invariant)
    rebuilt = []
    for r in rows[:-1]:
        rebuilt.extend(r["chunk_text"].split(" ")[:12])
    rebuilt.extend(rows[-1]["chunk_text"].split(" "))
    assert rebuilt[: len(words)] == words
    assert all(r["n_chunk_tokens"] <= 16 for r in rows)
    # last chunk reaches the document end
    assert rows[-1]["chunk_text"].split(" ")[-1] == "w52"


def test_chunk_short_doc_is_one_chunk(spark):
    d = _docs(spark, [(1, "a b c")])
    rows = chunk_tokens(d, "doc_id", "text", window=8, stride=4).collect()
    assert len(rows) == 1 and rows[0]["chunk_text"] == "a b c"


def _islands_reference(present):
    """Single-pass reference islands over a sorted python list."""
    out = []
    for v in sorted(present):
        if out and v == out[-1][1] + 1:
            out[-1][1] = v
            out[-1][2] += 1
        else:
            out.append([v, v, 1])
    res = []
    for i, (s, e, n) in enumerate(out):
        gap = out[i + 1][0] - e - 1 if i + 1 < len(out) else 0
        res.append((s, e, n, gap))
    return res


def test_islands_two_level_matches_reference_across_seams(spark):
    rng = random.Random(7)
    present = sorted(rng.sample(range(0, 400), 230))
    df = spark.createDataFrame([(v,) for v in present], "seq long").repartition(8)
    # block_size=32 forces many islands to straddle block seams
    got = [
        (r["island_start"], r["island_end"], r["n_present"], r["gap_to_next"])
        for r in sequence_islands(df, "seq", block_size=32)
        .orderBy("island_start")
        .collect()
    ]
    assert got == _islands_reference(present)


def test_islands_contiguous_input_is_one_island(spark):
    df = spark.createDataFrame([(v,) for v in range(100)], "seq long")
    rows = sequence_islands(df, "seq", block_size=16).collect()
    assert [(r["island_start"], r["island_end"], r["n_present"], r["gap_to_next"])
            for r in rows] == [(0, 99, 100, 0)]
