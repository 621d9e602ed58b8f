"""Near-dup dedup operators on planted duplicates (golden-fixture style,
mirroring the reference's edge-row fixture strategy)."""

import pytest
from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.operators.dedup_text import (
    lsh_candidate_pairs,
    minhash_lsh_dedup,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_pairs,
    word_shingles,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from "
    "the warm windowsill and the birds sing in the tall green trees outside"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one-word edit: high jaccard
FAR = "completely different content about spark shuffles and parquet files and bloom filters"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE, "en", "srcA"),
        (2, NEAR, "en", "srcA"),
        (3, BASE, "en", "srcB"),  # exact dup of 1, different block
        (4, FAR, "en", "srcA"),
        (5, "tiny", "en", "srcA"),  # < n words: no shingles
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_word_shingles(spark, docs):
    sh = word_shingles(docs, "doc_id", "text", n=3)
    counts = {r["doc_id"]: r["n"] for r in sh.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    n_words = len(BASE.split())
    assert counts[1] <= n_words - 2  # distinct shingles
    assert 5 not in counts  # too short to shingle


def test_minhash_lsh_finds_planted_pair(spark, docs):
    pairs = minhash_lsh_dedup(docs, "doc_id", "text", threshold_bp=5000).collect()
    found = {(r["id_a"], r["id_b"]): r["jaccard_bp"] for r in pairs}
    assert (1, 3) in found and found[(1, 3)] == 10000  # exact dup
    assert (1, 2) in found and found[(1, 2)] >= 7000  # near dup
    assert all(4 not in k for k in found)  # unrelated never pairs


def test_lsh_candidates_prune_pair_space(spark, docs):
    sh = word_shingles(docs, "doc_id", "text", n=3)
    sig = minhash_signatures(sh, "doc_id")
    cand = lsh_candidate_pairs(sig, "doc_id")
    cand_set = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert (1, 3) in cand_set
    # far doc shares no band with the base cluster
    assert (1, 4) not in cand_set and (2, 4) not in cand_set


def test_ngram_jaccard_respects_blocks(spark, docs):
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", ["lang", "source"], threshold_bp=5000)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got  # same block, near dup
    assert (1, 3) not in got  # exact dup but different source block


def test_simhash_array_matches_explode_reference(spark, docs):
    """The shuffle-free array-side simhash must emit bit-identical signatures
    to the explode+groupBy reference formulation (xxhash64 mode)."""
    from ccdb_data_pipeline_spark.operators.dedup_text import simhash64_explode

    new = {r["doc_id"]: r["simhash"] for r in simhash64(docs, "doc_id", "text").collect()}
    ref = {r["doc_id"]: r["simhash"] for r in simhash64_explode(docs, "doc_id", "text").collect()}
    assert new == ref


def test_simhash_md5_mode_deterministic(spark, docs):
    """md5 oracle-parity mode: identical text -> identical signature, and the
    bit definition (bit b = bit b%4 of md5-hex nibble b//4) is stable."""
    sims = {r["doc_id"]: r["simhash"] for r in simhash64(docs, "doc_id", "text", hash_mode="md5").collect()}
    assert sims[1] == sims[3]
    assert bin((sims[1] ^ sims[2]) & (2**64 - 1)).count("1") <= 12


def test_simhash_near_pairs(spark, docs):
    sim = simhash64(docs, "doc_id", "text")
    sims = {r["doc_id"]: r["simhash"] for r in sim.collect()}
    assert sims[1] == sims[3]  # identical text -> identical simhash
    assert bin(sims[1] ^ sims[2]).count("1") <= 12  # near dup -> small hamming
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_near_pairs(sim, "doc_id", max_hamming=12).collect()}
    assert pairs[(1, 3)] == 0
    assert (1, 2) in pairs


def test_duplicate_span_stats(spark):
    from ccdb_data_pipeline_spark.operators.dedup_text import duplicate_span_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),      # spans: "a b c d e", "b c d e f"
            (2, "a b c d e x"),      # shares "a b c d e" with doc 1
            (3, "z y x w v"),        # one span, unshared
            (4, "a b"),              # too short for a 5-gram -> absent
            (5, "q q q q q q q q"),  # within-doc repeats dedup to ONE span
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_shared"], r["shared_bp"])
        for r in duplicate_span_stats(docs, "doc_id", "text", n=5).collect()
    }
    assert got == {
        1: (2, 1, 5000),
        2: (2, 1, 5000),
        3: (1, 0, 0),
        5: (1, 0, 0),
    }


def test_scrub_duplicate_spans_removes_shared_spans_only(spark):
    from ccdb_data_pipeline_spark.operators.dedup_text import scrub_duplicate_spans

    shared = "alpha beta gamma delta epsilon"  # one exact 5-gram, in 2 docs
    docs = [
        (1, f"unique one two {shared} tail words here"),
        (2, f"{shared} other distinct continuation"),
        (3, "completely unrelated content of this doc"),
        (4, shared),          # fully covered -> scrubbed to ''
        (5, "tiny doc"),      # < 5 words -> no grams, untouched
        (6, None),            # null text -> 0 words, cleaned ''
    ]
    out = {
        r["doc_id"]: r
        for r in scrub_duplicate_spans(
            spark.createDataFrame(docs, "doc_id int, text string"), "doc_id", "text"
        ).collect()
    }
    assert out[1]["cleaned_text"] == "unique one two tail words here"
    assert out[1]["n_removed"] == 5
    assert out[2]["cleaned_text"] == "other distinct continuation"
    assert out[3]["n_removed"] == 0 and out[3]["cleaned_text"].startswith("completely")
    assert out[4]["cleaned_text"] == "" and out[4]["n_removed"] == 5
    assert out[5] and out[5]["cleaned_text"] == "tiny doc"
    assert out[6]["n_words"] == 0 and out[6]["cleaned_text"] == ""


def test_scrub_overlapping_duplicated_grams_union_coverage(spark):
    from ccdb_data_pipeline_spark.operators.dedup_text import scrub_duplicate_spans

    # six shared words -> two overlapping duplicated 5-grams; coverage is
    # their union (all six words), not double-removed
    six = "a b c d e f"
    docs = [(1, f"x {six} y"), (2, f"p {six} q")]
    out = {
        r["doc_id"]: r
        for r in scrub_duplicate_spans(
            spark.createDataFrame(docs, "doc_id int, text string"), "doc_id", "text"
        ).collect()
    }
    assert out[1]["cleaned_text"] == "x y" and out[1]["n_removed"] == 6
    assert out[2]["cleaned_text"] == "p q" and out[2]["n_removed"] == 6
