"""Multimodal plumbing (functions/multimodal.py): frame sampling expands
rows inside the Arrow batch, resize geometry is integer-exact, and the
embed stub's output feeds the similarity operators unchanged."""

import pytest
from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.functions.multimodal import (
    blob_embed_stub,
    frame_sample,
    resize_stub,
    to_blob,
)
from ccdb_data_pipeline_spark.operators.similarity import brute_force_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)


def test_frame_sample_expands_rows_deterministically(spark, docs):
    blobs = to_blob(docs, "text")
    frames = frame_sample(blobs, stride=4)
    rows = frames.collect()
    # every doc with a non-null blob emits >= 1 frame (frame 0 always sampled)
    n_docs = docs.filter(F.col("text").isNotNull()).count()
    assert len({r["doc_id"] for r in rows}) == n_docs
    assert all(r["frame_idx"] % 4 == 0 for r in rows)
    # deterministic across runs
    assert sorted(map(tuple, rows)) == sorted(map(tuple, frames.collect()))


def test_resize_fits_box_and_preserves_aspect_ordering(spark, docs):
    out = resize_stub(to_blob(docs, "text"), box=224).collect()
    for r in out:
        assert max(r["out_w"], r["out_h"]) <= 224
        # the longer input side maps to the longer output side
        if r["width"] > r["height"]:
            assert r["out_w"] >= r["out_h"]
        elif r["width"] < r["height"]:
            assert r["out_h"] >= r["out_w"]


def test_fake_false_raises_not_implemented(spark, docs):
    blobs = to_blob(docs, "text").limit(1)
    with pytest.raises(Exception, match="NotImplementedError|media|image|model|ffmpeg"):
        frame_sample(blobs, fake=False).collect()
    with pytest.raises(Exception, match="NotImplementedError|media|image|model|ffmpeg"):
        resize_stub(blobs, fake=False).collect()
    with pytest.raises(Exception, match="NotImplementedError|media|image|model|ffmpeg"):
        blob_embed_stub(blobs, fake=False).collect()


def test_embed_stub_feeds_similarity_operators(spark, docs):
    """The embed stub's (id, array<double>) output is drop-in input for the
    ANN operators — same schema contract as the embeddings table."""
    emb = blob_embed_stub(to_blob(docs, "text"), dim=8)
    queries = emb.limit(3)
    top = brute_force_topk(emb, queries, id_col="doc_id", vec_col="embedding", k=2)
    rows = top.collect()
    qids = {r["qid"] for r in rows}
    assert len(qids) == 3
    for r in rows:
        assert r["neighbor_id"] != r["qid"]
        assert r["rank"] in (1, 2)
