"""Incrementally-maintained inverted index == full rebuild, through updates,
deletes and multi-batch ingest (the ES-index-freshness loop, IVM-style)."""

import pandas as pd

from ccdb_data_pipeline_spark.operators.search import (
    build_inverted_index,
    incremental_postings,
)
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from pyspark.sql import functions as F


def _batch(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    return spark.createDataFrame(pdf, CHANGE_SCHEMA)


def _postings_of_table(t):
    docs = t.read().withColumn(
        "doc", F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string"))
    )
    return {
        (r["token"], r["doc_id"]): r["tf"]
        for r in build_inverted_index(docs, text_col="text", id_col="doc").collect()
    }


def _postings_of_view(v):
    return {
        (r["token"], f"{r['conv_id']}#{r['turn_idx']}"): r["n_rows"]
        for r in v.read().collect()
    }


def test_incremental_index_tracks_updates_and_deletes(spark, tmp_path):
    TS = pd.Timestamp("2025-01-01")
    TS2 = pd.Timestamp("2025-01-02")
    t = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=2, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    view = incremental_postings(spark, str(tmp_path / "idx"))

    t.merge(
        _batch(
            spark,
            [
                (1, "I", "a", 0, "user", "spark join club", None, TS),
                (2, "I", "a", 1, "user", "filter filter join", None, TS),
                (3, "I", "b", 0, "user", "the quick scan", None, TS),
            ],
        ),
        batch_id=0,
    )
    view.refresh(t)
    assert _postings_of_view(view) == _postings_of_table(t)
    assert _postings_of_view(view)[("filter", "a#1")] == 2

    # update rewrites a turn's text: old tokens retracted, new ones added
    t.merge(
        _batch(spark, [(4, "U", "a", 1, "user", "broadcast join", None, TS2)]),
        batch_id=1,
    )
    # delete removes a turn: its postings drop out at tf=0
    t.merge(_batch(spark, [(5, "D", "b", 0, None, None, None, TS2)]), batch_id=2)
    stats = view.refresh(t)
    assert stats["n_changes"] > 0
    got = _postings_of_view(view)
    assert got == _postings_of_table(t)
    assert ("filter", "a#1") not in got and got[("broadcast", "a#1")] == 1
    assert not any(doc == "b#0" for (_, doc) in got)

    # refresh with nothing new is a no-op
    assert view.refresh(t)["n_changes"] == 0


def test_bm25_over_incremental_equals_batch_rebuild(spark, tmp_path):
    """Ranked retrieval from the IVM-maintained postings == BM25 computed
    from a full rescan of the table, through an update that changes both
    term frequencies and a document length."""
    from ccdb_data_pipeline_spark.operators.search import bm25_over_incremental, search_bm25

    TS = pd.Timestamp("2025-01-01")
    TS2 = pd.Timestamp("2025-01-02")
    t = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=2, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    view = incremental_postings(spark, str(tmp_path / "idx"))

    t.merge(
        _batch(
            spark,
            [
                (1, "I", "a", 0, "user", "spark join club", None, TS),
                (2, "I", "a", 1, "user", "filter filter join", None, TS),
                (3, "I", "b", 0, "user", "the quick scan filter", None, TS),
            ],
        ),
        batch_id=0,
    )
    view.refresh(t)
    t.merge(
        _batch(
            spark,
            [
                (4, "U", "a", 1, "user", "join join join plus filter words", None, TS2),
                (5, "D", "b", 0, None, None, None, TS2),
                (6, "I", "c", 0, "user", "filter me", None, TS2),
            ],
        ),
        batch_id=1,
    )
    view.refresh(t)

    inc = {r["doc_id"]: (r["n_terms"], round(r["score"], 12)) for r in
           bm25_over_incremental(view, ["join", "filter"]).collect()}
    docs = t.read().withColumn(
        "doc", F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string"))
    )
    full = {r["doc_id"]: (r["n_terms"], round(r["score"], 12)) for r in
            search_bm25(docs, ["join", "filter"], text_col="text", id_col="doc").collect()}
    assert inc == full and len(inc) >= 3
