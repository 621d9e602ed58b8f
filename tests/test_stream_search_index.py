"""The reference's end-to-end loop, streaming: binlog tail -> lake table ->
incrementally-maintained text index, fresh after every micro-batch."""

import os

from ccdb_data_pipeline_spark.operators.search import (
    build_inverted_index,
    incremental_postings,
)
from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import (
    gen_changes_pandas,
    gen_seed_pandas,
    write_segments,
)
from ccdb_data_pipeline_spark.streaming.stream import run_ingest
from pyspark.sql import functions as F


def test_stream_keeps_search_index_fresh(spark, tmp_path):
    seed = gen_seed_pandas(n_convs=30, seed=11)
    changes = gen_changes_pandas(800, n_convs=30, seed=11)
    write_segments(changes, str(tmp_path / "binlog"), n_segments=4)

    table = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=4, merge_mode="mor")
    )
    table.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(table, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))

    index = incremental_postings(spark, str(tmp_path / "idx"))
    refreshes = []

    def on_batch(stats):
        if not stats.skipped:
            refreshes.append(index.refresh(table))

    run_ingest(
        spark,
        str(tmp_path / "binlog"),
        table,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
        on_batch=on_batch,
    )
    assert len(refreshes) >= 2
    # after the first refresh every subsequent one is O(changed rows)
    assert all(r["n_changes"] >= 0 for r in refreshes[1:])

    # the live index equals a from-scratch rebuild of the final table
    docs = table.read().withColumn(
        "doc", F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string"))
    )
    want = {
        (r["token"], r["doc_id"]): r["tf"]
        for r in build_inverted_index(docs, text_col="text", id_col="doc").collect()
    }
    got = {
        (r["token"], f"{r['conv_id']}#{r['turn_idx']}"): r["n_rows"]
        for r in index.read().collect()
    }
    assert got == want
    assert index.applied_version() == table.current_version()
