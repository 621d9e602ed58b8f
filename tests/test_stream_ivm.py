"""Streaming ingest + incremental view maintenance, composed: an
IncrementalAggView refreshed from on_batch tracks the table through every
micro-batch, pays O(changes) per refresh, and converges across a
mid-stream crash (marker swap keeps the visible state consistent)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
from ccdb_data_pipeline_spark.plans.ivm import IncrementalAggView
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import (
    gen_changes_pandas,
    gen_seed_pandas,
    write_segments,
)
from ccdb_data_pipeline_spark.streaming.stream import run_ingest, start_ingest

N_CONVS = 40
N_EVENTS = 1500


def _recompute(table):
    return (
        table.read()
        .groupBy("role")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
        )
    )


def _sorted_pdf(df):
    pdf = df.toPandas()
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True).astype(str)


def _mk(spark, tmp_path):
    t = SnapshotParquetTable(
        spark, str(tmp_path / "table"), TableSpec(num_buckets=8, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(
        t, spark.createDataFrame(gen_seed_pandas(n_convs=N_CONVS, seed=7), TRANSCRIPT_SCHEMA)
    )
    view = IncrementalAggView(
        spark, str(tmp_path / "view"), ["role"], {"n_chars": "length(text)"}
    )
    return t, view


def test_view_tracks_streaming_ingest(spark, tmp_path):
    t, view = _mk(spark, tmp_path)
    changes = gen_changes_pandas(N_EVENTS, n_convs=N_CONVS, seed=7)
    write_segments(changes, str(tmp_path / "binlog"), n_segments=6, replay_segment=None)

    refresh_stats = []

    def maintain(stats):
        refresh_stats.append(view.refresh(t))

    q = start_ingest(
        spark, str(tmp_path / "binlog"), t, str(tmp_path / "ckpt"),
        max_files_per_trigger=2, on_batch=maintain,
    )
    q.awaitTermination()
    assert len(refresh_stats) >= 2  # maintained per micro-batch, not once
    # after the first (full-build) refresh, each refresh is incremental
    assert all(s["n_changes"] >= 0 for s in refresh_stats[1:])
    pd.testing.assert_frame_equal(_sorted_pdf(view.read()), _sorted_pdf(_recompute(t)))


def test_view_converges_across_crash_resume(spark, tmp_path):
    t, view = _mk(spark, tmp_path)
    changes = gen_changes_pandas(N_EVENTS, n_convs=N_CONVS, seed=7)
    write_segments(changes, str(tmp_path / "binlog"), n_segments=6, replay_segment=None)

    calls = []

    def crash_mid_refresh(stats):
        view.refresh(t)
        calls.append(stats.batch_id)
        if len(calls) >= 2:
            raise RuntimeError("simulated crash after refresh")

    q = start_ingest(
        spark, str(tmp_path / "binlog"), t, str(tmp_path / "ckpt"),
        max_files_per_trigger=2, on_batch=crash_mid_refresh,
    )
    with pytest.raises(Exception):
        q.awaitTermination()

    # resume: the view picks up exactly where its marker points, replaying
    # the same change window idempotently if the crash raced the swap
    run_ingest(
        spark, str(tmp_path / "binlog"), t, str(tmp_path / "ckpt"),
        max_files_per_trigger=2, on_batch=lambda s: view.refresh(t),
    )
    pd.testing.assert_frame_equal(_sorted_pdf(view.read()), _sorted_pdf(_recompute(t)))
