"""Consumer-lag probe: ingest_lag_report measures exactly how far the table
trails the binlog (pending events = source rows above the ledger cutoff),
and the probe's predicate prunes fully-applied segments at the scan."""

import os

from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.plans.lineage import ingest_lag_report
from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import (
    gen_changes_pandas,
    gen_seed_pandas,
    write_segments,
)
from ccdb_data_pipeline_spark.streaming.stream import run_ingest


def test_lag_tracks_unapplied_tail(spark, tmp_path):
    work = str(tmp_path)
    binlog = os.path.join(work, "binlog")
    seed = gen_seed_pandas(n_convs=30, seed=42)
    changes = gen_changes_pandas(1200, n_convs=30, seed=42)
    # first 800 events in segments 1..4, the rest arrives "later"
    write_segments(changes.iloc[:800], binlog, n_segments=4)
    table = SnapshotParquetTable(
        spark, os.path.join(work, "t"), TableSpec(num_buckets=4, merge_mode="mor")
    )
    table.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(table, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))

    run_ingest(spark, binlog, table, os.path.join(work, "ckpt"))
    rep = ingest_lag_report(spark, binlog, table)
    assert rep["pending_events"] == 0
    assert rep["source_lsn_max"] == rep["applied_lsn"] == int(changes["lsn"].iloc[799])
    assert rep["oldest_pending_ts"] is None
    assert rep["seconds_since_last_commit"] is not None

    # the tail lands but is not ingested yet -> exact pending count + bounds
    tail = changes.iloc[800:]
    write_segments(tail, binlog, n_segments=2, replay_segment=None, start_segment=6)
    rep = ingest_lag_report(spark, binlog, table)
    assert rep["pending_events"] == 400
    assert rep["source_lsn_max"] == int(changes["lsn"].iloc[-1])
    assert rep["applied_lsn"] == int(changes["lsn"].iloc[799])
    live_ts = tail["ts"].dropna()
    assert rep["oldest_pending_ts"] == live_ts.min().to_pydatetime()
    assert rep["newest_pending_ts"] == live_ts.max().to_pydatetime()

    # resume drains the tail -> lag back to zero
    run_ingest(spark, binlog, table, os.path.join(work, "ckpt"))
    rep = ingest_lag_report(spark, binlog, table)
    assert rep["pending_events"] == 0
    assert rep["applied_lsn"] == int(changes["lsn"].iloc[-1])


def test_lag_probe_pushes_cutoff_filter(spark, tmp_path):
    """The probe's lsn > cutoff predicate must reach the parquet scan
    (PushedFilters), so applied history is skipped from footer stats."""
    from pyspark.sql import functions as F

    binlog = os.path.join(str(tmp_path), "binlog")
    changes = gen_changes_pandas(400, n_convs=10, seed=7)
    write_segments(changes, binlog, n_segments=2)
    plan = (
        spark.read.parquet(binlog)
        .filter(F.col("lsn") > 200)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "GreaterThan(lsn,200)" in plan
