"""Structured Streaming ingest: ordered segment tail, exactly-once across
crash-resume, ledger continuity (SURVEY.md section 7 M2)."""

import os

import pytest

from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.plans.lineage import lineage_rows
from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import (
    gen_changes_pandas,
    gen_seed_pandas,
    write_segments,
)
from ccdb_data_pipeline_spark.streaming.stream import run_ingest, start_ingest
from tests.oracle import assert_tables_equal, replay, table_to_pandas

N_CONVS = 40
N_EVENTS = 1500


@pytest.fixture(scope="module")
def data():
    seed = gen_seed_pandas(n_convs=N_CONVS, seed=42)
    changes = gen_changes_pandas(N_EVENTS, n_convs=N_CONVS, seed=42)
    return seed, changes


def _mk(spark, tmp_path, seed):
    t = SnapshotParquetTable(spark, str(tmp_path / "table"), TableSpec(num_buckets=8))
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    return t


def test_stream_ingest_with_replay_and_late_arrivals(spark, tmp_path, data):
    seed, changes = data
    late = 1 + N_EVENTS // 2  # edge-override late update lsn
    write_segments(
        changes, str(tmp_path / "binlog"), n_segments=6, replay_segment=1, late_lsns=(late,)
    )
    t = _mk(spark, tmp_path, seed)
    run_ingest(spark, str(tmp_path / "binlog"), t, str(tmp_path / "ckpt"), max_files_per_trigger=2)
    assert_tables_equal(table_to_pandas(t.read()), replay(seed, [changes]))
    # ledger covers the whole stream incl. the duplicated segment's range
    rows = lineage_rows(t)
    assert rows[0]["lsn_min"] == 1
    assert max(r["lsn_max"] for r in rows) == N_EVENTS


def test_crash_resume_exactly_once(spark, tmp_path, data):
    """Kill after a committed-but-not-checkpointed batch; resume must skip the
    replayed epoch (ledger gate) and converge to the oracle state."""
    seed, changes = data
    write_segments(changes, str(tmp_path / "binlog"), n_segments=6, replay_segment=None)
    t = _mk(spark, tmp_path, seed)

    class Boom(Exception):
        pass

    seen = []

    def crash_after_2(stats):
        seen.append(stats.batch_id)
        if len(seen) >= 2:
            raise Boom("simulated crash")

    q = start_ingest(
        spark, str(tmp_path / "binlog"), t, str(tmp_path / "ckpt"),
        max_files_per_trigger=2, on_batch=crash_after_2,
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    committed = [r["batch_id"] for r in lineage_rows(t)]
    assert committed == [0, 1]

    resumed = []
    run_ingest(
        spark, str(tmp_path / "binlog"), t, str(tmp_path / "ckpt"),
        max_files_per_trigger=2, on_batch=lambda s: resumed.append((s.batch_id, s.skipped)),
    )
    # batch 1 replays (its epoch wasn't checkpointed) and is skipped by the ledger
    assert (1, True) in resumed
    assert all(not sk for b, sk in resumed if b > 1)

    assert_tables_equal(table_to_pandas(t.read()), replay(seed, [changes]))
    rows = lineage_rows(t)
    ids = [r["batch_id"] for r in rows]
    assert ids == sorted(set(ids)), "no duplicate ledger entries"
    for a, b in zip(rows, rows[1:]):
        assert a["lsn_max"] < b["lsn_min"], "contiguous non-overlapping LSN ranges"


def test_checkpoint_offsets_skip_processed_segments(spark, tmp_path, data):
    """New segments appended after a drain are picked up; old ones aren't re-read
    (the watermark-pull analog, salesforce/query.py:32-33)."""
    seed, changes = data
    first, second = changes.iloc[:1000], changes.iloc[1000:]
    write_segments(first, str(tmp_path / "binlog"), n_segments=3, replay_segment=None)
    t = _mk(spark, tmp_path, seed)
    run_ingest(spark, str(tmp_path / "binlog"), t, str(tmp_path / "ckpt"), max_files_per_trigger=4)
    n_batches_1 = len(lineage_rows(t))

    # append the delta as new segment files (later mtimes)
    paths = write_segments(second, str(tmp_path / "binlog2"), n_segments=2, replay_segment=None)
    for i, p in enumerate(paths):
        dst = str(tmp_path / "binlog" / f"segment-1{i:04d}.parquet")
        os.rename(p, dst)
        os.utime(dst, (1_800_000_000 + i, 1_800_000_000 + i))
    run_ingest(spark, str(tmp_path / "binlog"), t, str(tmp_path / "ckpt"), max_files_per_trigger=4)
    rows = lineage_rows(t)
    assert len(rows) > n_batches_1
    assert max(r["lsn_max"] for r in rows) == N_EVENTS
    assert_tables_equal(table_to_pandas(t.read()), replay(seed, [changes]))
