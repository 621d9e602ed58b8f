"""Streaming CDC-out: per-micro-batch typed change-feed emission
(emit_changes_dir), replaying the feed reconstructs the table, and a
crash-lost feed is re-emitted on the batch's exactly-once replay."""

import glob
import os

import pandas as pd
import pytest

from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import (
    gen_changes_pandas,
    gen_seed_pandas,
    write_segments,
)
from ccdb_data_pipeline_spark.streaming.stream import run_ingest, start_ingest
from tests.oracle import table_to_pandas

N_CONVS = 40
N_EVENTS = 1200
KEYS = ["conv_id", "turn_idx"]


@pytest.fixture(scope="module")
def data():
    seed = gen_seed_pandas(n_convs=N_CONVS, seed=5)
    changes = gen_changes_pandas(N_EVENTS, n_convs=N_CONVS, seed=5)
    return seed, changes


def _mk(spark, tmp_path, seed):
    t = SnapshotParquetTable(spark, str(tmp_path / "table"), TableSpec(num_buckets=8))
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    return t


def _replay_feed(spark, table, feed_dir) -> pd.DataFrame:
    """Downstream-consumer simulation: start from the bootstrap snapshot and
    fold each batch's feed (upsert post-images/inserts, drop deletes)."""
    state = table_to_pandas(table.read(version=1)).set_index(KEYS)
    for d in sorted(glob.glob(os.path.join(feed_dir, "b-*"))):
        feed = spark.read.parquet(d).toPandas()
        if feed.empty:
            continue
        ups = feed[feed["_change_type"].isin(["insert", "update_postimage"])]
        for _, r in ups.iterrows():
            state.loc[(r["conv_id"], r["turn_idx"]), :] = r[state.columns]
        for _, r in feed[feed["_change_type"] == "delete"].iterrows():
            k = (r["conv_id"], r["turn_idx"])
            if k in state.index:
                state = state.drop(index=[k])
    out = state.reset_index().sort_values(KEYS).reset_index(drop=True)
    out["turn_idx"] = out["turn_idx"].astype("int64")
    return out


def test_feed_reconstructs_final_state(spark, tmp_path, data):
    seed, changes = data
    write_segments(changes, str(tmp_path / "binlog"), n_segments=4, replay_segment=None)
    t = _mk(spark, tmp_path, seed)
    feed_dir = str(tmp_path / "feed")
    run_ingest(
        spark, str(tmp_path / "binlog"), t, str(tmp_path / "ckpt"),
        max_files_per_trigger=2, emit_changes_dir=feed_dir,
    )
    dirs = sorted(glob.glob(os.path.join(feed_dir, "b-*")))
    assert dirs, "feed dirs emitted"
    assert all(os.path.exists(os.path.join(d, "_SUCCESS")) for d in dirs)
    got = _replay_feed(spark, t, feed_dir)
    want = table_to_pandas(t.read())
    pd.testing.assert_frame_equal(
        got[want.columns].reset_index(drop=True), want.reset_index(drop=True)
    )


def test_crash_lost_feed_reemitted_on_replay(spark, tmp_path, data):
    """Crash window: batch committed to the table but its feed write lost.
    The resume replays that epoch, the ledger skips the table apply, and the
    feed for the skipped batch is re-derived from the committed snapshots."""
    seed, changes = data
    write_segments(changes, str(tmp_path / "binlog"), n_segments=4, replay_segment=None)
    t = _mk(spark, tmp_path, seed)
    feed_dir = str(tmp_path / "feed")

    class Boom(Exception):
        pass

    seen = []

    def crash_after_1(stats):
        seen.append(stats.batch_id)
        raise Boom("simulated crash after commit")

    q = start_ingest(
        spark, str(tmp_path / "binlog"), t, str(tmp_path / "ckpt"),
        max_files_per_trigger=2, on_batch=crash_after_1, emit_changes_dir=feed_dir,
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    crashed = seen[0]
    # simulate the feed write itself being the casualty of the crash
    import shutil

    lost = os.path.join(feed_dir, f"b-{crashed:010d}")
    shutil.rmtree(lost)

    resumed = []
    run_ingest(
        spark, str(tmp_path / "binlog"), t, str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
        on_batch=lambda s: resumed.append((s.batch_id, s.skipped)),
        emit_changes_dir=feed_dir,
    )
    assert (crashed, True) in resumed, "crashed epoch replayed and skipped"
    assert os.path.exists(os.path.join(lost, "_SUCCESS")), "lost feed re-emitted"
    got = _replay_feed(spark, t, feed_dir)
    want = table_to_pandas(t.read())
    pd.testing.assert_frame_equal(
        got[want.columns].reset_index(drop=True), want.reset_index(drop=True)
    )
