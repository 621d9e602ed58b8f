"""Change-feed gap recovery (round-3 verdict item #7): a replication
consumer whose checkpointed feed position predates what expire_snapshots
retained must (1) get ChangeFeedGapError, never a silently truncated feed,
and (2) recover exactly-once via resume_from_gap — re-bootstrap from the
oldest retained snapshot with original dominance pairs, then continue the
feed from there with ledger-offset epoch ids. Final target state must
equal the pandas replay oracle: no duplicates, no holes, deletes included
even when the deleting commits themselves expired."""

import datetime as dt
import os
import sys

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.datasource import (
    ChangeFeedGapError,
    _change_file_partitions,
    feed_floor,
    register,
    resume_from_gap,
)
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle import replay, table_to_pandas, assert_tables_equal  # noqa: E402


def _pdf(df):
    return (
        df.toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_gap_then_recover_equals_oracle(spark, tmp_path):
    spec = TableSpec(num_buckets=4, merge_mode="mor")
    src = SnapshotParquetTable(spark, str(tmp_path / "src"), spec)
    src.create(TRANSCRIPT_SCHEMA)
    seed = gen_seed_pandas(n_convs=25, seed=21)
    bootstrap_seed(src, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    changes = gen_changes_pandas(600, n_convs=25, seed=21)
    halves = np.array_split(changes, 4)
    register(spark)

    tgt = SnapshotParquetTable(spark, str(tmp_path / "tgt"), spec)
    tgt.create(TRANSCRIPT_SCHEMA)

    # consumer replicates the FIRST part of the history...
    apply_changes(src, spark.createDataFrame(halves[0], CHANGE_SCHEMA), batch_id=0)
    ckpt_version = src.current_version()

    def replicate(starting, ckpt, offset=0):
        feed = (
            spark.readStream.format("transcript_changes")
            .option("startingVersion", starting)
            .load(src.root)
        )
        user_cols = [f.name for f in TRANSCRIPT_SCHEMA.fields]
        wire = feed.select(
            *user_cols,
            F.when(F.col("_change_type") == "delete", "D").otherwise("U").alias("op"),
            F.col("_lsn_applied").alias("lsn"),
            F.col("_ts_applied"),
        )
        q = (
            wire.writeStream.format("transcript_lake")
            .option("path", tgt.root)
            .option("tsColumn", "_ts_applied")
            .option("batchIdOffset", str(offset))
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    replicate(0, "ckpt1")
    assert _pdf(tgt.refresh().read()).shape[0] > 0

    # ...then the source moves on and retention expires the middle commits
    for i, h in enumerate(halves[1:], start=1):
        apply_changes(src, spark.createDataFrame(h, CHANGE_SCHEMA), batch_id=i)
    src.compact(only_dirty=False)
    src.expire_snapshots(retain_last=2)

    # resuming the feed from the old checkpoint position must RAISE
    with pytest.raises(ChangeFeedGapError):
        _change_file_partitions(src.root, ckpt_version, src.current_version())

    # recovery: re-bootstrap from the floor snapshot, resume feed from it
    floor = feed_floor(src.root)
    assert floor > ckpt_version
    offset = tgt.refresh().last_batch_id + 1
    got_floor = resume_from_gap(src, tgt.root, batch_id=offset)
    assert got_floor == floor
    replicate(floor, "ckpt2", offset=offset + 1)

    # final state equals the full replay oracle: no dupes, no holes,
    # expired-commit deletes included
    final = _pdf(tgt.refresh().read())
    assert_tables_equal(
        table_to_pandas(tgt.read()), replay(seed, [changes])
    )
    assert_tables_equal(table_to_pandas(src.read()), replay(seed, [changes]))
    # exactly-once: running recovery AGAIN is a ledger no-op
    head = tgt.current_version()
    resume_from_gap(src, tgt.root, batch_id=offset)
    assert tgt.refresh().current_version() == head
    pd.testing.assert_frame_equal(final, _pdf(tgt.read()))


def test_feed_floor_full_history(spark, tmp_path):
    """With nothing expired the floor is the chain's creation commit."""
    spec = TableSpec(num_buckets=2, merge_mode="mor")
    t = SnapshotParquetTable(spark, str(tmp_path / "t"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(
        t, spark.createDataFrame(gen_seed_pandas(n_convs=5, seed=3), TRANSCRIPT_SCHEMA)
    )
    assert feed_floor(t.root) == 0


def test_cli_feed_floor_and_resume_gap(spark, tmp_path):
    """The operator-facing CLI surface: feed-floor reports the recovery
    anchor; resume-gap re-bootstraps a target through the facade writer
    and prints the restart recipe."""
    import json as _json
    import subprocess
    import sys as _sys

    spec = TableSpec(num_buckets=2, merge_mode="mor")
    src = SnapshotParquetTable(spark, str(tmp_path / "clisrc"), spec)
    src.create(TRANSCRIPT_SCHEMA)
    seed = gen_seed_pandas(n_convs=8, seed=5)
    bootstrap_seed(src, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    ch = gen_changes_pandas(120, n_convs=8, seed=5)
    for i, h in enumerate(np.array_split(ch, 3)):
        apply_changes(src, spark.createDataFrame(h, CHANGE_SCHEMA), batch_id=i)
    src.compact(only_dirty=False)
    src.expire_snapshots(retain_last=1)

    tgt = SnapshotParquetTable(spark, str(tmp_path / "clitgt"), spec)
    tgt.create(TRANSCRIPT_SCHEMA)

    def cli(*args):
        r = subprocess.run(
            [_sys.executable, "-m", "ccdb_data_pipeline_spark.cli", *args,
             "--master", "local[2]"],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return [_json.loads(l) for l in r.stdout.strip().splitlines() if l.startswith("{")]

    floor = cli("feed-floor", "--table", src.root)[0]
    assert floor["feed_floor"] == feed_floor(src.root)
    out = cli("resume-gap", "--table", src.root, "--out", tgt.root)[0]
    assert out["resumed_from_floor"] == floor["feed_floor"]
    assert out["restart_with"]["startingVersion"] == floor["feed_floor"]
    assert_tables_equal(table_to_pandas(tgt.refresh().read()), replay(seed, [ch]))
