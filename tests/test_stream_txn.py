"""Atomic multi-table streaming ingest: one binlog stream fans into a
primary transcript table AND a derived per-conversation activity table,
committed all-or-nothing per micro-batch via the intent-log 2PC. A
mid-stream failure + restart replays cleanly (all-skipped abort path) and
the two tables can never be observed at different batch frontiers."""

import numpy as np
import pandas as pd
import pytest

from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.plans.txn import TransactionLog
from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import (
    gen_changes_pandas,
    gen_seed_pandas,
    write_segments,
)
from ccdb_data_pipeline_spark.streaming.stream import run_ingest_txn, start_ingest_txn
from pyspark.sql import functions as F
from pyspark.sql import types as T
from tests.oracle import assert_tables_equal, replay, table_to_pandas

ACTIVITY_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("last_role", T.StringType(), True),
        T.StructField("last_turn", T.IntegerType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def latest_activity(batch):
    """Derived change frame: per conversation, the batch's dominant event
    (max (coalesce(ts, epoch), lsn)) as a full-image 'U' — cross-batch LWW
    then converges to the GLOBAL dominant event per conversation."""
    ord_ = F.struct(
        F.coalesce(F.col("ts"), F.to_timestamp(F.lit("1970-01-01"))), F.col("lsn")
    )
    return (
        batch.filter(F.col("conv_id").isNotNull())
        .groupBy("conv_id")
        .agg(F.max_by(F.struct("role", "turn_idx", "ts", "lsn"), ord_).alias("w"))
        .select(
            F.col("w.lsn").alias("lsn"),
            F.lit("U").alias("op"),
            "conv_id",
            F.col("w.role").alias("last_role"),
            F.col("w.turn_idx").alias("last_turn"),
            F.col("w.ts").alias("ts"),
        )
    )


def _expected_activity(changes: pd.DataFrame) -> pd.DataFrame:
    df = changes[changes["conv_id"].notna()].copy()
    key = df["ts"].fillna(pd.Timestamp(0))
    df = (
        df.assign(_k=key)
        .sort_values(["_k", "lsn"])
        .drop_duplicates("conv_id", keep="last")  # groupby.last() skips NaN
    )
    return (
        df[["conv_id", "role", "turn_idx", "ts"]]
        .rename(columns={"role": "last_role", "turn_idx": "last_turn"})
        .sort_values("conv_id")
        .reset_index(drop=True)
    )


@pytest.fixture()
def env(spark, tmp_path):
    seed = gen_seed_pandas(n_convs=40, seed=21)
    changes = gen_changes_pandas(1500, n_convs=40, seed=21)
    write_segments(changes, str(tmp_path / "binlog"), n_segments=6, replay_segment=None)
    primary = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=4, merge_mode="mor")
    )
    primary.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(primary, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    activity = SnapshotParquetTable(
        spark,
        str(tmp_path / "act"),
        TableSpec(num_buckets=4, merge_mode="mor", key_cols=("conv_id",),
                  normalize_ws_cols=(), empty_to_null_exempt=()),
    )
    activity.create(ACTIVITY_SCHEMA)
    return seed, changes, primary, activity, tmp_path


def test_txn_stream_two_tables_consistent(spark, env):
    seed, changes, primary, activity, tmp_path = env
    sinks = [(primary, None), (activity, latest_activity)]
    run_ingest_txn(
        spark, str(tmp_path / "binlog"), sinks, str(tmp_path / "txnlog"),
        str(tmp_path / "ckpt"), max_files_per_trigger=2,
    )
    # primary equals the replay oracle
    assert_tables_equal(table_to_pandas(primary.read()), replay(seed, [changes]))
    # derived equals the global dominant event per conversation
    got = (
        activity.read().toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)[["conv_id", "last_role", "last_turn", "ts"]]
    )
    exp = _expected_activity(changes)
    pd.testing.assert_frame_equal(
        got.astype({"last_turn": "int64"}), exp.astype({"last_turn": "int64"})
    )
    # both ledgers advanced in lockstep and the version-set catalog agrees
    assert primary.last_batch_id == activity.last_batch_id == 2
    cv = TransactionLog(str(tmp_path / "txnlog")).consistent_versions()
    assert set(cv) == {primary.root, activity.root}


def test_txn_stream_failure_and_restart_replays_cleanly(spark, env):
    seed, changes, primary, activity, tmp_path = env
    sinks = [(primary, None), (activity, latest_activity)]

    boom = {"after": 1}

    def on_batch(batch_id, stats):
        if batch_id >= boom["after"]:
            raise RuntimeError("injected failure after commit")

    q = start_ingest_txn(
        spark, str(tmp_path / "binlog"), sinks, str(tmp_path / "txnlog"),
        str(tmp_path / "ckpt"), max_files_per_trigger=2, on_batch=on_batch,
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    # batch 1 committed to BOTH tables before the injected failure
    assert primary.last_batch_id == activity.last_batch_id == 1

    # restart: batch 1 replays as all-skipped (abort path), rest applies
    run_ingest_txn(
        spark, str(tmp_path / "binlog"), sinks, str(tmp_path / "txnlog"),
        str(tmp_path / "ckpt"), max_files_per_trigger=2,
    )
    assert primary.last_batch_id == activity.last_batch_id == 2
    assert_tables_equal(table_to_pandas(primary.read()), replay(seed, [changes]))
    got = (
        activity.read().toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)[["conv_id", "last_role", "last_turn", "ts"]]
    )
    pd.testing.assert_frame_equal(
        got.astype({"last_turn": "int64"}),
        _expected_activity(changes).astype({"last_turn": "int64"}),
    )
