"""Incremental view maintenance (plans/ivm.py): the maintained aggregate
must equal a full GROUP BY recompute after every refresh, across inserts,
updates, deletes, and multi-batch histories."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.ivm import IncrementalAggView
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas

N_CONVS = 40
N_EVENTS = 1800


@pytest.fixture(scope="module")
def seed_pdf():
    return gen_seed_pandas(n_convs=N_CONVS, seed=5)


@pytest.fixture(scope="module")
def changes_pdf():
    return gen_changes_pandas(N_EVENTS, n_convs=N_CONVS, seed=5)


def _recompute(table):
    return (
        table.read()
        .groupBy("conv_id", "role")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
        )
    )


def _as_sorted_pdf(df):
    pdf = df.toPandas()
    return (
        pdf.sort_values(list(pdf.columns)).reset_index(drop=True).astype(str)
    )


def _assert_view_matches(view, table):
    got = _as_sorted_pdf(view.read())
    want = _as_sorted_pdf(_recompute(table))
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_view_tracks_table_across_batches(spark, tmp_path, seed_pdf, changes_pdf, mode):
    t = SnapshotParquetTable(
        spark, str(tmp_path / f"t-{mode}"), TableSpec(num_buckets=8, merge_mode=mode)
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    view = IncrementalAggView(
        spark,
        str(tmp_path / f"v-{mode}"),
        group_cols=["conv_id", "role"],
        sum_exprs={"n_chars": "length(text)"},
    )
    # first refresh = full build of the seed state
    stats = view.refresh(t)
    assert stats["n_changes"] == -1
    _assert_view_matches(view, t)

    for i, part in enumerate(np.array_split(changes_pdf, 3)):
        apply_changes(t, spark.createDataFrame(part, CHANGE_SCHEMA), batch_id=i)
        stats = view.refresh(t)
        assert stats["applied_to"] == t.current_version()
        _assert_view_matches(view, t)

    # idempotent when nothing changed
    before = _as_sorted_pdf(view.read())
    assert view.refresh(t)["n_changes"] == 0
    pd.testing.assert_frame_equal(_as_sorted_pdf(view.read()), before)


def test_fully_deleted_group_drops_out(spark, tmp_path, seed_pdf):
    t = SnapshotParquetTable(spark, str(tmp_path / "t"), TableSpec(num_buckets=4))
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    view = IncrementalAggView(spark, str(tmp_path / "v"), group_cols=["conv_id"])
    view.refresh(t)
    victim = seed_pdf["conv_id"].iloc[0]
    doomed = seed_pdf[seed_pdf["conv_id"] == victim]
    deletes = pd.DataFrame(
        {
            "lsn": np.arange(1, len(doomed) + 1, dtype=np.int64),
            "op": "D",
            "conv_id": doomed["conv_id"].values,
            "turn_idx": doomed["turn_idx"].values,
            "role": None,
            "text": None,
            "tool": None,
            "ts": pd.Timestamp("2030-01-01"),
        }
    )
    apply_changes(t, spark.createDataFrame(deletes, CHANGE_SCHEMA), batch_id=0)
    view.refresh(t)
    assert view.read().filter(F.col("conv_id") == victim).count() == 0
    _assert_view_matches_conv(view, t)


def _assert_view_matches_conv(view, table):
    got = _as_sorted_pdf(view.read())
    want = _as_sorted_pdf(
        table.read().groupBy("conv_id").agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    pd.testing.assert_frame_equal(got, want)
