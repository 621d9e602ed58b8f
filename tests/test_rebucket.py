"""Partition evolution: rebucket() rewrites the table under a new bucket
count; merges, point lookups, and time travel keep working on both sides."""

import numpy as np
import pytest

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas
from tests.oracle import assert_tables_equal, replay, table_to_pandas

N_CONVS = 40
N_EVENTS = 1500


@pytest.fixture(scope="module")
def seed_pdf():
    return gen_seed_pandas(n_convs=N_CONVS, seed=11)


@pytest.fixture(scope="module")
def changes_pdf():
    return gen_changes_pandas(N_EVENTS, n_convs=N_CONVS, seed=11)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_rebucket_preserves_state_and_future_merges(
    spark, tmp_path, seed_pdf, changes_pdf, mode
):
    spec = TableSpec(num_buckets=4, merge_mode=mode)
    t = SnapshotParquetTable(spark, str(tmp_path / f"t-{mode}"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    parts = np.array_split(changes_pdf, 2)
    apply_changes(t, spark.createDataFrame(parts[0], CHANGE_SCHEMA), batch_id=0)
    v_before = t.current_version()

    t.rebucket(16)
    assert t.num_buckets == 16
    assert int(max(int(b) for b in t.manifest()["buckets"])) < 16
    # state preserved across the rewrite
    assert_tables_equal(table_to_pandas(t.read()), replay(seed_pdf, [parts[0]]))
    # time travel to the pre-rebucket snapshot still reads the old layout
    assert_tables_equal(
        table_to_pandas(t.read(version=v_before)), replay(seed_pdf, [parts[0]])
    )

    # merges after evolution land in the NEW layout and stay correct
    apply_changes(t, spark.createDataFrame(parts[1], CHANGE_SCHEMA), batch_id=1)
    expected = replay(seed_pdf, [changes_pdf])
    assert_tables_equal(table_to_pandas(t.read()), expected)

    # a second, independent handle (fresh manifest read) agrees on the count
    t2 = SnapshotParquetTable(spark, t.root, TableSpec(num_buckets=4, merge_mode=mode))
    assert t2.num_buckets == 16
    assert_tables_equal(table_to_pandas(t2.read()), expected)


def test_rebucket_point_lookup_both_sides(spark, tmp_path, seed_pdf, changes_pdf):
    spec = TableSpec(num_buckets=4, merge_mode="mor")
    t = SnapshotParquetTable(spark, str(tmp_path / "t"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    apply_changes(t, spark.createDataFrame(changes_pdf, CHANGE_SCHEMA), batch_id=0)
    v_old = t.current_version()
    t.rebucket(32)

    expected = replay(seed_pdf, [changes_pdf])
    key = expected["conv_id"].iloc[0]
    want = expected[expected["conv_id"] == key]
    got_new = table_to_pandas(t.read_keys([key]))
    got_old = table_to_pandas(t.read_keys([key], version=v_old))
    assert_tables_equal(got_new, want)
    assert_tables_equal(got_old, want)


def test_rebucket_keeps_tombstones(spark, tmp_path, seed_pdf, changes_pdf):
    """A deleted key must stay deleted through the rewrite even if a stale
    lower-dominance update replays afterwards."""
    spec = TableSpec(num_buckets=4, merge_mode="mor")
    t = SnapshotParquetTable(spark, str(tmp_path / "t"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    apply_changes(t, spark.createDataFrame(changes_pdf, CHANGE_SCHEMA), batch_id=0)
    deletes = changes_pdf[changes_pdf["op"] == "D"]
    if len(deletes) == 0:
        pytest.skip("no deletes in generated stream")
    t.rebucket(8)
    # replay the stream as a later batch: stale events must not resurrect
    apply_changes(t, spark.createDataFrame(changes_pdf, CHANGE_SCHEMA), batch_id=1)
    assert_tables_equal(table_to_pandas(t.read()), replay(seed_pdf, [changes_pdf]))
