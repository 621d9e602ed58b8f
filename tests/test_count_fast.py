"""Metadata-only COUNT: count_fast() must equal read().count() in every
table state, and must answer from the manifest alone (no Spark job) once
the table is compacted and tombstone-free."""

import pandas as pd

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas


def _no_scan(t):
    """Fail the test if count_fast falls back to reading files."""
    def boom(*a, **kw):  # pragma: no cover - should never run
        raise AssertionError("count_fast touched data files on a clean table")
    t._read_files = boom


def test_count_fast_equals_scan_through_lifecycle(spark, tmp_path):
    t = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=4, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(
        t, spark.createDataFrame(gen_seed_pandas(n_convs=25, seed=5), TRANSCRIPT_SCHEMA)
    )
    assert t.count_fast() == t.read().count()

    # MoR deltas with deletes: fallback path must stay exact
    ch = gen_changes_pandas(600, n_convs=25, seed=5)
    apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA), batch_id=1)
    assert t.count_fast() == t.read().count()

    # compaction reclaims tombstones -> every bucket is manifest-countable
    t.compact(only_dirty=False, drop_tombstones=True)
    n = t.read().count()
    assert t.count_fast() == n
    _no_scan(t)
    assert t.count_fast() == n  # answered without touching data

    # version pin still works (older version may need the scan path)
    assert isinstance(t.count_fast(version=t.current_version()), int)


def test_count_fast_detects_tombstones(spark, tmp_path):
    """A compaction that KEEPS tombstones must not count them."""
    t = SnapshotParquetTable(
        spark, str(tmp_path / "t2"), TableSpec(num_buckets=2, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    seed = gen_seed_pandas(n_convs=10, seed=9)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    # delete a few rows
    dels = pd.DataFrame(
        {
            "lsn": [1, 2, 3],
            "op": ["D"] * 3,
            "conv_id": seed.conv_id.iloc[:3].tolist(),
            "turn_idx": seed.turn_idx.iloc[:3].tolist(),
            "role": [None] * 3,
            "text": [None] * 3,
            "tool": [None] * 3,
            "ts": [pd.Timestamp("2025-06-01")] * 3,
        }
    )
    apply_changes(t, spark.createDataFrame(dels, CHANGE_SCHEMA), batch_id=1)
    t.compact(only_dirty=False, drop_tombstones=False)  # tombstones survive
    assert t.count_fast() == t.read().count()
