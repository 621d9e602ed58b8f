"""Row-level TTL sweep through the exactly-once DML path."""

import datetime as dt

import pandas as pd

from ccdb_data_pipeline_spark.plans.dml import apply_retention
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec


def test_retention_tombstones_only_expired_rows(spark, tmp_path):
    rows = pd.DataFrame(
        {
            "lsn": [1, 2, 3, 4],
            "op": ["I"] * 4,
            "conv_id": ["old", "fresh", "edge", "unknown"],
            "turn_idx": [0] * 4,
            "role": ["user"] * 4,
            "text": ["a", "b", "c", "d"],
            "tool": [None] * 4,
            "ts": [
                pd.Timestamp("2025-01-01"),
                pd.Timestamp("2025-06-01"),
                pd.Timestamp("2025-03-01"),  # exactly at the cutoff -> kept
                pd.NaT,  # unknown age -> kept
            ],
        }
    )
    t = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=2, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    t.merge(spark.createDataFrame(rows, CHANGE_SCHEMA), batch_id=0)

    now = dt.datetime(2025, 7, 1)
    stats = apply_retention(t, max_age=dt.timedelta(days=122), now=now)  # cutoff 2025-03-01
    assert stats.n_delete == 1
    kept = sorted(r["conv_id"] for r in t.read().collect())
    assert kept == ["edge", "fresh", "unknown"]

    # replaying the same sweep is a no-op (same batch_id -> ledger gate)
    again = apply_retention(t, max_age=dt.timedelta(days=122), now=now)
    assert t.read().count() == 3 and again.n_delete == 0
