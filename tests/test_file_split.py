"""Target-file-size splitting (Iceberg write.target-file-size analog):
long-lived files split at max_file_rows; manifests track N files per
bucket; reads, point lookups, and footer lineage are unaffected."""

import datetime as dt
import os

from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec

T0 = dt.datetime(2025, 1, 1)


def _events(spark, n):
    rows = [
        (i + 1, "I", f"c{i % 7}", i, "user", f"t{i}", None,
         T0 + dt.timedelta(seconds=i))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def test_compaction_splits_files_at_row_target(spark, tmp_path):
    spec = TableSpec(num_buckets=2, merge_mode="mor", max_file_rows=50)
    t = SnapshotParquetTable(spark, os.path.join(str(tmp_path), "t"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    t.merge_events(_events(spark, 400), 0)
    t.compact()
    m = t.manifest()
    per_bucket = {b: len(fs) for b, fs in m["buckets"].items()}
    # 400 rows over 2 buckets at <=50 rows/file -> several files per bucket
    assert all(n >= 2 for n in per_bucket.values()), per_bucket
    assert all(
        e.get("n_rows", 51) <= 50 for fs in m["buckets"].values() for e in fs
    )
    # reads and point lookups see the same state as an unsplit table
    assert t.read().count() == 400
    got = {r["turn_idx"] for r in t.read_keys(["c3"]).collect()}
    assert got == {i for i in range(400) if i % 7 == 3}


def test_split_preserves_lww_resolution(spark, tmp_path):
    spec = TableSpec(num_buckets=2, merge_mode="mor", max_file_rows=20)
    t = SnapshotParquetTable(spark, os.path.join(str(tmp_path), "t"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    t.merge_events(_events(spark, 100), 0)
    t.compact()
    # updates after the split-file compaction still win per key
    upd = spark.createDataFrame(
        [(1001, "U", "c0", 0, "user", "NEW", None, T0 + dt.timedelta(days=1))],
        CHANGE_SCHEMA,
    )
    t.merge_events(upd, 1)
    row = t.read().filter((F.col("conv_id") == "c0") & (F.col("turn_idx") == 0))
    assert row.collect()[0]["text"] == "NEW"
