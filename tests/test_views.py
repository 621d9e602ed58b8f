"""Hudi-style view triad over one MoR table: real-time (default read,
delta layers resolved), read-optimized (base files only — stale by at most
the compaction lag, pure scan plan), and incremental-by-timestamp
(changes_since wall-clock polling)."""

import datetime as dt
import os
import time

import pytest

from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec

T0 = dt.datetime(2025, 1, 1)


def _table(spark, tmp_path, **kw):
    spec = TableSpec(num_buckets=4, merge_mode="mor", **kw)
    t = SnapshotParquetTable(spark, os.path.join(str(tmp_path), "t"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    return t


def _batch(spark, rows):
    data = [
        (lsn, op, conv, turn, "user", text, None, T0 + dt.timedelta(minutes=m))
        for (lsn, op, conv, turn, text, m) in rows
    ]
    return spark.createDataFrame(data, CHANGE_SCHEMA)


def _state(df):
    return {(r["conv_id"], r["turn_idx"]): r["text"] for r in df.collect()}


def test_read_optimized_serves_base_only(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_events(_batch(spark, [(1, "I", "c1", 0, "v1", 1),
                                  (2, "I", "c2", 0, "x", 1)]), 0)
    t.compact()
    base_state = _state(t.read())
    # post-compaction delta: RT view sees it, RO view does not
    t.merge_events(_batch(spark, [(3, "U", "c1", 0, "v2", 2),
                                  (4, "I", "c3", 0, "new", 2)]), 1)
    assert _state(t.read()) == {("c1", 0): "v2", ("c2", 0): "x", ("c3", 0): "new"}
    assert _state(t.read(read_optimized=True)) == base_state
    # compaction catches the RO view up
    t.compact()
    assert _state(t.read(read_optimized=True)) == _state(t.read())


def test_read_optimized_before_any_compaction_is_empty_or_seed(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_events(_batch(spark, [(1, "I", "c1", 0, "a", 1)]), 0)
    # all files are delta layers: RO view is empty (nothing compacted yet)
    assert t.read(read_optimized=True).count() == 0


def test_changes_since_timestamp(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_events(_batch(spark, [(1, "I", "c1", 0, "a", 1)]), 0)
    mark = time.time()
    time.sleep(0.05)
    t.merge_events(_batch(spark, [(2, "I", "c2", 0, "b", 2),
                                  (3, "U", "c1", 0, "a2", 2)]), 1)
    ch = t.changes_since(mark).collect()
    types = sorted(r["_change_type"] for r in ch)
    assert types == ["insert", "update_postimage", "update_preimage"]
    by = {r["_change_type"]: r for r in ch}
    assert by["insert"]["conv_id"] == "c2"
    assert by["update_postimage"]["text"] == "a2"
    # a timestamp after everything: empty feed
    assert t.changes_since(time.time()).count() == 0
    # a timestamp before table creation: no base snapshot to diff from
    with pytest.raises(ValueError, match="no snapshot"):
        t.changes_since(0.0)
