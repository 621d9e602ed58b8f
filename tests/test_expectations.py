"""Write-time data-quality expectations (TableSpec.expectations — the Delta
CHECK-constraint / DLT expectation analog): warn counts, drop excludes +
dead-letters, fail aborts the batch BEFORE the commit so a repaired replay
of the same batch_id applies cleanly. Violation counting and drop filtering
ride the apply job's existing observe/stats node (no extra pass)."""

import datetime as dt
import os

import pytest

from ccdb_data_pipeline_spark.plans.apply import apply_changes
from ccdb_data_pipeline_spark.plans.lake import (
    ExpectationFailedError,
    SnapshotParquetTable,
)
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec

T0 = dt.datetime(2025, 1, 1)


def _table(spark, tmp_path, name, mode, expectations):
    spec = TableSpec(num_buckets=4, merge_mode=mode, expectations=expectations)
    t = SnapshotParquetTable(spark, os.path.join(str(tmp_path), name), spec)
    t.create(TRANSCRIPT_SCHEMA)
    return t


def _batch(spark, rows):
    """rows: (lsn, op, conv, turn, role, text)"""
    data = [
        (lsn, op, conv, turn, role, text, None, T0 + dt.timedelta(minutes=lsn))
        for (lsn, op, conv, turn, role, text) in rows
    ]
    return spark.createDataFrame(data, CHANGE_SCHEMA)


ROWS = [
    (1, "I", "c1", 0, "user", "hello"),
    (2, "I", "c1", 1, "robot", "beep"),       # bad role
    (3, "I", "c2", 0, "assistant", ""),        # empty text
    (4, "I", "c2", 1, "tool", None),           # NULL text -> violation (DLT)
    (5, "D", "c9", 0, None, None),             # delete: never validated
]

ROLE_OK = ("role_known", "role IN ('user', 'assistant', 'tool')", None)
TEXT_OK = ("text_nonempty", "length(text) > 0", None)


def _exp(action):
    return (
        (ROLE_OK[0], ROLE_OK[1], action),
        (TEXT_OK[0], TEXT_OK[1], action),
    )


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_warn_keeps_rows_and_counts(spark, tmp_path, mode):
    t = _table(spark, tmp_path, f"w-{mode}", mode, _exp("warn"))
    stats = apply_changes(t, _batch(spark, ROWS), 0)
    assert stats.expectations == {"role_known": 1, "text_nonempty": 2}
    assert t.manifest()["summary"]["expectations"] == stats.expectations
    # nothing dropped: all four non-delete rows are live
    assert t.read().count() == 4


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_drop_excludes_counts_and_quarantines(spark, tmp_path, mode):
    t = _table(spark, tmp_path, f"d-{mode}", mode, _exp("drop"))
    qdir = os.path.join(str(tmp_path), f"q-{mode}")
    stats = apply_changes(t, _batch(spark, ROWS), 0, quarantine_dir=qdir)
    assert stats.expectations == {"role_known": 1, "text_nonempty": 2}
    out = t.read()
    assert out.count() == 1  # only the clean row survives
    assert out.first()["text"] == "hello"
    q = spark.read.parquet(os.path.join(qdir, "b-0000000000"))
    got = {(r["lsn"], r["_reason"]) for r in q.collect()}
    assert got == {
        (2, "exp:role_known"),
        (3, "exp:text_nonempty"),
        (4, "exp:text_nonempty"),
    }


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_fail_aborts_before_commit_and_repaired_replay_applies(spark, tmp_path, mode):
    t = _table(spark, tmp_path, f"f-{mode}", mode, _exp("fail"))
    v0 = t.manifest()["version"]
    with pytest.raises(ExpectationFailedError) as ei:
        apply_changes(t, _batch(spark, ROWS), 0)
    assert ei.value.counts == {"role_known": 1, "text_nonempty": 2}
    t._manifest = None  # drop handle cache; the table must be untouched
    assert t.manifest()["version"] == v0
    assert t.last_batch_id == -1
    # repair upstream, replay the SAME batch id: nothing was committed, so
    # the ledger accepts it
    repaired = [
        (1, "I", "c1", 0, "user", "hello"),
        (2, "I", "c1", 1, "user", "beep"),
        (3, "I", "c2", 0, "assistant", "ok"),
        (4, "I", "c2", 1, "tool", "ran"),
    ]
    stats = apply_changes(t, _batch(spark, repaired), 0)
    assert not stats.skipped and stats.expectations == {
        "role_known": 0,
        "text_nonempty": 0,
    }
    assert t.read().count() == 4


def test_unknown_action_is_loud(spark, tmp_path):
    t = _table(
        spark, tmp_path, "bad-action", "mor",
        (("x", "length(text) > 0", "quarantine-maybe"),),
    )
    with pytest.raises(ValueError, match="unknown action"):
        apply_changes(t, _batch(spark, ROWS), 0)
