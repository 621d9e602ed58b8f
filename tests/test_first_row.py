"""First-row merge engine (TableSpec.first_row): per key the FIRST writer
by (ts, lsn) wins and later events are ignored — at-source insert dedup /
claim-once — while deletes dominate permanently (GDPR erasure: no
resurrection). Verified against a sequential replay across batches,
out-of-order event times, compaction, and the raw write path."""

import datetime as dt
import os

import pytest

from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec

T0 = dt.datetime(2025, 1, 1)


def _table(spark, tmp_path, name="t", **kw):
    spec = TableSpec(num_buckets=4, merge_mode="mor", first_row=True, **kw)
    t = SnapshotParquetTable(spark, os.path.join(str(tmp_path), name), spec)
    t.create(TRANSCRIPT_SCHEMA)
    return t


def _batch(spark, rows):
    """rows: (lsn, op, conv, turn, text, ts_minutes)"""
    data = [
        (lsn, op, conv, turn, "user", text, None, T0 + dt.timedelta(minutes=m))
        for (lsn, op, conv, turn, text, m) in rows
    ]
    return spark.createDataFrame(data, CHANGE_SCHEMA)


def _replay(batches):
    """Oracle: first (ts, lsn) non-delete writer wins; D erases forever."""
    state, erased = {}, set()
    for rows in batches:
        for lsn, op, conv, turn, text, m in rows:
            k = (conv, turn)
            if op == "D":
                state.pop(k, None)
                erased.add(k)
                continue
            if k in erased:
                continue
            cur = state.get(k)
            if cur is None or (m, lsn) < (cur[0], cur[1]):
                state[k] = (m, lsn, text)
    return {k: v[2] for k, v in state.items()}


def _read_state(t):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in t.read().collect()
    }


BATCHES = [
    [
        (1, "I", "c1", 0, "first", 10),
        (2, "U", "c1", 0, "second-ignored", 11),
        (3, "I", "c2", 0, "claimed", 10),
        (4, "I", "c3", 0, "doomed", 10),
        (5, "D", "c3", 0, None, 12),  # erased in the same batch
    ],
    [
        (6, "U", "c1", 0, "third-ignored", 13),
        # late arrival with an EARLIER event time: replaces the provisional
        # winner (event-time-correct claim-once)
        (7, "I", "c2", 0, "earlier-wins", 5),
        (8, "I", "c3", 0, "no-resurrection", 14),
        (9, "I", "c4", 0, "new", 14),
    ],
    [
        (10, "D", "c4", 0, None, 15),  # erase across batches
        (11, "I", "c4", 0, "still-dead", 16),
    ],
]


def test_first_row_matches_replay(spark, tmp_path):
    t = _table(spark, tmp_path)
    for i, rows in enumerate(BATCHES):
        t.merge_events(_batch(spark, rows), i)
        assert _read_state(t) == _replay(BATCHES[: i + 1])


def test_first_row_compaction_preserves_state(spark, tmp_path):
    t = _table(spark, tmp_path)
    for i, rows in enumerate(BATCHES[:2]):
        t.merge_events(_batch(spark, rows), i)
    t.compact(drop_tombstones=False)  # keep erasure markers (lateness horizon)
    assert _read_state(t) == _replay(BATCHES[:2])
    t.merge_events(_batch(spark, BATCHES[2]), 2)
    assert _read_state(t) == _replay(BATCHES)


def test_first_row_raw_write_path(spark, tmp_path):
    t = _table(spark, tmp_path, name="raw", dedupe_on_write=False)
    for i, rows in enumerate(BATCHES):
        t.merge_events(_batch(spark, rows), i)
    assert _read_state(t) == _replay(BATCHES)


def test_first_row_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="mor"):
        spec = TableSpec(first_row=True, merge_mode="cow")
        SnapshotParquetTable(spark, os.path.join(str(tmp_path), "v"), spec).create(
            TRANSCRIPT_SCHEMA
        )


def test_default_compact_keeps_erasure_tombstones(spark, tmp_path):
    """Standard maintenance compact() must not reopen erased keys on a
    first-row table: drop_tombstones=True is downgraded to keep; 'force'
    performs the reclaim once the upstream retry window has closed."""
    t = _table(spark, tmp_path, name="guard")
    t.merge_events(_batch(spark, [(1, "I", "c1", 0, "claim", 1),
                                  (2, "D", "c1", 0, None, 2)]), 0)
    t.compact()  # maintenance default: must KEEP the tombstone
    # an at-least-once duplicate retry of the claim must stay suppressed
    t.merge_events(_batch(spark, [(3, "I", "c1", 0, "retry", 3)]), 1)
    assert _read_state(t) == {}
    t2 = _table(spark, tmp_path, name="forced")
    t2.merge_events(_batch(spark, [(1, "I", "c1", 0, "claim", 1),
                                   (2, "D", "c1", 0, None, 2)]), 0)
    t2.compact(drop_tombstones="force")  # explicit: retry window closed
    t2.merge_events(_batch(spark, [(3, "I", "c1", 0, "reclaim", 3)]), 1)
    assert _read_state(t2) == {("c1", 0): "reclaim"}
