"""Maintenance concurrent with ingest: lost-CAS commits rebase, not fail.

At 10^10 events compaction is a long job that WILL overlap micro-batch
commits. These tests interleave a real second writer at the exact commit
point (one-shot hook on _commit) and assert Iceberg-style validate-and-
rebase semantics: appends stack onto compaction output, compaction output
absorbs concurrent appends, and tombstone reclaim never resurrects keys.
"""

import pandas as pd
import pytest

from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec


def _batch(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    return spark.createDataFrame(pdf, CHANGE_SCHEMA)


TS1, TS2, TS3 = (
    pd.Timestamp("2025-01-01"),
    pd.Timestamp("2025-01-02"),
    pd.Timestamp("2025-01-03"),
)


def _mk_table(spark, tmp_path):
    t = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=2, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    t.merge(
        _batch(
            spark,
            [
                (1, "I", "a", 0, "user", "a0", None, TS1),
                (2, "I", "b", 0, "user", "b0", None, TS1),
                (3, "I", "x", 0, "user", "x0", None, TS1),
            ],
        ),
        batch_id=0,
    )
    return t


def _one_shot_commit_hook(monkeypatch, spark, root, trigger_op, action):
    """Run ``action`` once, right before the first _commit whose summary op
    is ``trigger_op`` — simulating a concurrent writer winning the CAS."""
    orig = SnapshotParquetTable._commit
    state = {"fired": False}

    def hooked(self, m, expected_ref=None):
        if not state["fired"] and m.get("summary", {}).get("op") == trigger_op:
            state["fired"] = True
            action(SnapshotParquetTable(spark, root))
        return orig(self, m, expected_ref)

    monkeypatch.setattr(SnapshotParquetTable, "_commit", hooked)
    return state


def test_merge_rebases_over_concurrent_compaction(spark, tmp_path, monkeypatch):
    t = _mk_table(spark, tmp_path)

    state = _one_shot_commit_hook(
        monkeypatch, spark, t.root, "merge",
        lambda h2: h2.compact(drop_tombstones=False),
    )
    stats = t.merge(
        _batch(spark, [(4, "U", "a", 0, "user", "a1", None, TS2)]), batch_id=1
    )
    assert state["fired"] and not stats.skipped
    t._manifest = None
    assert t.manifest()["summary"].get("rebased") is True
    got = {r["conv_id"]: r["text"] for r in t.read().collect()}
    assert got == {"a": "a1", "b": "b0", "x": "x0"}
    assert t.last_batch_id == 1 and t.last_lsn == 4


def test_compaction_rebases_over_concurrent_merge(spark, tmp_path, monkeypatch):
    t = _mk_table(spark, tmp_path)
    t.merge(_batch(spark, [(4, "U", "b", 0, "user", "b1", None, TS2)]), batch_id=1)

    state = _one_shot_commit_hook(
        monkeypatch, spark, t.root, "compact",
        lambda h2: h2.merge(
            _batch(spark, [(5, "U", "a", 0, "user", "a1", None, TS2)]), batch_id=2
        ),
    )
    t.compact(drop_tombstones=False)
    assert state["fired"]
    t._manifest = None
    m = t.manifest()
    assert m["summary"]["op"] == "compact" and m["summary"].get("rebased") is True
    # the concurrent batch's delta survives, stacked on the compacted base
    got = {r["conv_id"]: r["text"] for r in t.read().collect()}
    assert got == {"a": "a1", "b": "b1", "x": "x0"}
    # ledger high-water marks come from the winner, not the stale base
    assert m["last_batch_id"] == 2 and m["last_lsn"] == 5


def test_tombstone_reclaim_redoes_instead_of_unsafe_rebase(
    spark, tmp_path, monkeypatch
):
    t = _mk_table(spark, tmp_path)
    # delete key 'x' at TS3 — the tombstone must outlive compaction if a
    # late lower-dominance update can still arrive
    t.merge(_batch(spark, [(4, "D", "x", 0, None, None, None, TS3)]), batch_id=1)

    # concurrent batch: a LATE update for 'x' with ts < the tombstone's —
    # if compaction had reclaimed the tombstone and rebased, 'x' would rise
    # from the dead
    state = _one_shot_commit_hook(
        monkeypatch, spark, t.root, "compact",
        lambda h2: h2.merge(
            _batch(spark, [(5, "U", "x", 0, "user", "late", None, TS2)]), batch_id=2
        ),
    )
    t.compact(drop_tombstones=True)
    assert state["fired"]
    t._manifest = None
    got = {r["conv_id"] for r in t.read().collect()}
    assert "x" not in got, "reclaimed tombstone resurrected a deleted key"
    assert got == {"a", "b"}
    assert t.last_batch_id == 2


def test_rebucket_during_batch_still_fails_loudly(spark, tmp_path, monkeypatch):
    from ccdb_data_pipeline_spark.plans.lake import CommitConflictError

    t = _mk_table(spark, tmp_path)
    _one_shot_commit_hook(
        monkeypatch, spark, t.root, "merge", lambda h2: h2.rebucket(4)
    )
    with pytest.raises(CommitConflictError, match="rebucketed"):
        t.merge(
            _batch(spark, [(4, "U", "a", 0, "user", "a1", None, TS2)]), batch_id=1
        )
