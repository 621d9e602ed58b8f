"""Transactionally-consistent multi-table replication (plans/replicate.py).

The replica applies the SOURCE transaction log's sealed cuts in seal order
through the public wire (transcript_changes -> transcript_lake), so replica
readers get exactly the consistent version sets source readers got. Pins:
state equality per engine (LWW / patch / agg-resolved / CoW-resolved),
cut-level time-travel consistency, exactly-once re-sync, crash-resume
mid-cut, resolved-mode ordering under backwards event time, and schema
evolution through the wire. Reference analog: the S3 archive rebuild is the
reference's (single-table, whole-state) replication step
(/root/reference/common/s3_utils.py:29-52)."""

import datetime as dt
import json
import os
import time

import pandas as pd
import pytest
from pyspark.sql import types as T

from ccdb_data_pipeline_spark.plans.datasource import register
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.plans.replicate import (
    ReplicaSet,
    replica_handle,
    sealed_records,
)
from ccdb_data_pipeline_spark.plans.txn import TransactionLog
from ccdb_data_pipeline_spark.schemas import TableSpec

SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("v", T.LongType()),
    T.StructField("note", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

T0 = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)


def _ts(m):
    return T0 + dt.timedelta(minutes=m)


def _events(spark, rows):
    # rows: (k, v, note, ts_minutes, lsn, op)
    sch = T.StructType(
        list(SCHEMA.fields)
        + [T.StructField("lsn", T.LongType()), T.StructField("op", T.StringType())]
    )
    data = [(k, v, n, _ts(m), lsn, op) for (k, v, n, m, lsn, op) in rows]
    return spark.createDataFrame(data, sch)


def _mk(spark, tmp_path, name, **kw):
    spec = TableSpec(
        key_cols=("k",), bucket_col="k", ts_col="ts", lsn_col="lsn",
        op_col="op", num_buckets=4, merge_mode=kw.pop("merge_mode", "mor"), **kw
    )
    t = SnapshotParquetTable(spark, str(tmp_path / name), spec)
    t.create(SCHEMA)
    return t


def _state(t, version=None):
    t.refresh()
    rows = t.read(version=version).collect() if version is not None else t.read().collect()
    return sorted((r["k"], r["v"], r["note"]) for r in rows)


def _rset(spark, tmp_path, srcs):
    return ReplicaSet(
        spark,
        str(tmp_path / "txnlog"),
        str(tmp_path / "replog"),
        {s.root: s.root + "-replica" for s in srcs},
    )


def test_cut_replication_two_tables_consistent_at_every_cut(spark, tmp_path):
    register(spark)
    a = _mk(spark, tmp_path, "a")
    b = _mk(spark, tmp_path, "b")
    # out-of-band pre-txn commits (folded into the first cut's window)
    a.merge_events(_events(spark, [("x", 1, "ax", 0, 1, "I"), ("y", 2, "ay", 0, 2, "I")]), batch_id=0)
    b.merge_events(_events(spark, [("x", 9, "bx", 0, 1, "I")]), batch_id=0)

    log = TransactionLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    ba, bb = txn.stage(a), txn.stage(b)
    ba.merge_events(_events(spark, [("x", 10, "ax2", 5, 3, "U"), ("z", 3, "az", 5, 4, "I")]), batch_id=1)
    bb.merge_events(_events(spark, [("x", None, None, 5, 2, "D")]), batch_id=1)
    txn.commit()
    cut1 = {t.root: t.refresh().current_version() for t in (a, b)}
    src_at_cut1 = {t.root: _state(t) for t in (a, b)}

    # out-of-band commit between cuts (single-table; folds into cut 2)
    a.merge_events(_events(spark, [("y", None, None, 6, 5, "D")]), batch_id=2)

    txn = log.begin()
    ba, bb = txn.stage(a), txn.stage(b)
    ba.merge_events(_events(spark, [("w", 7, "aw", 9, 6, "I")]), batch_id=3)
    bb.merge_events(_events(spark, [("q", 8, "bq", 9, 3, "I")]), batch_id=2)
    txn.commit()

    rs = _rset(spark, tmp_path, [a, b])
    applied = rs.sync()
    assert len(applied) == 2

    ra = replica_handle(spark, a.root + "-replica")
    rb = replica_handle(spark, b.root + "-replica")
    assert _state(ra) == _state(a)
    assert _state(rb) == _state(b)

    # cut-level consistency: replica time-traveled to the FIRST cut record's
    # pinned versions equals the source at the first txn's pinned versions
    cuts = [r for r in sealed_records(rs.dst_log_dir) if r["kind"] == "txn"]
    assert len(cuts) == 2
    pin1 = {t["root"]: t["target_version"] for t in cuts[0]["tables"]}
    assert _state(ra, version=pin1[ra.root]) == src_at_cut1[a.root]
    assert _state(rb, version=pin1[rb.root]) == src_at_cut1[b.root]
    # and the first cut pinned the source versions the txn itself pinned
    srcpin1 = {t["src_root"]: t["src_version"] for t in cuts[0]["replica"]["tables"]}
    assert srcpin1 == cut1

    # re-sync is a pure no-op: no new cut records, versions unchanged
    va, vb = ra.refresh().current_version(), rb.refresh().current_version()
    assert rs.sync() == []
    assert ra.refresh().current_version() == va
    assert rb.refresh().current_version() == vb


def test_crash_mid_cut_resumes_exactly_once(spark, tmp_path, monkeypatch):
    register(spark)
    a = _mk(spark, tmp_path, "a")
    b = _mk(spark, tmp_path, "b")
    a.merge_events(_events(spark, [("x", 1, "ax", 0, 1, "I")]), batch_id=0)
    b.merge_events(_events(spark, [("x", 9, "bx", 0, 1, "I")]), batch_id=0)
    log = TransactionLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    ba, bb = txn.stage(a), txn.stage(b)
    ba.merge_events(_events(spark, [("z", 3, "az", 5, 2, "I")]), batch_id=1)
    bb.merge_events(_events(spark, [("x", 10, "bx2", 5, 2, "U")]), batch_id=1)
    txn.commit()

    rs = _rset(spark, tmp_path, [a, b])
    real = ReplicaSet._apply_window
    calls = {"n": 0}

    def crashing(self, src_root, lo, hi):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash after first member table")
        return real(self, src_root, lo, hi)

    monkeypatch.setattr(ReplicaSet, "_apply_window", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        rs.sync()
    # crash landed between member applies: no cut sealed yet
    assert rs.applied_ids() == set()
    monkeypatch.setattr(ReplicaSet, "_apply_window", real)

    ra = replica_handle(spark, a.root + "-replica")
    v_after_crash = ra.refresh().current_version()
    assert rs.sync() != []
    # the member applied before the crash was NOT re-applied (batch-id gate)
    assert ra.refresh().current_version() == v_after_crash
    assert _state(ra) == _state(a)
    assert _state(replica_handle(spark, b.root + "-replica")) == _state(b)


def test_patch_engine_with_seq_groups_through_wire(spark, tmp_path):
    register(spark)
    src = _mk(spark, tmp_path, "p", partial_updates=True,
              sequence_groups={"v": ("note",)})
    src.merge_events(_events(spark, [
        ("a", 1, "a1", 0, 1, "I"), ("b", 2, "b1", 0, 2, "I"),
    ]), batch_id=0)
    log = TransactionLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    br = txn.stage(src)
    br.merge_events(_events(spark, [
        ("a", 5, "a-seq5", 1, 3, "P"),    # seq-group patch (v governs note)
        ("b", None, None, 2, 4, "D"),
        ("b", 9, "orphan", 3, 5, "P"),    # patch after delete: no-op
    ]), batch_id=1)
    txn.commit()
    src.compact()  # replica feed must be compaction-blind

    txn = log.begin()
    br = txn.stage(src)
    br.merge_events(_events(spark, [
        ("a", 3, "a-seq3-stale", 9, 6, "P"),  # LOWER seq: group must not move
        ("c", 7, "c1", 4, 7, "I"),
    ]), batch_id=2)
    txn.commit()

    rs = _rset(spark, tmp_path, [src])
    rs.sync()
    rep = replica_handle(spark, src.root + "-replica")
    assert _state(rep) == _state(src)
    assert _state(src) == [("a", 5, "a-seq5"), ("c", 7, "c1")]
    # replica manifest carries the same engine params for future consumers
    m = rep.manifest()
    assert m["engine"]["partial_updates"] is True
    assert m["engine"]["seq_groups"] == {"v": ["note"]}


def test_agg_resolved_survives_backwards_event_time(spark, tmp_path):
    """Delete-reset then a refold of OLDER-ts events makes the key's
    resolved _ts_applied go BACKWARDS across cuts. Event-time LWW on the
    replica would keep the tombstone and drop the newer state; the wire
    orders resolved diffs by _commit_version, so the replica converges."""
    register(spark)
    src = _mk(spark, tmp_path, "g", agg_spec={"v": "sum", "note": "last"})
    src.merge_events(_events(spark, [
        ("x", 10, "first", 10, 1, "I"), ("x", 5, None, 11, 2, "U"),
    ]), batch_id=0)
    log = TransactionLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    txn.stage(src).merge_events(
        _events(spark, [("x", None, None, 20, 3, "D")]), batch_id=1
    )
    txn.commit()
    txn = log.begin()
    txn.stage(src).merge_events(
        # post-reset refold at OLDER event times (ts 2 < pre-delete 11)
        _events(spark, [("x", 100, "reborn", 2, 4, "I")]), batch_id=2
    )
    txn.commit()

    rs = _rset(spark, tmp_path, [src])
    rs.sync()
    rep = replica_handle(spark, src.root + "-replica")
    assert _state(src) == [("x", 100, "reborn")]
    assert _state(rep) == _state(src)
    # replica of a resolved feed is a plain LWW table, not an aggregator
    assert rep.manifest()["engine"]["agg_spec"] is False


def test_cow_source_replicates_via_resolved_feed(spark, tmp_path):
    register(spark)
    src = _mk(spark, tmp_path, "c", merge_mode="cow")
    src.merge(_events(spark, [("a", 1, "a1", 0, 1, "I"), ("b", 2, "b1", 0, 2, "I")]), batch_id=0)
    log = TransactionLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    txn.stage(src).merge(
        _events(spark, [("a", 10, "a2", 5, 3, "U"), ("b", None, None, 5, 4, "D")]),
        batch_id=1,
    )
    txn.commit()

    rs = _rset(spark, tmp_path, [src])
    rs.sync()
    rep = replica_handle(spark, src.root + "-replica")
    assert _state(rep) == _state(src) == [("a", 10, "a2")]
    # CoW source, MoR replica (the resolved wire is append-shaped)
    assert rep.manifest()["mode"] == "mor"


def test_sync_to_head_covers_out_of_band_commits(spark, tmp_path):
    register(spark)
    src = _mk(spark, tmp_path, "h")
    src.merge_events(_events(spark, [("x", 1, "x1", 0, 1, "I")]), batch_id=0)
    rs = _rset(spark, tmp_path, [src])
    rs.sync()  # no sealed txns: nothing happens, replica may not exist yet
    rs.sync_to_head()
    rep = replica_handle(spark, src.root + "-replica")
    assert _state(rep) == _state(src)
    # idempotent + incremental
    v = rep.refresh().current_version()
    rs.sync_to_head()
    assert rep.refresh().current_version() == v
    src.merge_events(_events(spark, [("y", 2, "y1", 1, 2, "I")]), batch_id=1)
    rs.sync_to_head()
    assert _state(rep) == _state(src)


def test_schema_evolution_rides_the_wire(spark, tmp_path):
    register(spark)
    src = _mk(spark, tmp_path, "e")
    src.merge_events(_events(spark, [("a", 1, "a1", 0, 1, "I")]), batch_id=0)
    log = TransactionLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    br = txn.stage(src)
    evolved = T.StructType(
        list(SCHEMA.fields)
        + [T.StructField("tool", T.StringType()),
           T.StructField("lsn", T.LongType()), T.StructField("op", T.StringType())]
    )
    br.merge_events(
        spark.createDataFrame([("b", 2, "b1", _ts(1), "search", 2, "I")], evolved),
        batch_id=1,
    )
    txn.commit()

    rs = _rset(spark, tmp_path, [src])
    rs.sync()
    rep = replica_handle(spark, src.root + "-replica")
    rep.refresh()
    assert "tool" in [f.name for f in rep.read().schema.fields]
    got = sorted((r["k"], r["v"], r["note"], r["tool"]) for r in rep.read().collect())
    want = sorted((r["k"], r["v"], r["note"], r["tool"]) for r in src.read().collect())
    assert got == want


def test_consistent_versions_follows_seal_order_not_filename(tmp_path):
    """Regression: txn ids are random hex, so filename order is not seal
    order. A lexicographically-later file from an EARLIER transaction must
    not un-pin a newer seal's versions (the pinned set has to be the state
    after some prefix of transactions — torn mixes defeat the catalog)."""
    log_dir = tmp_path / "txnlog"
    log_dir.mkdir()
    # seal order: 'ff...' first (t=100, X@v1, Y@v1), '00...' second
    # (t=200, X@v2) — filename order would replay them backwards and pin
    # {X: v1, Y: v1}, a set that never coexisted with X@v2 sealed
    for txn_id, at, tables in [
        ("ffffffffffff", 100.0, [{"root": "/X", "target_version": 1},
                                 {"root": "/Y", "target_version": 1}]),
        ("000000000000", 200.0, [{"root": "/X", "target_version": 2}]),
    ]:
        rec = {"txn_id": txn_id, "sealed_at": at, "tables": tables}
        with open(log_dir / f"txn-{txn_id}.committed.json", "w") as f:
            json.dump(rec, f)
    log = TransactionLog(str(log_dir))
    assert log.consistent_versions() == {"/X": 2, "/Y": 1}


def test_fresh_replica_bootstraps_past_expired_history(spark, tmp_path):
    """Snapshot-then-tail: a NEW replica of a table whose early commits
    were expired converges via replay_events(floor) — including deletes
    whose commits expired — then tails the retained feed."""
    register(spark)
    src = _mk(spark, tmp_path, "x")
    src.merge_events(_events(spark, [
        ("a", 1, "a1", 0, 1, "I"), ("b", 2, "b1", 0, 2, "I"),
    ]), batch_id=0)
    src.merge_events(_events(spark, [("b", None, None, 1, 3, "D")]), batch_id=1)
    src.merge_events(_events(spark, [("c", 3, "c1", 2, 4, "I")]), batch_id=2)
    # keep tombstones: reclaiming them is per-table GC (a replica cannot
    # mirror it through the feed, and a reclaimed tombstone changes the
    # SOURCE's own late-replay behavior too)
    src.compact(drop_tombstones=False)
    src.expire_snapshots(retain_last=2)  # floor now past the delete commit
    src.merge_events(_events(spark, [("d", 4, "d1", 3, 5, "I")]), batch_id=3)

    rs = _rset(spark, tmp_path, [src])
    rs.sync_to_head()
    rep = replica_handle(spark, src.root + "-replica")
    assert _state(rep) == _state(src)
    # b stayed deleted even though its deleting commit expired: the floor
    # bootstrap replayed its tombstone with the original dominance pair
    assert ("b", 2, "b1") not in _state(rep)
    # late replay of the expired-range delete's event must still lose
    src.merge_events(_events(spark, [("b", 2, "b1", 0, 2, "I")]), batch_id=4)
    rs.sync_to_head()
    assert _state(rep) == _state(src)


def test_stale_lww_replica_heals_across_gap(spark, tmp_path):
    """A replica that synced once, then fell behind past what the source
    retains, converges through the same floor bootstrap (replay_events
    carries tombstones + original dominance, so a NON-empty replica is
    sound too)."""
    register(spark)
    src = _mk(spark, tmp_path, "y")
    src.merge_events(_events(spark, [
        ("a", 1, "a1", 0, 1, "I"), ("b", 2, "b1", 0, 2, "I"),
    ]), batch_id=0)
    rs = _rset(spark, tmp_path, [src])
    rs.sync_to_head()
    rep = replica_handle(spark, src.root + "-replica")
    assert _state(rep) == _state(src)

    src.merge_events(_events(spark, [("b", None, None, 1, 3, "D")]), batch_id=1)
    src.merge_events(_events(spark, [("a", 10, "a2", 2, 4, "U")]), batch_id=2)
    src.compact()
    src.expire_snapshots(retain_last=1)  # replica's cursor now pre-floor
    rs.sync_to_head()
    assert _state(rep) == _state(src) == [("a", 10, "a2")]


def test_stale_resolved_replica_refuses_gap_with_pointer(spark, tmp_path):
    """Resolved-mode snapshots carry no tombstones, so only a FRESH replica
    may bootstrap from the floor; a stale one must refuse (a silent
    bootstrap would resurrect keys deleted inside the expired range)."""
    register(spark)
    src = _mk(spark, tmp_path, "z", agg_spec={"v": "sum", "note": "last"})
    src.merge_events(_events(spark, [("a", 1, "a1", 0, 1, "I")]), batch_id=0)
    rs = _rset(spark, tmp_path, [src])
    rs.sync_to_head()

    src.merge_events(_events(spark, [("a", None, None, 1, 2, "D")]), batch_id=1)
    src.merge_events(_events(spark, [("b", 5, "b1", 2, 3, "I")]), batch_id=2)
    src.compact()
    src.expire_snapshots(retain_last=1)
    with pytest.raises(ValueError, match="drop and recreate"):
        rs.sync_to_head()
    # a fresh replica of the same source DOES bootstrap
    rs2 = ReplicaSet(
        spark, str(tmp_path / "txnlog"), str(tmp_path / "replog2"),
        {src.root: str(tmp_path / "z-fresh")},
    )
    rs2.sync_to_head()
    assert _state(replica_handle(spark, str(tmp_path / "z-fresh"))) == _state(src)


def test_lag_report_tracks_cursor_and_pending(spark, tmp_path):
    register(spark)
    src = _mk(spark, tmp_path, "lag")
    src.merge_events(_events(spark, [("a", 1, "a1", 0, 1, "I")]), batch_id=0)
    log = TransactionLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    txn.stage(src).merge_events(
        _events(spark, [("b", 2, "b1", 1, 2, "I")]), batch_id=1
    )
    txn.commit()
    rs = _rset(spark, tmp_path, [src])

    before = rs.lag_report()[0]
    assert before["cursor"] == 0
    assert before["commits_behind"] == src.refresh().current_version()
    assert before["pending_txns"] == 1
    assert before["last_seal_at"] is None

    rs.sync()
    after = rs.lag_report()[0]
    assert after["commits_behind"] == 0
    assert after["pending_txns"] == 0
    assert after["cursor"] == src.current_version()
    assert after["last_seal_at"] is not None


def test_rename_and_drop_ddl_mirror_to_replica(spark, tmp_path):
    """Metadata-only DDL never rides the change feed (non-merge commits are
    skipped), so the replicator mirrors the source's schema-event log in
    sid order before applying data. Without the mirror, a post-rename feed
    row would union-evolve the NEW name in as a fresh column while rows
    never retouched kept their values under the retired name."""
    register(spark)
    src = _mk(spark, tmp_path, "ddl")
    src.merge_events(_events(spark, [
        ("a", 1, "keep-a", 0, 1, "I"), ("b", 2, "keep-b", 0, 2, "I"),
    ]), batch_id=0)
    rs = _rset(spark, tmp_path, [src])
    rs.sync_to_head()  # replica exists PRE-rename (holds the old name)

    src.rename_column("note", "comment")
    src.refresh()
    # post-rename merge touches only 'a' — 'b' is never rewritten
    src.merge_events(
        spark.createDataFrame(
            [("a", 10, "a-new", _ts(5), 3, "U")],
            "k string, v long, comment string, ts timestamp, lsn long, op string",
        ),
        batch_id=1,
    )
    rs.sync_to_head()
    rep = replica_handle(spark, src.root + "-replica")
    rep.refresh()
    cols = [f.name for f in rep.read().schema.fields]
    assert "comment" in cols and "note" not in cols
    got = sorted((r["k"], r["v"], r["comment"]) for r in rep.read().collect())
    want = sorted((r["k"], r["v"], r["comment"]) for r in src.read().collect())
    assert got == want  # b's value serves under the renamed column
    assert ("b", 2, "keep-b") in got

    src.drop_column("comment")
    src.refresh()
    src.merge_events(
        spark.createDataFrame(
            [("c", 3, _ts(6), 4, "I")],
            "k string, v long, ts timestamp, lsn long, op string",
        ),
        batch_id=2,
    )
    rs.sync_to_head()
    rep.refresh()
    cols = [f.name for f in rep.read().schema.fields]
    assert "comment" not in cols
    assert sorted((r["k"], r["v"]) for r in rep.read().collect()) == sorted(
        (r["k"], r["v"]) for r in src.read().collect()
    )


def test_cli_replicate_sync_and_lag(spark, tmp_path):
    """Operator-facing CLI: replicate-sync applies the sealed cuts through
    a fresh spark-submit-style process and prints applied txns + lag;
    replicate-lag is the metadata-only poll."""
    import subprocess
    import sys as _sys

    src = _mk(spark, tmp_path, "clisrc")
    src.merge_events(_events(spark, [("a", 1, "a1", 0, 1, "I")]), batch_id=0)
    log = TransactionLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    txn.stage(src).merge_events(
        _events(spark, [("b", 2, "b1", 1, 2, "I"), ("a", None, None, 2, 3, "D")]),
        batch_id=1,
    )
    txn.commit()
    dst = str(tmp_path / "clidst")

    def cli(*args):
        r = subprocess.run(
            [_sys.executable, "-m", "ccdb_data_pipeline_spark.cli", *args,
             "--master", "local[2]"],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return [json.loads(l) for l in r.stdout.strip().splitlines()
                if l.startswith("{")]

    lag = cli("replicate-lag", "--table", src.root, "--out", dst,
              "--txn-log", str(tmp_path / "txnlog"),
              "--replica-log", str(tmp_path / "replog"))[-1]["lag"][0]
    assert lag["pending_txns"] == 1 and lag["cursor"] == 0

    out = cli("replicate-sync", "--table", src.root, "--out", dst,
              "--txn-log", str(tmp_path / "txnlog"),
              "--replica-log", str(tmp_path / "replog"))[-1]
    assert len(out["applied_txns"]) == 1
    assert out["lag"][0]["pending_txns"] == 0
    assert _state(replica_handle(spark, dst)) == _state(src) == [("b", 2, "b1")]


def test_chained_replication_tier2(spark, tmp_path):
    """Replicas compose: the replica's cut log is itself a sealed-record
    chain, so a second-tier ReplicaSet (edge -> region -> global topology)
    replays tier-1's cut records as its source transactions — same wire,
    same consistency guarantee, no special casing."""
    register(spark)
    src = _mk(spark, tmp_path, "t0")
    src.merge_events(_events(spark, [("a", 1, "a1", 0, 1, "I")]), batch_id=0)
    log = TransactionLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    txn.stage(src).merge_events(
        _events(spark, [("b", 2, "b1", 1, 2, "I"), ("a", 9, "a2", 2, 3, "U")]),
        batch_id=1,
    )
    txn.commit()

    t1root = str(tmp_path / "t1")
    rs1 = ReplicaSet(spark, str(tmp_path / "txnlog"), str(tmp_path / "log1"),
                     {src.root: t1root})
    rs1.sync()

    t2root = str(tmp_path / "t2")
    rs2 = ReplicaSet(spark, str(tmp_path / "log1"), str(tmp_path / "log2"),
                     {t1root: t2root})
    applied = rs2.sync()
    assert applied  # tier-1 cut records drove tier-2
    t2 = replica_handle(spark, t2root)
    assert _state(t2) == _state(src) == [("a", 9, "a2"), ("b", 2, "b1")]
    # tier-2 replica keeps the same engine wiring for a third tier
    assert t2.manifest()["engine"] == replica_handle(spark, t1root).manifest()["engine"]
    # incremental: a new source cut flows through both tiers
    txn = log.begin()
    txn.stage(src).merge_events(
        _events(spark, [("a", None, None, 3, 4, "D")]), batch_id=2
    )
    txn.commit()
    rs1.sync()
    rs2.sync()
    assert _state(t2) == _state(src) == [("b", 2, "b1")]


def test_gdpr_purge_propagates_to_replica(spark, tmp_path):
    """Right-to-erasure across the replication topology: the source purge's
    tombstone batch rides the feed (and its expire advances the floor, so a
    stale replica takes the heal path with the RETAINED key tombstones);
    the replica's own physical erasure is then the same local pipeline
    every copy runs — compact + expire — after which no retained replica
    file holds the purged payload bytes."""
    import glob

    import pyarrow.parquet as pq

    from ccdb_data_pipeline_spark.plans.dml import purge_where

    register(spark)
    src = _mk(spark, tmp_path, "pii")
    src.merge_events(_events(spark, [
        ("victim", 1, "SECRET-PII", 0, 1, "I"), ("other", 2, "keep", 0, 2, "I"),
    ]), batch_id=0)
    rs = _rset(spark, tmp_path, [src])
    rs.sync_to_head()

    rpt = purge_where(src, "k = 'victim'")
    assert rpt["n_purged"] >= 1 if "n_purged" in rpt else True
    rs.sync_to_head()

    rep = replica_handle(spark, src.root + "-replica")
    assert _state(rep) == _state(src) == [("other", 2, "keep")]

    # replica-side physical erasure: same local maintenance as any copy
    rep.compact(drop_tombstones=False, only_dirty=False)
    rep.expire_snapshots(retain_last=1)
    rep.remove_orphans()
    leaked = []
    for f in glob.glob(os.path.join(rep.root, "**", "*.parquet"), recursive=True):
        t = pq.read_table(f)
        if "note" in t.column_names:
            leaked += [v for v in t.column("note").to_pylist() if v == "SECRET-PII"]
    assert not leaked


def test_first_row_engine_through_wire(spark, tmp_path):
    """First-row (claim-once) sources replicate through the same events
    wire: the feed's dominance riders carry each event's own pair, and the
    replica's first-row fold takes the same argmin — later claims lose on
    both sides, deletes dominate permanently on both sides."""
    register(spark)
    src = _mk(spark, tmp_path, "fr", first_row=True)
    src.merge_events(_events(spark, [
        ("a", 1, "first-claim", 5, 1, "I"),
        ("a", 2, "late-claim", 9, 2, "I"),     # later ts: must lose
        ("b", 3, "b1", 0, 3, "I"),
    ]), batch_id=0)
    log = TransactionLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    txn.stage(src).merge_events(_events(spark, [
        ("a", 9, "even-earlier", 1, 4, "I"),   # EARLIER ts, later batch: wins
        ("b", None, None, 2, 5, "D"),          # permanent erase
        ("b", 7, "resurrect?", 9, 6, "I"),     # must NOT resurrect
    ]), batch_id=1)
    txn.commit()

    rs = _rset(spark, tmp_path, [src])
    rs.sync()
    rep = replica_handle(spark, src.root + "-replica")
    assert rep.manifest()["engine"]["first_row"] is True
    assert _state(rep) == _state(src) == [("a", 9, "even-earlier")]


def test_cdc_mode_ttl_propagates_to_replica(spark, tmp_path):
    """Row-level TTL in ttl_mode='cdc' emits real tombstone events, so a
    replica tailing the public wire converges to the aged-out state (the
    default DV mode is feed-invisible table maintenance by design — each
    replica would run its own TTL policy instead)."""
    from ccdb_data_pipeline_spark.plans.maintenance import (
        MaintenancePolicy,
        auto_maintain,
    )

    register(spark)
    src = _mk(spark, tmp_path, "ttl", stats_cols=("ts",))
    # minutes 0-9: expired by the cutoff below; minutes 1380+: retained
    src.merge_events(
        _events(
            spark,
            [(f"old{i}", i, "o", i, i + 1, "I") for i in range(10)]
            + [(f"new{i}", i, "n", 1380 + i, 100 + i, "I") for i in range(5)],
        ),
        batch_id=0,
    )
    rs = _rset(spark, tmp_path, [src])
    rs.sync_to_head()
    rep = replica_handle(spark, src.root + "-replica")
    assert _state(rep) == _state(src)

    now = (T0 + dt.timedelta(days=1)).replace(tzinfo=None)
    pol = MaintenancePolicy(
        max_delta_depth=99, max_dirty_buckets=9999, retain_snapshots=50,
        ttl_column="ts", ttl_max_age=dt.timedelta(hours=12), ttl_now=now,
        ttl_mode="cdc",
    )
    r = auto_maintain(src, pol)
    assert r["actions"]["ttl"]["run"]
    assert r["actions"]["ttl"]["result"]["n_tombstoned"] == 10

    rs.sync_to_head()
    assert _state(rep) == _state(src)
    assert len(_state(rep)) == 5
    assert all(k.startswith("new") for k, _, _ in _state(rep))


def test_replica_converges_after_source_txn_log_expiry(spark, tmp_path):
    """TransactionLog.expire folds old sealed records into a checkpoint;
    a replica whose cursor predates the fold horizon loses those exact
    cut boundaries but still converges — the surviving record's window
    spans the folded interval through the change feed."""
    register(spark)
    src = _mk(spark, tmp_path, "exp")
    log = TransactionLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    b = txn.stage(src)
    b.merge_events(_events(spark, [("a", 1, "a1", 0, 1, "I")]), batch_id=0)
    txn.commit()
    rs = _rset(spark, tmp_path, [src])
    assert len(rs.sync()) == 1  # replica current as of cut 1

    for i, (k, lsn) in enumerate([("b", 2), ("c", 3), ("d", 4)], start=1):
        txn = log.begin()
        bb = txn.stage(src)
        bb.merge_events(_events(spark, [(k, lsn, k, i, lsn, "I")]), batch_id=i)
        txn.commit()
    assert log.expire(keep_last=1)["folded"] >= 2

    applied = rs.sync()
    assert len(applied) == 1  # one surviving cut, spanning the fold
    rep = replica_handle(spark, src.root + "-replica")
    assert _state(rep) == _state(src)
    assert len(_state(rep)) == 4


def test_replica_log_expire_preserves_state_and_sync_semantics(spark, tmp_path):
    """ReplicaSet.expire folds old cut records into a checkpoint: cursor /
    consistent_versions / lag_report are unchanged, an UNEXPIRED source log
    replayed against the folded replica log neither re-applies nor
    re-seals (subsumption by the cursor floor), and replication continues
    normally afterwards."""
    register(spark)
    src = _mk(spark, tmp_path, "rx")
    log = TransactionLog(str(tmp_path / "txnlog"))
    rs = _rset(spark, tmp_path, [src])
    for i, (k, lsn) in enumerate([("a", 1), ("b", 2), ("c", 3), ("d", 4)]):
        txn = log.begin()
        b = txn.stage(src)
        b.merge_events(_events(spark, [(k, lsn, k, i, lsn, "I")]), batch_id=i)
        txn.commit()
        rs.sync()

    cur0, cons0, lag0 = rs.cursor(), rs.consistent_versions(), rs.lag_report()
    assert rs.expire(keep_last=1)["folded"] == 3
    assert rs.cursor() == cur0
    assert rs.consistent_versions() == cons0
    assert rs.lag_report() == lag0
    assert rs.expire(keep_last=1) == {"folded": 0, "kept": 1}

    # source log unexpired: its old records are SUBSUMED, not pending
    rep = replica_handle(spark, src.root + "-replica")
    v = rep.refresh().current_version()
    n_recs = len([f for f in os.listdir(rs.dst_log_dir) if f.endswith(".committed.json")])
    assert rs.sync() == []
    assert rep.refresh().current_version() == v
    assert n_recs == len(
        [f for f in os.listdir(rs.dst_log_dir) if f.endswith(".committed.json")]
    )

    # replication continues normally past the fold
    txn = log.begin()
    b = txn.stage(src)
    b.merge_events(_events(spark, [("e", 5, "e", 9, 5, "I")]), batch_id=4)
    txn.commit()
    assert len(rs.sync()) == 1
    assert _state(rep) == _state(src)
    assert len(_state(rep)) == 5


def test_replica_log_expire_reclaims_crash_leftovers(spark, tmp_path):
    """Crash between the replica checkpoint replace and the folded-file
    deletes: the leftover is invisible to state readers (horizon skip),
    and the next expire deletes it WITHOUT re-folding, keeping the folded
    counter truthful."""
    import shutil

    register(spark)
    src = _mk(spark, tmp_path, "rcl")
    log = TransactionLog(str(tmp_path / "txnlog"))
    rs = _rset(spark, tmp_path, [src])
    for i, (k, lsn) in enumerate([("a", 1), ("b", 2), ("c", 3)]):
        txn = log.begin()
        b = txn.stage(src)
        b.merge_events(_events(spark, [(k, lsn, k, i, lsn, "I")]), batch_id=i)
        txn.commit()
        rs.sync()
    recs = sealed_records(rs.dst_log_dir)
    oldest = recs[0]["_file"]
    saved = tmp_path / "saved-cut.json"
    shutil.copy(os.path.join(rs.dst_log_dir, oldest), saved)

    cur0, cons0 = rs.cursor(), rs.consistent_versions()
    assert rs.expire(keep_last=1)["folded"] == 2
    folded0 = rs._ckpt()["folded"]
    # simulate the crash: a folded record reappears on disk
    shutil.copy(saved, os.path.join(rs.dst_log_dir, oldest))
    assert rs.cursor() == cur0 and rs.consistent_versions() == cons0
    r = rs.expire(keep_last=1)
    assert r.get("reclaimed") == 1 and r["folded"] == 0
    assert rs._ckpt()["folded"] == folded0
    assert not os.path.exists(os.path.join(rs.dst_log_dir, oldest))
    assert rs.cursor() == cur0 and rs.consistent_versions() == cons0
