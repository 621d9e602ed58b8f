"""Multi-table atomic transactions: all-or-nothing publish with roll-forward."""

import os

import pandas as pd
import pytest

from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.plans.txn import (
    TransactionAbortedError,
    TransactionLog,
)
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec


def _batch(spark, lsns, prefix="c"):
    n = len(lsns)
    pdf = pd.DataFrame(
        {
            "lsn": lsns,
            "op": ["I"] * n,
            "conv_id": [f"{prefix}-{lsn}" for lsn in lsns],
            "turn_idx": [0] * n,
            "role": ["user"] * n,
            "text": [f"t{i}" for i in range(n)],
            "tool": [None] * n,
            "ts": pd.Timestamp("2025-01-01"),
        }
    )
    return spark.createDataFrame(pdf, CHANGE_SCHEMA)


def _two_tables(spark, tmp_path):
    out = []
    for name in ("facts", "agg"):
        t = SnapshotParquetTable(
            spark, str(tmp_path / name), TableSpec(num_buckets=2, merge_mode="mor")
        )
        t.create(TRANSCRIPT_SCHEMA)
        t.merge(_batch(spark, [1, 2, 3], name), batch_id=0)
        out.append(t)
    return out


def test_commit_moves_all_tables_and_seals(spark, tmp_path):
    facts, agg = _two_tables(spark, tmp_path)
    log = TransactionLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    b1, b2 = txn.stage(facts), txn.stage(agg)
    b1.merge(_batch(spark, [4, 5], "facts"), batch_id=1)
    b2.merge(_batch(spark, [4, 5], "agg"), batch_id=1)
    published = txn.commit()

    for t in (facts, agg):
        t._manifest = None
        assert t.read().count() == 5
        assert t.branches() == {}
        assert published[t.root] == t.current_version()
    assert log.pending() == []
    assert log.consistent_versions() == published


def test_abort_leaves_mains_untouched(spark, tmp_path):
    facts, agg = _two_tables(spark, tmp_path)
    log = TransactionLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    b1, b2 = txn.stage(facts), txn.stage(agg)
    b1.merge(_batch(spark, [4], "facts"), batch_id=1)
    txn.abort()
    for t in (facts, agg):
        t._manifest = None
        assert t.read().count() == 3
        assert t.branches() == {}
    with pytest.raises(TransactionAbortedError):
        txn.commit()


def test_crash_mid_publish_rolls_forward(spark, tmp_path, monkeypatch):
    facts, agg = _two_tables(spark, tmp_path)
    log = TransactionLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    b1, b2 = txn.stage(facts), txn.stage(agg)
    b1.merge(_batch(spark, [4, 5], "facts"), batch_id=1)
    b2.merge(_batch(spark, [4, 5], "agg"), batch_id=1)

    real = SnapshotParquetTable.publish_branch
    calls = {"n": 0}

    def crash_on_second(self, name, audits=(), default_audits=True):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash between publishes")
        return real(self, name, audits=audits, default_audits=default_audits)

    monkeypatch.setattr(SnapshotParquetTable, "publish_branch", crash_on_second)
    with pytest.raises(RuntimeError, match="simulated crash"):
        txn.commit()
    monkeypatch.setattr(SnapshotParquetTable, "publish_branch", real)

    # torn state: facts published, agg not; intent still pending
    facts._manifest = None
    agg._manifest = None
    assert facts.read().count() == 5
    assert agg.read().count() == 3
    assert len(log.pending()) == 1

    recovered = TransactionLog(str(tmp_path / "txnlog")).recover(spark)
    assert recovered == [txn.txn_id]
    agg2 = SnapshotParquetTable(spark, agg.root)
    assert agg2.read().count() == 5
    assert log.pending() == []
    # recovery is idempotent
    assert TransactionLog(str(tmp_path / "txnlog")).recover(spark) == []
    assert set(log.consistent_versions()) == {facts.root, agg.root}


def test_main_divergence_aborts_before_intent(spark, tmp_path):
    facts, agg = _two_tables(spark, tmp_path)
    log = TransactionLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    b1 = txn.stage(facts)
    txn.stage(agg)
    b1.merge(_batch(spark, [4], "facts"), batch_id=1)
    # a rogue writer advances facts' main under the transaction
    facts.merge(_batch(spark, [10, 11], "rogue"), batch_id=1)
    with pytest.raises(TransactionAbortedError):
        txn.commit()
    assert log.pending() == []
    assert not os.listdir(log.log_dir)
    facts._manifest = None
    assert facts.branches() == {} and agg.branches() == {}


def test_consistent_versions_pin_cross_table_reads(spark, tmp_path):
    facts, agg = _two_tables(spark, tmp_path)
    log = TransactionLog(str(tmp_path / "txnlog"))
    txn = log.begin()
    b1, b2 = txn.stage(facts), txn.stage(agg)
    b1.merge(_batch(spark, [4, 5], "facts"), batch_id=1)
    b2.merge(_batch(spark, [4, 5], "agg"), batch_id=1)
    txn.commit()
    pinned = log.consistent_versions()

    # an in-flight single-table commit moves facts' main past the txn set
    facts._manifest = None
    facts.merge(_batch(spark, [6], "late"), batch_id=2)
    assert facts.read().count() == 6
    # the pinned set still reads the transactionally-consistent pair
    assert facts.read(version=pinned[facts.root]).count() == 5
    assert agg.read(version=pinned[agg.root]).count() == 5


# ------------------------------------------------------------ log retention

def _seal_n_txns(spark, tmp_path, n):
    """n sealed single-era txns over two tables; returns (log, tables)."""
    facts, agg = _two_tables(spark, tmp_path)
    log = TransactionLog(str(tmp_path / "txnlog"))
    lsn = 10
    for i in range(n):
        txn = log.begin()
        bf, ba = txn.stage(facts), txn.stage(agg)
        bf.merge(_batch(spark, [lsn], "facts"), batch_id=i + 1)
        ba.merge(_batch(spark, [lsn], "agg"), batch_id=i + 1)
        txn.commit()
        lsn += 1
    return log, (facts, agg)


def test_txn_expire_folds_history_and_preserves_catalog(spark, tmp_path):
    log, _tables = _seal_n_txns(spark, tmp_path, 5)
    before = log.consistent_versions()
    assert len([f for f in os.listdir(log.log_dir) if f.endswith(".committed.json")]) == 5

    r = log.expire(keep_last=2)
    assert r == {"folded": 3, "kept": 2}
    remaining = [f for f in os.listdir(log.log_dir) if f.endswith(".committed.json")]
    assert len(remaining) == 2
    cp = log.checkpoint()
    assert cp["folded"] == 3 and len(cp["txn_ids_tail"]) == 3
    # the catalog answer is IDENTICAL across the fold
    assert log.consistent_versions() == before

    # idempotent: nothing left under the keep floor
    assert log.expire(keep_last=2) == {"folded": 0, "kept": 2}
    # a second fold accumulates into the same checkpoint
    assert log.expire(keep_last=1) == {"folded": 1, "kept": 1}
    assert log.checkpoint()["folded"] == 4
    assert log.consistent_versions() == before


def test_txn_expire_crash_leftover_cannot_regress_catalog(spark, tmp_path):
    """Crash between the checkpoint replace and the folded-file deletes:
    a folded-but-undeleted record must not roll a table back to a
    pre-fold version (the horizon skip), and a re-run reclaims it."""
    import json as _json
    import shutil

    log, _tables = _seal_n_txns(spark, tmp_path, 4)
    before = log.consistent_versions()
    # snapshot the oldest sealed record, then expire
    recs = sorted(
        (f for f in os.listdir(log.log_dir) if f.endswith(".committed.json")),
        key=lambda fn: _json.load(open(os.path.join(log.log_dir, fn)))["sealed_at"],
    )
    saved = tmp_path / "saved.json"
    shutil.copy(os.path.join(log.log_dir, recs[0]), saved)
    log.expire(keep_last=1)
    # simulate the crash: the folded record reappears on disk
    shutil.copy(saved, os.path.join(log.log_dir, recs[0]))
    assert log.consistent_versions() == before  # horizon skips it
    folded_before = log.checkpoint()["folded"]
    r = log.expire(keep_last=1)
    # reclaimed WITHOUT re-folding: the checkpoint already accounts for it,
    # so the folded counter and txn_ids_tail stay truthful
    assert r.get("reclaimed") == 1 and r["folded"] == 0
    assert log.checkpoint()["folded"] == folded_before
    assert log.consistent_versions() == before
    assert not os.path.exists(os.path.join(log.log_dir, recs[0]))
