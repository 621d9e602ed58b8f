"""Deletion vectors (plans/lake.py delete_where_dv): position-delete
sidecars per base file — bulk DELETE WHERE at O(positions) instead of
O(deleted rows), with the affected buckets staying on the plain-scan path
(no delta layers, no read-time resolve). Replay equality vs the tombstone
path, exact count_fast, facade parity, re-delete union, dirty-bucket
fallback, time travel, and physical reclamation via compaction."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.dml import delete_where
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas

PRED = "role = 'user' AND turn_idx % 3 = 0"
TS = dt.datetime(2030, 1, 1)


def _mk(spark, tmp_path, name, compacted=True, n_changes=300):
    t = SnapshotParquetTable(
        spark, str(tmp_path / name), TableSpec(num_buckets=4, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(
        t, spark.createDataFrame(gen_seed_pandas(n_convs=25, seed=13), TRANSCRIPT_SCHEMA)
    )
    if n_changes:
        ch = gen_changes_pandas(n_changes, n_convs=25, seed=13)
        apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA), batch_id=1)
    if compacted:
        t.compact(only_dirty=False)
    return t


def _state(t, **kw):
    rows = t.read(**kw).collect()
    return sorted((r["conv_id"], r["turn_idx"], r["text"], r["role"]) for r in rows)


def test_dv_equals_tombstone_delete(spark, tmp_path):
    a = _mk(spark, tmp_path, "dv")
    b = _mk(spark, tmp_path, "tomb")
    rep = a.delete_where_dv(PRED, ts=TS)
    delete_where(b, PRED, ts=TS)
    assert rep["n_dv_positions"] > 0 and rep["n_tombstoned"] == 0
    assert _state(a) == _state(b)
    # the DV table's buckets are still delta-free (plain-scan path); the
    # tombstone table's are dirty until compaction
    ma, mb = a.manifest(), b.manifest()
    assert not any(e.get("delta") for fs in ma["buckets"].values() for e in fs)
    assert any(e.get("delta") for fs in mb["buckets"].values() for e in fs)
    assert ma["summary"]["op"] == "dv_delete"


def test_count_fast_exact_with_dv(spark, tmp_path):
    t = _mk(spark, tmp_path, "cnt")
    t.delete_where_dv(PRED, ts=TS)
    assert t.count_fast() == t.read().count()
    # fast path actually used: all files all_live, no deltas
    m = t.manifest()
    assert all(
        e.get("all_live") and not e.get("delta")
        for fs in m["buckets"].values()
        for e in fs
    )


def test_facade_read_applies_dv(spark, tmp_path):
    from ccdb_data_pipeline_spark.plans.datasource import register

    t = _mk(spark, tmp_path, "facade")
    t.delete_where_dv(PRED, ts=TS)
    register(spark)
    facade = spark.read.format("transcript_lake").load(t.root)
    engine = t.read()
    assert facade.count() == engine.count()
    assert facade.filter(PRED).count() == 0
    cols = ["conv_id", "turn_idx", "text", "role"]
    assert sorted(map(tuple, facade.select(cols).collect())) == sorted(
        map(tuple, engine.select(cols).collect())
    )


def test_redelete_unions_positions(spark, tmp_path):
    t = _mk(spark, tmp_path, "union")
    r1 = t.delete_where_dv("role = 'user'", ts=TS)
    n_after_1 = t.read().count()
    r2 = t.delete_where_dv("turn_idx % 2 = 1", ts=TS)
    assert r1["n_dv_positions"] > 0 and r2["n_dv_positions"] > 0
    # both predicates now erased; each entry carries ONE dv pointer whose
    # count covers the union
    assert t.read().filter("role = 'user' OR turn_idx % 2 = 1").count() == 0
    assert t.read().count() < n_after_1
    m = t.manifest()
    dv_total = sum(
        e["dv"]["n_deleted"]
        for fs in m["buckets"].values()
        for e in fs
        if e.get("dv")
    )
    assert dv_total == r1["n_dv_positions"] + r2["n_dv_positions"]
    assert t.count_fast() == t.read().count()


def test_dirty_buckets_fall_back_to_tombstones(spark, tmp_path):
    t = _mk(spark, tmp_path, "dirty", compacted=False)  # deltas everywhere
    b = _mk(spark, tmp_path, "oracle", compacted=False)
    rep = t.delete_where_dv(PRED, ts=TS)
    assert rep["n_dv_positions"] == 0 and rep["n_tombstoned"] > 0
    delete_where(b, PRED, ts=TS)
    assert _state(t) == _state(b)


def test_time_travel_sees_pre_dv_rows(spark, tmp_path):
    t = _mk(spark, tmp_path, "tt")
    v0 = t.current_version()
    n0 = t.read().count()
    t.delete_where_dv(PRED, ts=TS)
    assert t.read(version=v0).count() == n0
    assert t.read(version=v0).filter(PRED).count() > 0
    assert t.read().filter(PRED).count() == 0


def test_compaction_reclaims_dv_physically(spark, tmp_path):
    t = _mk(spark, tmp_path, "reclaim")
    t.delete_where_dv(PRED, ts=TS)
    want = _state(t)
    t.compact(only_dirty=False)
    assert _state(t) == want
    m = t.manifest()
    assert not any("dv" in e for fs in m["buckets"].values() for e in fs)
    # the rewritten files physically lack the rows (raw read, no DV logic)
    raw = spark.read.parquet(
        *[os.path.join(t.root, e["path"]) for fs in m["buckets"].values() for e in fs]
    )
    assert raw.filter(PRED).count() == 0


def test_later_upsert_reinserts_documented_semantics(spark, tmp_path):
    """A DV delete carries no LWW dominance: a later upstream event for a
    DV-deleted key re-inserts it (the Delta/Iceberg position-delete
    semantics, documented in the docstring)."""
    t = _mk(spark, tmp_path, "resur", n_changes=0)
    key = t.read().select("conv_id", "turn_idx").orderBy("conv_id", "turn_idx").first()
    t.delete_where_dv(
        f"conv_id = '{key['conv_id']}' AND turn_idx = {key['turn_idx']}", ts=TS
    )
    assert (
        t.read()
        .filter(f"conv_id = '{key['conv_id']}' AND turn_idx = {key['turn_idx']}")
        .count()
        == 0
    )
    ev = spark.createDataFrame(
        [(10**9, "U", key["conv_id"], int(key["turn_idx"]), "user",
          "resurrected", None, TS + dt.timedelta(days=1))],
        CHANGE_SCHEMA,
    )
    apply_changes(t, ev, batch_id=t.last_batch_id + 1)
    got = (
        t.read()
        .filter(f"conv_id = '{key['conv_id']}' AND turn_idx = {key['turn_idx']}")
        .collect()
    )
    assert len(got) == 1 and got[0]["text"] == "resurrected"


def _seed_roles(spark, tmp_path, name, role_of):
    """Transcript table (stats on role), 200 rows; role = role_of(i)."""
    import pandas as pd

    t = SnapshotParquetTable(
        spark,
        str(tmp_path / name),
        TableSpec(num_buckets=4, merge_mode="mor", stats_cols=("role",)),
    )
    t.create(TRANSCRIPT_SCHEMA)
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i % 20}" for i in range(200)],
            "turn_idx": [i // 20 for i in range(200)],
            "role": [role_of(i) for i in range(200)],
            "text": [f"t{i}" for i in range(200)],
            "tool": [None] * 200,
            "ts": [TS] * 200,
        }
    )
    bootstrap_seed(t, spark.createDataFrame(pdf, TRANSCRIPT_SCHEMA))
    t.compact(only_dirty=False)
    return t


def test_structured_predicate_metadata_drop_all(spark, tmp_path):
    """Every file provably all-matching -> the whole DELETE is a manifest
    edit: zero data bytes read, zero positions written."""
    t = _seed_roles(spark, tmp_path, "alldrop", lambda i: "user")
    n_files = sum(len(fs) for fs in t.manifest()["buckets"].values())
    seen = []
    orig = t._read_files
    t._read_files = lambda entries, m, **kw: (seen.append(len(entries)), orig(entries, m, **kw))[1]
    rep = t.delete_where_dv([("role", "=", "user")], ts=TS)
    assert rep["n_files_dropped"] == n_files
    assert rep["n_rows_dropped"] == 200
    assert rep["n_dv_positions"] == 0
    assert sum(seen) == 0  # metadata only — no positional scan at all
    assert t.read().count() == 0
    assert t.count_fast() == 0


def test_structured_predicate_mixed_tiers(spark, tmp_path):
    """Conversations bucket together; convs 0..9 are all-'zz' (their
    buckets' files may be homogeneous) while others are mixed — the drop
    tier takes provable files, the positional tier the rest, and the
    final state equals the SQL-string twin."""
    role_of = lambda i: "zz" if (i % 20) < 10 else ("user" if i % 2 else "zz")  # noqa: E731
    a = _seed_roles(spark, tmp_path, "mix-a", role_of)
    b = _seed_roles(spark, tmp_path, "mix-b", role_of)
    rep = a.delete_where_dv([("role", "=", "zz")], ts=TS)
    b.delete_where_dv("role = 'zz'", ts=TS)
    assert a.read().filter("role = 'zz'").count() == 0
    got = sorted(map(tuple, a.read().select("conv_id", "turn_idx", "text").collect()))
    want = sorted(map(tuple, b.read().select("conv_id", "turn_idx", "text").collect()))
    assert got == want and got
    assert rep["n_files_dropped"] + rep["n_files_with_dv"] > 0
    assert a.count_fast() == a.read().count()


def test_structured_predicate_validation(spark, tmp_path):
    t = _seed_roles(spark, tmp_path, "val2", lambda i: "user")
    with pytest.raises(ValueError, match="unknown column"):
        t.delete_where_dv([("nope", "=", 1)], ts=TS)
    with pytest.raises(ValueError, match="op"):
        t.delete_where_dv([("role", "~", 1)], ts=TS)


def test_retention_reclaims_superseded_dv_sidecars(spark, tmp_path):
    """Superseded/shed DV sidecar directories are reclaimed by the
    retention walks (round-3 ADVICE: dv/ leaked forever — expire and
    orphan GC only walked data/)."""
    t = _mk(spark, tmp_path, "dvgc")
    t.delete_where_dv(PRED, ts=TS)
    t.delete_where_dv("turn_idx % 5 = 1", ts=TS)  # re-delete: new sidecar
    dv_root = os.path.join(t.root, "dv")
    n_sidecars = len([d for d in os.listdir(dv_root) if d.startswith("dv-")])
    assert n_sidecars == 2
    # compaction folds positions physically and sheds every dv pointer;
    # after retention collapses history, no manifest references any sidecar
    t.compact(only_dirty=False)
    before = t.read().collect()
    stats = t.expire_snapshots(retain_last=1)
    assert stats["n_data_files_deleted"] > 0
    remaining = os.listdir(dv_root) if os.path.isdir(dv_root) else []
    assert remaining == []
    assert sorted(map(tuple, t.read().collect())) == sorted(map(tuple, before))


def test_remove_orphans_reclaims_unreferenced_dv_dirs(spark, tmp_path):
    """A crashed delete_where_dv leaves a sidecar no manifest references;
    remove_orphans reclaims it but keeps the referenced one."""
    t = _mk(spark, tmp_path, "dvorph")
    t.delete_where_dv(PRED, ts=TS)
    dv_root = os.path.join(t.root, "dv")
    live = [d for d in os.listdir(dv_root) if d.startswith("dv-")]
    assert len(live) == 1
    # fabricate crash debris: an unreferenced sidecar dir with a file
    import pandas as pd

    debris = os.path.join(dv_root, "dv-deadbeef0000")
    os.makedirs(debris)
    pd.DataFrame({"path": ["x"], "pos": [0]}).to_parquet(os.path.join(debris, "p.parquet"))
    rep = t.remove_orphans()
    assert rep["n_data_files_deleted"] >= 1
    remaining = sorted(d for d in os.listdir(dv_root) if d.startswith("dv-"))
    assert remaining == sorted(live)
    assert t.read().filter(PRED.replace("AND", "and")).count() == 0
