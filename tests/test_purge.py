"""Hard purge (plans/dml.py purge_where): right-to-erasure workflow —
tombstone -> compact -> expire -> orphan GC -> attestation scan. The key
property tested here is PHYSICAL: after a purge, no parquet file anywhere
under the table root contains the purged rows' payload bytes (checked by
reading every remaining file raw with pyarrow, not through the engine)."""

import datetime as dt
import os

import pyarrow.parquet as pq
import pytest

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.dml import (
    PurgeVerificationError,
    purge_where,
)
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import (
    CHANGE_SCHEMA,
    TRANSCRIPT_SCHEMA,
    TableSpec,
)
from ccdb_data_pipeline_spark.sources.binlog import (
    gen_changes_pandas,
    gen_seed_pandas,
)

TS = dt.datetime(2030, 1, 1)


def _mk(spark, tmp_path, mode="mor", **spec_kw):
    spec = TableSpec(num_buckets=4, merge_mode=mode, **spec_kw)
    t = SnapshotParquetTable(spark, os.path.join(str(tmp_path), "t"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    seed = gen_seed_pandas(n_convs=20, seed=3)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    ch = gen_changes_pandas(400, n_convs=20, seed=3)
    apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA), batch_id=0)
    return t, seed, ch


def _unique_texts(seed, ch, conv):
    """Texts belonging ONLY to ``conv`` across the full event universe —
    including LWW losers, whose raw rows legitimately persist in other
    buckets' delta files after an unrelated purge."""
    mine = set(seed[seed.conv_id == conv].text) | set(
        ch[ch.conv_id == conv].text.dropna()
    )
    others = set(seed[seed.conv_id != conv].text) | set(
        ch[ch.conv_id != conv].text.dropna()
    )
    return sorted(mine - others - {None})


def _raw_files(root):
    for dirpath, _dn, files in os.walk(os.path.join(root, "data")):
        for fn in files:
            if fn.endswith(".parquet"):
                yield os.path.join(dirpath, fn)


def _bytes_contain(root, needles):
    """Raw out-of-band scan: does ANY remaining parquet file hold one of the
    needle strings in any string column? (engine-independent attestation)"""
    hits = []
    for path in _raw_files(root):
        tbl = pq.read_table(path)
        for col in tbl.column_names:
            if str(tbl.schema.field(col).type) not in ("string", "large_string"):
                continue
            vals = set(tbl.column(col).to_pylist())
            for needle in needles:
                if needle in vals:
                    hits.append((os.path.basename(path), col, needle))
    return hits


def _raw_payload_rows(root, conv):
    """Raw out-of-band scan: rows in any remaining parquet file carrying the
    purged conv_id with a non-null payload column (engine-independent)."""
    hits = []
    for path in _raw_files(root):
        tbl = pq.read_table(path)
        if "conv_id" not in tbl.column_names:
            continue
        cid = tbl.column("conv_id").to_pylist()
        for col in ("text", "tool", "role"):
            if col not in tbl.column_names:
                continue
            vals = tbl.column(col).to_pylist()
            for c, v in zip(cid, vals):
                if c == conv and v is not None:
                    hits.append((os.path.basename(path), col, v))
    return hits


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_purge_where_physically_erases_payload(spark, tmp_path, mode):
    t, seed, ch = _mk(spark, tmp_path, mode=mode)
    victim_rows = t.read().filter("conv_id = 'conv-00000003'").collect()
    assert victim_rows, "victim must exist before the purge"
    needles = _unique_texts(seed, ch, "conv-00000003")
    n_before = t.read().count()
    v_before = t.current_version()

    out = purge_where(t, "conv_id = 'conv-00000003'", ts=TS)
    assert out["clean"] and out["n_keys"] == len(victim_rows)
    assert out["n_residual_payload_rows"] == 0
    assert out["bytes_reclaimed"] > 0

    # logically gone
    assert t.read().filter("conv_id = 'conv-00000003'").count() == 0
    assert t.read().count() == n_before - len(victim_rows)
    # physically gone: raw pyarrow scan of every remaining file — no row
    # keyed by the victim's conv_id retains any payload value, and none of
    # the victim-unique texts survive anywhere
    assert _raw_payload_rows(t.root, "conv-00000003") == []
    assert _bytes_contain(t.root, needles) == []
    # time travel to any pre-purge snapshot is gone (hard erasure)
    with pytest.raises(Exception):
        t.read(version=v_before).collect()
    # the table still ingests normally afterwards
    ch = gen_changes_pandas(100, n_convs=20, seed=9)
    apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA),
                  batch_id=t.last_batch_id + 1)
    assert t.read().count() > 0


def test_purge_keeps_tombstones_against_resurrection(spark, tmp_path):
    t, _seed, _ch = _mk(spark, tmp_path)
    turns = {
        r["turn_idx"]
        for r in t.read().filter("conv_id = 'conv-00000001'").collect()
    }
    purge_where(t, "conv_id = 'conv-00000001'", ts=TS)
    # a LATE pre-purge event (older ts) for a PURGED key must NOT resurrect
    # it (an event for a turn the conv never had is NEW data, not a replay —
    # the tombstone guard only covers keys that existed at purge time)
    late = gen_changes_pandas(50, n_convs=20, seed=5)
    late = late[
        (late.conv_id == "conv-00000001") & late.turn_idx.isin(turns)
    ].copy()
    assert len(late)
    late["ts"] = dt.datetime(2001, 1, 1)
    late["lsn"] = range(t.last_lsn + 1, t.last_lsn + 1 + len(late))
    late["op"] = "U"
    apply_changes(t, spark.createDataFrame(late, CHANGE_SCHEMA),
                  batch_id=t.last_batch_id + 1)
    assert t.read().filter("conv_id = 'conv-00000001'").count() == 0


def test_purge_drop_tombstones_erases_keys_too(spark, tmp_path):
    t, _seed, _ch = _mk(spark, tmp_path)
    out = purge_where(t, "conv_id = 'conv-00000002'", ts=TS,
                      drop_tombstones=True)
    assert out["clean"] and out["n_key_tombstones"] == 0
    assert _bytes_contain(t.root, ["conv-00000002"]) == []


def test_purge_refuses_pinned_snapshots(spark, tmp_path):
    t, _seed, _ch = _mk(spark, tmp_path)
    t.create_tag("audit-2030")
    with pytest.raises(ValueError, match="tags"):
        purge_where(t, "conv_id = 'conv-00000004'", ts=TS)
    out = purge_where(t, "conv_id = 'conv-00000004'", ts=TS, drop_tags=True)
    assert out["clean"] and t.tags() == {}

    t.create_branch("staging")
    with pytest.raises(ValueError, match="branches"):
        purge_where(t, "conv_id = 'conv-00000005'", ts=TS)
    t.drop_branch("staging")
    assert purge_where(t, "conv_id = 'conv-00000005'", ts=TS)["clean"]


def test_purge_no_match_is_clean_noop(spark, tmp_path):
    t, _seed, _ch = _mk(spark, tmp_path)
    n = t.read().count()
    out = purge_where(t, "conv_id = 'no-such-conv'", ts=TS)
    assert out["clean"] and out["n_keys"] == 0
    assert out["n_residual_payload_rows"] == 0
    assert t.read().count() == n
