"""Metadata-only retention (Iceberg metadata-delete analog): whole
ts-expired data files are dropped from the manifest with zero data IO;
straggler rows go through the normal tombstone path; null-ts rows (exempt
from retention) are protected by the footer null-count probe; time travel
and the change feed stay correct across the drop."""

import datetime as dt
import os

from ccdb_data_pipeline_spark.plans.dml import apply_retention, apply_retention_fast
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec

OLD = dt.datetime(2025, 1, 1)
NEW = dt.datetime(2025, 1, 10)
CUTOFF_AGE = dt.timedelta(days=5)
NOW = dt.datetime(2025, 1, 12)  # cutoff = Jan 7: OLD expired, NEW kept


def _events():
    rows, lsn = [], 0
    for ci in range(6):
        for t in range(30):
            lsn += 1
            rows.append((lsn, "I", f"old-{ci}", t, "user", f"x{t}", None,
                         OLD + dt.timedelta(minutes=ci * 40 + t)))
    for ci in range(6):
        for t in range(10):
            lsn += 1
            rows.append((lsn, "I", f"new-{ci}", t, "user", f"y{t}", None,
                         NEW + dt.timedelta(minutes=ci * 15 + t)))
    for t in range(3):  # live rows with NULL ts: retention-exempt
        lsn += 1
        rows.append((lsn, "I", "nullcv", t, "user", "keepme", None, None))
    return rows


def _mk(spark, tmp_path, name):
    t = SnapshotParquetTable(
        spark,
        os.path.join(str(tmp_path), name),
        TableSpec(num_buckets=2, merge_mode="mor", max_file_rows=40),
    )
    t.create(TRANSCRIPT_SCHEMA)
    t.merge_events(spark.createDataFrame(_events(), CHANGE_SCHEMA), batch_id=0)
    t.compact(zorder_by=("ts",))  # ts-clustered files: the fast-path layout
    return t


def _state(table, version=None):
    return {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["ts"])
        for r in table.read(version=version).collect()
    }


def test_drop_expired_files_is_exact_and_safe(spark, tmp_path):
    t = _mk(spark, tmp_path, "t")
    pre = _state(t)
    v_pre = t.current_version()
    cutoff = NOW - CUTOFF_AGE

    rep = t.drop_expired_files(cutoff)
    assert rep["files_dropped"] > 0 and rep["rows_dropped"] > 0
    after = _state(t)
    removed = {k: v for k, v in pre.items() if k not in after}
    assert len(removed) == rep["rows_dropped"]
    # every removed row was provably expired; nothing else moved
    assert all(v[2] is not None and v[2] < cutoff for v in removed.values())
    assert all(pre[k] == v for k, v in after.items())
    # null-ts rows are untouchable by the whole-file drop
    assert ("nullcv", 0) in after and ("nullcv", 2) in after
    # metadata-consistent count + time travel back across the drop
    assert t.count_fast() == len(after)
    assert _state(t, version=v_pre) == pre
    # the change feed reports the drop as deletes (file-list diff)
    feed = t.table_changes(v_pre).filter("_change_type = 'delete'")
    assert feed.count() == rep["rows_dropped"]


def test_fast_retention_matches_slow_path(spark, tmp_path):
    fast = _mk(spark, tmp_path, "fast")
    slow = _mk(spark, tmp_path, "slow")
    rep = apply_retention_fast(fast, CUTOFF_AGE, now=NOW)
    apply_retention(slow, CUTOFF_AGE, now=NOW)
    assert rep["metadata"]["files_dropped"] > 0
    # the tombstone path only had the stragglers left to rewrite
    assert rep["tombstoned"].n_delete < 6 * 30
    assert _state(fast) == _state(slow)
    # all expired rows gone, all fresh + null-ts rows kept, in both
    got = _state(fast)
    assert not any(k[0].startswith("old-") for k in got)
    assert sum(k[0].startswith("new-") for k in got) == 60
    assert sum(k[0] == "nullcv" for k in got) == 3


def test_delta_dirty_bucket_is_excluded(spark, tmp_path):
    t = _mk(spark, tmp_path, "dirty")
    # new delta layers over both buckets -> every bucket dirty -> no drops
    t.merge_events(
        spark.createDataFrame(
            [(9001, "U", "old-0", 0, "user", "edited", None, NEW)], CHANGE_SCHEMA
        ),
        batch_id=1,
    )
    t.merge_events(
        spark.createDataFrame(
            [(9002, "U", "old-1", 0, "user", "edited", None, NEW)], CHANGE_SCHEMA
        ),
        batch_id=2,
    )
    pre_files = sum(len(fs) for fs in t.manifest()["buckets"].values())
    rep = t.drop_expired_files(NOW - CUTOFF_AGE)
    dirty = {
        b
        for b, fs in t.manifest()["buckets"].items()
        if any(e.get("delta") for e in fs)
    }
    post_files = sum(len(fs) for fs in t.manifest()["buckets"].values())
    if len(dirty) == 2:
        assert rep["files_dropped"] == 0 and post_files == pre_files
    else:
        # the updates hashed into one bucket: the clean one may still drop
        assert all(
            b in t.manifest()["buckets"] for b in dirty
        )
    # correctness regardless: fast retention still converges to slow-path state
    twin = _mk(spark, tmp_path, "twin")
    twin.merge_events(
        spark.createDataFrame(
            [(9001, "U", "old-0", 0, "user", "edited", None, NEW),
             (9002, "U", "old-1", 0, "user", "edited", None, NEW)], CHANGE_SCHEMA
        ),
        batch_id=1,
    )
    apply_retention_fast(t, CUTOFF_AGE, now=NOW)
    apply_retention(twin, CUTOFF_AGE, now=NOW)
    assert _state(t) == _state(twin)
