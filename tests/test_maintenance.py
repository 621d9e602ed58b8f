"""Snapshot lifecycle: change feed (table_changes), retention
(expire_snapshots), and orphan cleanup — the maintenance surface the
reference's terminal sink lacks but any lake-backed CDC engine needs."""

from datetime import datetime

import pandas as pd
import pytest

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas
from tests.oracle import table_to_pandas

N_CONVS = 40


@pytest.fixture(scope="module")
def seed_pdf():
    return gen_seed_pandas(n_convs=N_CONVS, seed=7)


def _mk(spark, tmp_path, seed_pdf, **spec_kw) -> SnapshotParquetTable:
    t = SnapshotParquetTable(
        spark, str(tmp_path / "table"), TableSpec(num_buckets=8, **spec_kw)
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    return t


def _changes(spark, rows):
    pdf = pd.DataFrame(rows)
    pdf["lsn"] = pdf["lsn"].astype("int64")
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return spark.createDataFrame(pdf, CHANGE_SCHEMA)


def test_table_changes_exact_semantics(spark, tmp_path, seed_pdf):
    """One batch with a known insert / update / delete -> exactly four change
    rows (update emits a pre+post image pair), everything else silent."""
    t = _mk(spark, tmp_path, seed_pdf)
    v1 = t.current_version()
    # iloc[10] is a plain-pool text row (indices 0-3 cycle through the ""/
    # null/utf8/whitespace specials that normalization rewrites)
    c0 = seed_pdf.iloc[10]
    ts = datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # new turn in an existing conversation -> insert
        {"lsn": 1000, "op": "I", "conv_id": c0.conv_id, "turn_idx": 9999,
         "role": "user", "text": "brand new turn", "tool": None, "ts": ts},
        # rewrite of an existing turn -> update (pre+post)
        {"lsn": 1001, "op": "U", "conv_id": c0.conv_id, "turn_idx": int(c0.turn_idx),
         "role": c0.role, "text": "rewritten text", "tool": None, "ts": ts},
    ]
    c1 = seed_pdf.iloc[len(seed_pdf) - 1]
    rows.append(
        {"lsn": 1002, "op": "D", "conv_id": c1.conv_id, "turn_idx": int(c1.turn_idx),
         "role": None, "text": None, "tool": None, "ts": ts}
    )
    apply_changes(t, _changes(spark, rows), batch_id=0)
    v2 = t.current_version()

    feed = t.table_changes(v1, v2).toPandas()
    assert set(feed["_change_type"]) == {
        "insert", "delete", "update_preimage", "update_postimage"
    }
    assert len(feed) == 4
    ins = feed[feed["_change_type"] == "insert"].iloc[0]
    assert (ins.conv_id, ins.turn_idx, ins.text) == (c0.conv_id, 9999, "brand new turn")
    dele = feed[feed["_change_type"] == "delete"].iloc[0]
    assert (dele.conv_id, dele.turn_idx) == (c1.conv_id, c1.turn_idx)
    pre = feed[feed["_change_type"] == "update_preimage"].iloc[0]
    post = feed[feed["_change_type"] == "update_postimage"].iloc[0]
    assert pre.text == c0.text and post.text == "rewritten text"
    assert (feed["_from_version"] == v1).all() and (feed["_to_version"] == v2).all()
    # self-diff is empty; inverted range raises
    assert t.table_changes(v2, v2).count() == 0
    with pytest.raises(ValueError):
        t.table_changes(v2, v1)


def _bruteforce_diff(t, v1, v2):
    """Independent expected-change computation: pandas merge of the two
    visible states on the key, classified by the LWW markers."""
    keys = ["conv_id", "turn_idx"]
    s1 = table_to_pandas(t.read(version=v1, include_internal=True))
    s2 = table_to_pandas(t.read(version=v2, include_internal=True))
    m = s1.merge(s2, on=keys, how="outer", suffixes=("_a", "_b"), indicator=True)
    n_ins = int((m["_merge"] == "right_only").sum())
    n_del = int((m["_merge"] == "left_only").sum())
    both = m[m["_merge"] == "both"]
    changed = both[
        (both["_lsn_applied_a"] != both["_lsn_applied_b"])
        | (both["_ts_applied_a"] != both["_ts_applied_b"])
    ]
    return n_ins, n_del, len(changed)


def test_table_changes_matches_bruteforce(spark, tmp_path, seed_pdf):
    t = _mk(spark, tmp_path, seed_pdf)
    v1 = t.current_version()
    ch = gen_changes_pandas(600, n_convs=N_CONVS, seed=7)
    apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA), batch_id=0)
    apply_changes(
        t,
        spark.createDataFrame(
            gen_changes_pandas(600, n_convs=N_CONVS, seed=8, start_lsn=601),
            CHANGE_SCHEMA,
        ),
        batch_id=1,
    )
    v2 = t.current_version()
    feed = t.table_changes(v1, v2).toPandas()
    n_ins, n_del, n_upd = _bruteforce_diff(t, v1, v2)
    assert (feed["_change_type"] == "insert").sum() == n_ins
    assert (feed["_change_type"] == "delete").sum() == n_del
    assert (feed["_change_type"] == "update_preimage").sum() == n_upd
    assert (feed["_change_type"] == "update_postimage").sum() == n_upd
    # post-images must equal the v2 visible state for those keys
    post = feed[feed["_change_type"] == "update_postimage"]
    s2 = table_to_pandas(t.read(version=v2))
    j = post.merge(s2, on=["conv_id", "turn_idx"], suffixes=("_f", "_s"))
    assert len(j) == len(post)
    assert (j["text_f"].fillna("") == j["text_s"].fillna("")).all()


def test_table_changes_across_mor_compaction(spark, tmp_path, seed_pdf):
    """Compaction rewrites every file but changes no visible row — a diff
    across a compaction-only step must be empty, and a diff spanning
    merges+compaction must equal the merge-only changes."""
    t = _mk(spark, tmp_path, seed_pdf, merge_mode="mor")
    v1 = t.current_version()
    ch = gen_changes_pandas(400, n_convs=N_CONVS, seed=9)
    apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA), batch_id=0)
    v2 = t.current_version()
    feed_before = t.table_changes(v1, v2).toPandas()
    t.compact()
    v3 = t.current_version()
    assert t.table_changes(v2, v3).count() == 0
    feed_spanning = t.table_changes(v1, v3).toPandas()
    a = feed_before.sort_values(["_change_type", "conv_id", "turn_idx"]).reset_index(drop=True)
    b = feed_spanning.sort_values(["_change_type", "conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a.drop(columns=["_from_version", "_to_version"]),
        b.drop(columns=["_from_version", "_to_version"]),
    )


def test_expire_snapshots_retention(spark, tmp_path, seed_pdf):
    t = _mk(spark, tmp_path, seed_pdf)
    for i in range(3):
        ch = gen_changes_pandas(200, n_convs=N_CONVS, seed=20 + i, start_lsn=1 + 200 * i)
        apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA), batch_id=i)
    cur = t.current_version()
    before = table_to_pandas(t.read()).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    stats = t.expire_snapshots(retain_last=2)
    assert stats["n_manifests_deleted"] >= 1
    assert stats["min_retained_version"] == cur - 1
    # current read identical after reclaim
    after = table_to_pandas(t.read()).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)
    # time travel inside the window still works; outside it raises
    t.read(version=cur - 1).count()
    with pytest.raises(FileNotFoundError):
        t.read(version=cur - 2)
    # history stops at the expiry horizon instead of crashing
    hist = t.history()
    assert [m["version"] for m in hist] == [cur - 1, cur]


def test_expire_snapshots_mor_keeps_shared_base_files(spark, tmp_path, seed_pdf):
    """MoR: the current manifest still references base files written by long-
    expired versions; expiry must reference-count, not delete-by-age."""
    t = _mk(spark, tmp_path, seed_pdf, merge_mode="mor")
    for i in range(3):
        ch = gen_changes_pandas(150, n_convs=N_CONVS, seed=30 + i, start_lsn=1 + 150 * i)
        apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA), batch_id=i)
    before = table_to_pandas(t.read()).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    t.expire_snapshots(retain_last=1)
    after = table_to_pandas(t.read()).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)


def test_remove_orphans(spark, tmp_path, seed_pdf):
    import os

    t = _mk(spark, tmp_path, seed_pdf)
    ch = gen_changes_pandas(100, n_convs=N_CONVS, seed=40)
    apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA), batch_id=0)
    # simulate a crashed uncommitted write: files on disk, no manifest ref
    orphan_dir = os.path.join(t.root, "data", "c9999999999", "_bucket=0")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-junk.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")
    before = table_to_pandas(t.read()).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    stats = t.remove_orphans()
    assert stats["n_data_files_deleted"] == 1
    assert not os.path.exists(orphan)
    after = table_to_pandas(t.read()).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)


def test_stats_reports_layout_and_compaction_advice(spark, tmp_path):
    """stats() is manifest-only: correct file/delta accounting before and
    after compaction, and the read-amp recommendation flips accordingly."""
    import numpy as np

    from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
    from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
    from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
    from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas

    t = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=4, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(gen_seed_pandas(n_convs=20, seed=3), TRANSCRIPT_SCHEMA))
    changes = gen_changes_pandas(1600, n_convs=20, seed=3)
    for i, p in enumerate(np.array_split(changes, 8)):
        apply_changes(t, spark.createDataFrame(p, CHANGE_SCHEMA), batch_id=i)

    s = t.stats()
    assert s["mode"] == "mor" and s["num_buckets"] == 4
    assert s["last_batch_id"] == 7 and s["last_lsn"] == 1600
    assert s["n_delta_files"] > 0 and s["delta_depth_max"] >= 8
    assert s["dirty_buckets"] == 4
    assert s["compact_recommended"] is True
    assert s["n_files"] == sum(
        len(fs) for fs in t.manifest()["buckets"].values()
    )

    t.compact()
    s2 = t.stats()
    assert s2["n_delta_files"] == 0 and s2["delta_depth_max"] == 0
    assert s2["compact_recommended"] is False
    # compaction output files carry exact per-file counts; tombstones were
    # dropped by the default compact, so recorded rows == live rows
    assert s2["base_rows_recorded"] == t.read().count()


def test_tags_pin_snapshots_through_expiry(spark, tmp_path):
    """A tag makes its snapshot immune to expire_snapshots + remove_orphans;
    dropping the tag releases it. Tags are immutable names."""
    import os

    import numpy as np
    import pytest

    from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
    from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
    from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
    from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas

    t = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=2, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(gen_seed_pandas(n_convs=12, seed=4), TRANSCRIPT_SCHEMA))
    changes = gen_changes_pandas(600, n_convs=12, seed=4)
    parts = np.array_split(changes, 4)
    apply_changes(t, spark.createDataFrame(parts[0], CHANGE_SCHEMA), batch_id=0)
    v_tag = t.create_tag("training-run-1")
    pinned = sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in t.read_tag("training-run-1").collect()
    )
    v_untagged_old = v_tag  # capture a version BELOW retention later
    for i, p in enumerate(parts[1:], start=1):
        apply_changes(t, spark.createDataFrame(p, CHANGE_SCHEMA), batch_id=i)

    with pytest.raises(ValueError):
        t.create_tag("training-run-1")  # immutable

    t.expire_snapshots(retain_last=1)
    t.remove_orphans()
    # the tagged snapshot survives GC byte-for-byte
    after = sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in t.read_tag("training-run-1").collect()
    )
    assert after == pinned
    # an untagged intermediate version did NOT survive
    assert not os.path.exists(t._manifest_path(v_tag + 1)) or v_tag + 1 == t.current_version()

    t.drop_tag("training-run-1")
    t.expire_snapshots(retain_last=1)
    assert not os.path.exists(t._manifest_path(v_tag))
    with pytest.raises(ValueError):
        t.read_tag("training-run-1")


def test_ingest_rate_report(spark, tmp_path, seed_pdf):
    import numpy as np

    from ccdb_data_pipeline_spark.plans.lineage import ingest_rate_report
    from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas

    t = _mk(spark, tmp_path, seed_pdf, merge_mode="mor")
    changes = gen_changes_pandas(900, n_convs=N_CONVS, seed=13)
    for i, p in enumerate(np.array_split(changes, 3)):
        apply_changes(t, spark.createDataFrame(p, CHANGE_SCHEMA), batch_id=i)
    rep = ingest_rate_report(t)
    assert [r["batch_id"] for r in rep] == [0, 1, 2]
    assert rep[0]["secs_since_prev_commit"] is None
    assert all(r["secs_since_prev_commit"] is not None for r in rep[1:])
    assert rep[-1]["cumulative_events"] == sum(r["n_events"] for r in rep)
    # edge rows aside, counts reconcile with the generated stream sizes
    assert sum(r["n_events"] + r["n_malformed"] for r in rep) == len(changes)
    assert rep[-1]["lsn_max"] == 900
