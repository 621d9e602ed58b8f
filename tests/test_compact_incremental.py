"""Incremental compaction (plans/lake.py compact(only_dirty=True), the
default): only buckets holding delta layers or multiple files are
rewritten; clean buckets' file entries carry into the new manifest
untouched, table content is bit-stable, and a compact with nothing to do
commits no snapshot."""

import numpy as np
import pandas as pd

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas
from tests.oracle import assert_tables_equal, table_to_pandas

N_CONVS = 60


def _mk(spark, tmp_path):
    t = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=8, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(
        t, spark.createDataFrame(gen_seed_pandas(n_convs=N_CONVS, seed=9), TRANSCRIPT_SCHEMA)
    )
    return t


def _narrow_changes() -> pd.DataFrame:
    """A change batch touching only a few conversations (few buckets)."""
    ch = gen_changes_pandas(1500, n_convs=N_CONVS, seed=9)
    keep = sorted(c for c in ch["conv_id"].unique() if c is not None)[:3]
    return ch[ch["conv_id"].isin(keep)].reset_index(drop=True)


def test_incremental_compact_rewrites_only_dirty_buckets(spark, tmp_path):
    t = _mk(spark, tmp_path)
    ch = _narrow_changes()
    apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA), batch_id=0)

    m0 = t.manifest()
    dirty0 = {
        b for b, fs in m0["buckets"].items()
        if any(e.get("delta") for e in fs) or len(fs) > 1
    }
    clean0 = {b: fs for b, fs in m0["buckets"].items() if b not in dirty0}
    assert dirty0 and clean0, "need both dirty and clean buckets for the test"
    before = table_to_pandas(t.read())

    t.compact()  # only_dirty=True default
    m1 = t.manifest()
    assert m1["summary"]["op"] == "compact"
    assert m1["summary"]["n_buckets_rewritten"] == len(dirty0)
    assert m1["summary"]["n_buckets_carried"] == len(clean0)
    # clean buckets: file entries carried verbatim (no rewrite happened)
    for b, fs in clean0.items():
        assert m1["buckets"][b] == fs
    # dirty buckets: folded — no delta layers remain anywhere
    assert not any(e.get("delta") for fs in m1["buckets"].values() for e in fs)
    # content is unchanged by compaction
    assert_tables_equal(table_to_pandas(t.read()), before)


def test_compact_is_noop_when_nothing_dirty(spark, tmp_path):
    t = _mk(spark, tmp_path)
    ch = _narrow_changes()
    apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA), batch_id=0)
    t.compact()
    v = t.current_version()
    t.compact()  # everything clean now -> no new snapshot
    assert t.current_version() == v


def test_full_compact_still_available(spark, tmp_path):
    t = _mk(spark, tmp_path)
    ch = _narrow_changes()
    apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA), batch_id=0)
    before = table_to_pandas(t.read())
    t.compact(only_dirty=False)
    m = t.manifest()
    assert m["summary"]["n_buckets_carried"] == 0
    assert_tables_equal(table_to_pandas(t.read()), before)


def test_targeted_compact_respects_bucket_list(spark, tmp_path):
    t = _mk(spark, tmp_path)
    ch = _narrow_changes()
    apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA), batch_id=0)
    m0 = t.manifest()
    dirty0 = sorted(
        int(b) for b, fs in m0["buckets"].items()
        if any(e.get("delta") for e in fs) or len(fs) > 1
    )
    pick, rest = dirty0[:1], dirty0[1:]
    t.compact(buckets=pick)
    m1 = t.manifest()
    assert not any(e.get("delta") for e in m1["buckets"][str(pick[0])])
    for b in rest:  # unpicked dirty buckets untouched
        assert m1["buckets"][str(b)] == m0["buckets"][str(b)]


def test_change_feed_quiet_across_incremental_compact(spark, tmp_path):
    """A compaction commit changes no logical rows: the change feed across
    the compact window must be empty — and with incremental compaction the
    diff scan only opens the rewritten buckets, not the whole table."""
    t = _mk(spark, tmp_path)
    ch = _narrow_changes()
    apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA), batch_id=0)
    v_before = t.current_version()
    t.compact()
    assert t.table_changes(v_before, t.current_version()).count() == 0


def test_budgeted_compact_converges(spark, tmp_path):
    """IO-budgeted maintenance (compact(max_buckets=k)): each run rewrites
    only the k dirtiest buckets (most delta layers first), carries the rest
    verbatim, never changes content — and repeated budgeted runs converge to
    a fully clean table (each sweep picks the next-dirtiest set)."""
    t = _mk(spark, tmp_path)
    ch = gen_changes_pandas(3000, n_convs=N_CONVS, seed=11)
    apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA), batch_id=0)
    # second batch deepens some buckets' delta stacks unevenly
    ch2 = _narrow_changes()
    apply_changes(t, spark.createDataFrame(ch2, CHANGE_SCHEMA), batch_id=1)

    def dirty(m):
        return {
            b: fs for b, fs in m["buckets"].items()
            if any(e.get("delta") for e in fs) or len(fs) > 1
        }

    m0 = t.manifest()
    d0 = dirty(m0)
    assert len(d0) > 2, "need >2 dirty buckets to exercise the budget"
    before = table_to_pandas(t.read())

    k = 2
    t.compact(max_buckets=k)
    m1 = t.manifest()
    assert m1["summary"]["op"] == "compact"
    assert m1["summary"]["n_buckets_rewritten"] == k
    # the rewritten pair is the dirtiest by (delta layers, file count)
    def depth(fs):
        return (sum(1 for e in fs if e.get("delta")), len(fs))
    rewritten = {b for b in d0 if m1["buckets"][b] != m0["buckets"][b]}
    assert len(rewritten) == k
    floor = min(depth(d0[b]) for b in rewritten)
    for b, fs in d0.items():
        if b not in rewritten:
            assert depth(fs) <= floor
    # unpicked buckets (dirty or clean) carried verbatim
    for b, fs in m0["buckets"].items():
        if b not in rewritten:
            assert m1["buckets"][b] == fs
    assert_tables_equal(table_to_pandas(t.read()), before)

    # repeated budgeted sweeps converge to fully clean
    for _ in range(16):
        if not dirty(t.manifest()):
            break
        t.compact(max_buckets=k)
    assert not dirty(t.manifest())
    assert_tables_equal(table_to_pandas(t.read()), before)


def test_budget_larger_than_dirty_set_is_plain_incremental(spark, tmp_path):
    t = _mk(spark, tmp_path)
    apply_changes(
        t, spark.createDataFrame(_narrow_changes(), CHANGE_SCHEMA), batch_id=0
    )
    m0 = t.manifest()
    n_dirty = sum(
        1 for fs in m0["buckets"].values()
        if any(e.get("delta") for e in fs) or len(fs) > 1
    )
    t.compact(max_buckets=1000)
    m1 = t.manifest()
    assert m1["summary"]["n_buckets_rewritten"] == n_dirty
    assert not any(e.get("delta") for fs in m1["buckets"].values() for e in fs)
