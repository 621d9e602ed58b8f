"""Generic manifest-level column-stats file skipping (Iceberg column-metrics
analog, generalized beyond event time): TableSpec.stats_cols declares payload
columns whose per-file min/max the footer scan records; read(where=...) and
the DataSource pushed-filter path skip whole files on any of them before any
data byte is opened. Correctness = always equals the plain filter; the prune
assertions use the same _read_files capture as test_time_range."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.datasource import LakeReader, register
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable, _file_may_match
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas

STATS = ("role", "tool")


def _mk(spark, tmp_path, mode="mor", name="t", **kw):
    t = SnapshotParquetTable(
        spark,
        str(tmp_path / name),
        TableSpec(num_buckets=4, merge_mode=mode, stats_cols=STATS, **kw),
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(
        t, spark.createDataFrame(gen_seed_pandas(n_convs=30, seed=7), TRANSCRIPT_SCHEMA)
    )
    return t


def _capture_reads(t):
    seen = []
    orig = t._read_files

    def wrapper(entries, m):
        seen.append(len(entries))
        return orig(entries, m)

    t._read_files = wrapper
    return seen


def test_stats_recorded_for_declared_cols(spark, tmp_path):
    t = _mk(spark, tmp_path)
    entries = [e for fs in t.manifest()["buckets"].values() for e in fs]
    assert entries
    for e in entries:
        st = e.get("stats", {})
        assert "role" in st and st["role"][0] <= st["role"][1]
    assert t.manifest()["stats_cols"] == list(STATS)


def test_file_may_match_ops():
    e = {"stats": {"x": [10, 20], "s": ["bb", "dd"]}}
    assert _file_may_match(e, [("x", ">=", 15)])
    assert not _file_may_match(e, [("x", ">", 20)])
    assert not _file_may_match(e, [("x", "<", 10)])
    assert _file_may_match(e, [("x", "<=", 10)])
    assert not _file_may_match(e, [("x", "=", 9)])
    assert _file_may_match(e, [("x", "=", 10)])
    assert not _file_may_match(e, [("x", "in", (1, 2, 30))])
    assert _file_may_match(e, [("x", "in", (1, 12))])
    assert not _file_may_match(e, [("s", "=", "zz")])
    assert _file_may_match(e, [("s", "=", "cc")])
    # undeclared column / missing stats / incomparable probe: conservative
    assert _file_may_match(e, [("y", "=", 5)])
    assert _file_may_match({}, [("x", "=", 5)])
    assert _file_may_match(e, [("x", "=", "not-a-number")])
    # NULL in-list members match no row: skipped, not conservative —
    # the non-null members alone decide, and all-null lists prune outright
    assert not _file_may_match(e, [("x", "in", (None, 1, 30))])
    assert _file_may_match(e, [("x", "in", (None, 12))])
    assert not _file_may_match(e, [("x", "in", (None,))])


def test_where_equals_plain_filter(spark, tmp_path):
    t = _mk(spark, tmp_path)
    ch = spark.createDataFrame(gen_changes_pandas(600, n_convs=30, seed=7), CHANGE_SCHEMA)
    apply_changes(t, ch, batch_id=1)
    full = t.read()
    for preds, cond in [
        ([("role", "=", "user")], F.col("role") == "user"),
        ([("role", ">=", "t")], F.col("role") >= "t"),
        ([("role", "in", ("user", "tool"))], F.col("role").isin("user", "tool")),
        (
            [("role", "=", "user"), ("turn_idx", "<", 5)],
            (F.col("role") == "user") & (F.col("turn_idx") < 5),
        ),
    ]:
        got = sorted(map(tuple, t.read(where=preds).collect()))
        want = sorted(map(tuple, full.filter(cond).collect()))
        assert got == want and got, preds


def test_where_validates_inputs(spark, tmp_path):
    t = _mk(spark, tmp_path, name="val")
    with pytest.raises(ValueError, match="unknown column"):
        t.read(where=[("nope", "=", 1)])
    with pytest.raises(ValueError, match="op"):
        t.read(where=[("role", "~", 1)])


def test_impossible_predicate_reads_zero_files(spark, tmp_path):
    t = _mk(spark, tmp_path, name="zero")
    t.compact(only_dirty=False)
    seen = _capture_reads(t)
    assert t.read(where=[("role", "=", "zzzz-no-such-role")]).count() == 0
    assert sum(seen) == 0


def test_base_files_prune_individually_delta_all_or_nothing(spark, tmp_path):
    """Seeded roles never start with 'z'; a later delta writes role='ztool'
    to a few conversations. where role='ztool' must touch only the dirty
    buckets' layers — clean buckets' base files prune at the manifest."""
    t = _mk(spark, tmp_path, name="eras", mode="mor")
    t.compact(only_dirty=False)
    ch = gen_changes_pandas(200, n_convs=30, seed=7)
    touched = sorted(ch.conv_id.unique())[:3]
    ch = ch[(ch.op != "D") & ch.conv_id.isin(touched)].copy()
    ch["role"] = "ztool"
    apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA), batch_id=1)

    m = t.manifest()
    n_total = sum(len(fs) for fs in m["buckets"].values())
    dirty_files = sum(
        len(fs) for fs in m["buckets"].values() if any(e.get("delta") for e in fs)
    )
    assert 0 < dirty_files < n_total

    seen = _capture_reads(t)
    got = t.read(where=[("role", "=", "ztool")])
    n = got.count()
    assert n > 0
    assert sum(seen) == dirty_files
    assert n == t.read().filter("role = 'ztool'").count()


def test_where_composes_with_columns_and_time_range(spark, tmp_path):
    t = _mk(spark, tmp_path, name="comp")
    out = t.read(where=[("role", "=", "user")], columns=["text"])
    assert out.columns == ["text"]
    full = t.read()
    assert out.count() == full.filter("role = 'user'").count()
    ts = sorted(r[0] for r in full.select("ts").collect() if r[0] is not None)
    lo, hi = ts[len(ts) // 4], ts[3 * len(ts) // 4]
    got = t.read(where=[("role", "=", "user")], time_range=(lo, hi)).count()
    want = full.filter(
        (F.col("role") == "user") & (F.col("ts") >= lo) & (F.col("ts") <= hi)
    ).count()
    assert got == want


def test_facade_pushed_filter_prunes_files(spark, tmp_path):
    t = _mk(spark, tmp_path, name="facade")
    t.compact(only_dirty=False)
    # planner-level: an impossible pushed equality leaves nothing to scan
    r = LakeReader({"path": t.root})
    r.pushFilters([EqualTo(("role",), "zzzz-no-such-role")])
    parts = r.partitions()
    assert len(parts) == 1 and not parts[0].entries
    # a satisfiable pushed range keeps entries and stays correct end-to-end
    r2 = LakeReader({"path": t.root})
    r2.pushFilters([GreaterThan(("turn_idx",), -1)])
    assert sum(len(p.entries) for p in r2.partitions()) > 0
    register(spark)
    got = (
        spark.read.format("transcript_lake")
        .load(t.root)
        .filter("role = 'user'")
        .count()
    )
    assert got == t.read().filter("role = 'user'").count()


def test_facade_writer_records_declared_stats(spark, tmp_path):
    t = _mk(spark, tmp_path, name="fwrite", mode="mor")
    register(spark)
    ev = spark.createDataFrame(
        gen_changes_pandas(100, n_convs=30, seed=9), CHANGE_SCHEMA
    )
    (
        ev.write.format("transcript_lake")
        .mode("append")
        .option("batchId", "7")
        .save(t.root)
    )
    t._manifest = None  # facade committed externally; drop the handle cache
    m = t.manifest()
    delta_entries = [
        e for fs in m["buckets"].values() for e in fs if e.get("delta")
    ]
    assert delta_entries
    assert any("stats" in e and "role" in e["stats"] for e in delta_entries)


def test_fresh_default_spec_handle_keeps_recording_stats(spark, tmp_path):
    """stats_cols is a TABLE property (manifest-authoritative), not a
    handle property: a maintenance/CLI handle built with a default
    TableSpec must keep recording the declared per-file stats when it
    rewrites files — otherwise one `compact` from such a handle silently
    sheds the table's pruning and TTL-trigger coverage."""
    t = _mk(spark, tmp_path)
    ch = gen_changes_pandas(200, n_convs=30, seed=7)
    apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA), batch_id=1)

    fresh = SnapshotParquetTable(spark, t.root)  # default spec: stats_cols=()
    assert fresh._stats_cols() == STATS
    fresh.compact(only_dirty=False)

    m = fresh.manifest()
    entries = [e for fs in m["buckets"].values() for e in fs]
    assert entries, "compaction left no files"
    for e in entries:
        st = e.get("stats") or {}
        assert set(STATS) <= set(st), f"rewritten file lost stats: {e['path']}"
