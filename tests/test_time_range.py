"""Manifest-level event-time pruning: per-file ts min/max recorded by the
footer scan, read(time_range=...) correctness vs a plain filter, and the
prune actually skipping files (all-base buckets file-level, delta buckets
all-or-nothing)."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas

UTC = dt.timezone.utc


def _mk(spark, tmp_path, mode="cow"):
    t = SnapshotParquetTable(
        spark, str(tmp_path / f"t-{mode}"), TableSpec(num_buckets=4, merge_mode=mode)
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(
        t, spark.createDataFrame(gen_seed_pandas(n_convs=30, seed=11), TRANSCRIPT_SCHEMA)
    )
    return t


def _capture_reads(t):
    """Wrap _read_files to record how many file entries each read touches."""
    seen = []
    orig = t._read_files

    def wrapper(entries, m):
        seen.append(len(entries))
        return orig(entries, m)

    t._read_files = wrapper
    return seen


def test_ts_stats_recorded(spark, tmp_path):
    t = _mk(spark, tmp_path)
    m = t.manifest()
    entries = [e for fs in m["buckets"].values() for e in fs]
    assert entries
    for e in entries:
        assert isinstance(e["ts_min"], int) and isinstance(e["ts_max"], int)
        assert e["ts_min"] <= e["ts_max"]


def test_time_range_equals_plain_filter(spark, tmp_path):
    t = _mk(spark, tmp_path, mode="mor")
    ch = spark.createDataFrame(
        gen_changes_pandas(800, n_convs=30, seed=11), CHANGE_SCHEMA
    )
    apply_changes(t, ch, batch_id=1)
    full = t.read()
    # actual 25th/75th percentile timestamps: a guaranteed non-empty window
    ts_sorted = sorted(r[0] for r in full.select("ts").collect() if r[0] is not None)
    wlo = ts_sorted[len(ts_sorted) // 4]
    whi = ts_sorted[3 * len(ts_sorted) // 4]
    expected = sorted(
        tuple(r)
        for r in full.filter((F.col("ts") >= wlo) & (F.col("ts") <= whi))
        .select("conv_id", "turn_idx", "text")
        .collect()
    )
    got = sorted(
        tuple(r)
        for r in t.read_time_range(wlo, whi)
        .select("conv_id", "turn_idx", "text")
        .collect()
    )
    assert got == expected and got  # non-trivial window


def test_out_of_range_window_reads_zero_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.compact(only_dirty=False)
    seen = _capture_reads(t)
    out = t.read_time_range(
        dt.datetime(2030, 1, 1, tzinfo=UTC), dt.datetime(2030, 2, 1, tzinfo=UTC)
    )
    assert out.count() == 0
    assert sum(seen) == 0  # the manifest prune left nothing to scan


def test_base_files_prune_individually_delta_buckets_all_or_nothing(spark, tmp_path):
    """Two eras far apart: after compaction the old era's files are skipped
    for a new-era window; fresh delta layers keep their bucket whole."""
    spec = TableSpec(num_buckets=16, merge_mode="mor")
    t = SnapshotParquetTable(spark, str(tmp_path / "eras"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    seed = gen_seed_pandas(n_convs=20, seed=3)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    t.compact(only_dirty=False)

    # era 2: updates a year later, to a FEW conversations only, as MoR
    # deltas — most buckets stay clean (base-only)
    ch = gen_changes_pandas(200, n_convs=20, seed=3)
    touched = sorted(ch.conv_id.unique())[:3]
    ch = ch[(ch.op != "D") & ch.conv_id.isin(touched)].copy()
    ch["ts"] = ch["ts"] + pd.Timedelta(days=365)
    apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA), batch_id=1)

    m = t.manifest()
    n_total = sum(len(fs) for fs in m["buckets"].values())
    dirty_files = sum(
        len(fs) for fs in m["buckets"].values() if any(e.get("delta") for e in fs)
    )
    assert 0 < dirty_files < n_total  # both kinds of bucket exist

    era2_lo = ch["ts"].min() - pd.Timedelta(days=1)
    era2_hi = ch["ts"].max() + pd.Timedelta(days=1)
    seen = _capture_reads(t)
    got = t.read_time_range(era2_lo.to_pydatetime(), era2_hi.to_pydatetime())
    n_rows = got.count()
    assert n_rows > 0
    # only the dirty buckets' layers are touched; era-1 base files of clean
    # buckets are pruned at the manifest level
    assert sum(seen) == dirty_files
    # correctness: equals the plain filter over a full read
    full = t.read().filter(
        (F.col("ts") >= era2_lo.to_pydatetime()) & (F.col("ts") <= era2_hi.to_pydatetime())
    )
    assert n_rows == full.count()
