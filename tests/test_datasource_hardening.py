"""Hardening regressions for the DataSource facade (plans/datasource.py):

1. Pushed timestamp literals arrive as tz-NAIVE datetimes in the machine's
   LOCAL timezone (TimestampType.fromInternal) — pruning bounds must invert
   that exactly, or non-UTC hosts prune files that hold matching rows.
2. Change-feed reads must replay schema rename/drop events relative to each
   FILE's schema era (after_sid=0 mis-read post-evolution files whose
   column names were reused).
3. A change feed whose parent chain crosses an expired snapshot must raise
   (ChangeFeedGapError), never silently serve a truncated suffix.
4. The facade refuses tables whose manifest predates the 'engine' block
   (first-row is file-schema-identical to LWW — sniffing cannot prove
   plain LWW), and any engine commit backfills the block.
"""

import datetime as dt
import json
import os
import time as _time

import pytest
from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.datasource import (
    ChangeFeedGapError,
    ChangesBatchReader,
    LakeReader,
    LakeWriter,
    _change_file_partitions,
    _ts_bounds_us,
    register,
)
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas

T0 = dt.datetime(2025, 1, 1)


def _mk(spark, tmp_path, n_batches=2, name="table", **spec_kw):
    spec = TableSpec(num_buckets=4, merge_mode="mor", **spec_kw)
    t = SnapshotParquetTable(spark, str(tmp_path / name), spec)
    t.create(TRANSCRIPT_SCHEMA)
    seed = gen_seed_pandas(n_convs=20, seed=3)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    changes = gen_changes_pandas(400, n_convs=20, seed=3)
    import numpy as np

    for i, p in enumerate(np.array_split(changes, n_batches)):
        apply_changes(t, spark.createDataFrame(p, CHANGE_SCHEMA), batch_id=i)
    return t


def _batch(spark, rows):
    """rows: (lsn, op, conv, turn, text, tool, ts_minutes)"""
    data = [
        (lsn, op, conv, turn, "user", text, tool, T0 + dt.timedelta(minutes=m))
        for (lsn, op, conv, turn, text, tool, m) in rows
    ]
    return spark.createDataFrame(data, CHANGE_SCHEMA)


# ----------------------------------------------------- 1. tz-naive ts bounds


def _with_tz(tz):
    old = os.environ.get("TZ")
    os.environ["TZ"] = tz
    _time.tzset()
    return old


def _restore_tz(old):
    if old is None:
        os.environ.pop("TZ", None)
    else:
        os.environ["TZ"] = old
    _time.tzset()


@pytest.mark.parametrize("tz", ["America/New_York", "Asia/Tokyo", "UTC"])
def test_ts_bounds_invert_fromInternal_exactly(tz):
    """fromtimestamp -> _ts_bounds_us must round-trip to the exact micros on
    ANY host timezone (the old code treated naive values as UTC and shifted
    bounds by the UTC offset, pruning files that held matching rows)."""
    old = _with_tz(tz)
    try:
        for epoch_us in (1_700_000_000_000_000, 0, 1_735_689_600_123_456):
            naive = dt.datetime.fromtimestamp(epoch_us / 1e6)  # fromInternal's shape
            lo, hi = _ts_bounds_us(
                [GreaterThanOrEqual(("ts",), naive), LessThan(("ts",), naive)]
            )
            assert lo == epoch_us, (tz, epoch_us)
            assert hi == epoch_us, (tz, epoch_us)
        # tz-aware values (defensive: not what Spark sends) also exact
        aware = dt.datetime.fromtimestamp(1_700_000_000, tz=dt.timezone.utc)
        lo, _ = _ts_bounds_us([GreaterThanOrEqual(("ts",), aware)])
        assert lo == 1_700_000_000_000_000
    finally:
        _restore_tz(old)


def test_pushdown_prunes_correctly_on_nonutc_host(spark, tmp_path):
    """End-to-end: a ts predicate through the facade returns the same rows
    as the engine read even when the host TZ is shifted 9h from UTC."""
    t = _mk(spark, tmp_path)
    register(spark)
    old = _with_tz("Asia/Tokyo")
    try:
        cut = T0 + dt.timedelta(minutes=30)
        facade = (
            spark.read.format("transcript_lake")
            .load(t.root)
            .filter(f"ts >= timestamp'{cut.isoformat(sep=' ')}'")
        )
        engine = t.read().filter(f"ts >= timestamp'{cut.isoformat(sep=' ')}'")
        assert facade.count() == engine.count()
    finally:
        _restore_tz(old)


# ------------------------------------------- 2. change feed honors schema era


def test_change_feed_respects_file_schema_era(spark, tmp_path):
    """Strict-mode rename + literal-name reuse: the post-evolution change
    file stores the re-added 'tool' field; replaying the rename onto it
    (after_sid=0) either crashes on duplicate names or nulls the value."""
    t = _mk(spark, tmp_path, n_batches=1, remap_renamed_columns=False)
    t.rename_column("tool", "tool_name")
    t.merge_events(
        _batch(spark, [(10_000_000, "I", "zz-conv", 0, "post-evolution", "sed", 99)]),
        batch_id=1,
    )
    register(spark)
    feed = (
        spark.read.format("transcript_changes")
        .option("startingVersion", 0)
        .load(t.root)
    )
    row = feed.filter("conv_id = 'zz-conv'").collect()
    assert len(row) == 1
    assert row[0]["tool"] == "sed"  # re-added literal field survives
    assert row[0]["tool_name"] is None  # renamed field distinct from it
    # pre-evolution rows still serve the renamed column
    pre = feed.filter("conv_id <> 'zz-conv' AND tool_name IS NOT NULL")
    assert pre.count() > 0
    assert pre.filter("tool IS NOT NULL").count() == 0


# ----------------------------------------------- 3. expired-history gap error


def test_change_feed_gap_raises_after_expire(spark, tmp_path):
    t = _mk(spark, tmp_path, n_batches=4)
    head = t.current_version()
    stats = t.expire_snapshots(retain_last=2)
    assert stats["n_manifests_deleted"] > 0
    # full-history replay crosses the expired boundary -> hard error
    with pytest.raises(ChangeFeedGapError, match="expire"):
        _change_file_partitions(t.root, 0, head)
    with pytest.raises(ChangeFeedGapError):
        ChangesBatchReader({"path": t.root, "startingversion": "0"}).partitions()
    # a resume from WITHIN the retained window still serves
    parts = _change_file_partitions(t.root, head - 1, head)
    assert parts, "retained suffix still readable"


# ------------------------------------------ 4. engine-block refusal/backfill


def _strip_engine_block(root):
    with open(os.path.join(root, "HEAD")) as f:
        v = int(f.read().strip())
    p = os.path.join(root, "manifests", f"m-{v:010d}.json")
    with open(p) as f:
        m = json.load(f)
    m.pop("engine", None)
    m.pop("normalize", None)
    with open(p, "w") as f:
        json.dump(m, f)


def test_facade_refuses_preflag_manifest_and_commit_backfills(spark, tmp_path):
    t = _mk(spark, tmp_path, n_batches=1)
    _strip_engine_block(t.root)
    with pytest.raises(ValueError, match="engine"):
        LakeReader({"path": t.root})
    with pytest.raises(ValueError, match="engine"):
        LakeWriter({"path": t.root, "batchid": "99"}, overwrite=False)
    # ANY engine commit backfills the flag (fresh handle, legacy manifest)
    t2 = SnapshotParquetTable(
        spark, t.root, TableSpec(num_buckets=4, merge_mode="mor")
    )
    t2.merge_events(
        _batch(spark, [(20_000_000, "I", "bf-conv", 0, "backfill", None, 5)]),
        batch_id=50,
    )
    assert "engine" in t2.manifest()
    r = LakeReader({"path": t.root})  # now served
    assert r.meta.has_engine_flag
