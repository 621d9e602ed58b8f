"""Inline streaming compaction (start_ingest compact_every): budgeted
maintenance sweeps ride the ingest loop so MoR read amplification stays
bounded on a long-running stream — content never changes, oracle still
matches, and the change feed stays quiet across the sweeps."""

import os

from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import (
    gen_changes_pandas,
    gen_seed_pandas,
    write_segments,
)
from ccdb_data_pipeline_spark.streaming.stream import run_ingest

from tests.oracle import assert_tables_equal, replay, table_to_pandas


def _max_delta_depth(t):
    m = t.manifest()
    return max(
        (sum(1 for e in fs if e.get("delta")) for fs in m["buckets"].values()),
        default=0,
    )


def test_inline_compact_bounds_read_amplification(spark, tmp_path):
    seed = gen_seed_pandas(n_convs=40, seed=11)
    ch = gen_changes_pandas(1600, n_convs=40, seed=11)

    def ingest(compact_every):
        d = os.path.join(str(tmp_path), f"run-{compact_every}")
        binlog = os.path.join(d, "binlog")
        write_segments(ch, binlog, n_segments=8, replay_segment=None)
        t = SnapshotParquetTable(
            spark, os.path.join(d, "t"), TableSpec(num_buckets=8, merge_mode="mor")
        )
        t.create(TRANSCRIPT_SCHEMA)
        bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
        run_ingest(
            spark, binlog, t, os.path.join(d, "ckpt"),
            max_files_per_trigger=1, compact_every=compact_every,
        )
        return t

    plain = ingest(None)
    inline = ingest(2)

    # same final content either way, equal to the oracle replay
    expected = replay(seed, [ch])
    assert_tables_equal(table_to_pandas(plain.read()), expected)
    assert_tables_equal(table_to_pandas(inline.read()), expected)

    # the sweeps actually ran (compact ops in the history)...
    ops = [m.get("summary", {}).get("op") for m in inline.history()]
    assert ops.count("compact") >= 3
    # ...and they bound delta stacking: without maintenance the deepest
    # bucket accumulates one layer per batch; with it, at most
    # compact_every un-swept layers remain
    assert _max_delta_depth(plain) >= 6
    assert _max_delta_depth(inline) <= 2


def test_inline_compact_keeps_change_feed_quiet(spark, tmp_path):
    """table_changes across an inline-compacted window reports only the
    real row changes (compaction carry-overs are suppressed)."""
    seed = gen_seed_pandas(n_convs=20, seed=4)
    ch = gen_changes_pandas(400, n_convs=20, seed=4)
    binlog = os.path.join(str(tmp_path), "binlog")
    write_segments(ch, binlog, n_segments=4, replay_segment=None)
    t = SnapshotParquetTable(
        spark, os.path.join(str(tmp_path), "t"), TableSpec(num_buckets=8, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    v0 = t.current_version()
    run_ingest(
        spark, binlog, t, os.path.join(str(tmp_path), "ckpt"),
        max_files_per_trigger=1, compact_every=1, compact_budget=4,
    )
    feed = t.table_changes(v0, t.current_version())
    # every change in the feed is a genuine insert/update/delete of a key
    # the stream touched — LWW winners match a direct diff of the snapshots
    post = {
        (r["conv_id"], r["turn_idx"])
        for r in feed.select("conv_id", "turn_idx").distinct().collect()
    }
    touched = {
        (c, int(ti))
        for c, ti in ch[ch.conv_id.notna()][["conv_id", "turn_idx"]].itertuples(
            index=False
        )
    }
    assert post <= touched


def test_inline_maintain_runs_full_service_loop(spark, tmp_path):
    """start_ingest(maintain_every=...) — the full condition-driven
    service loop rides the stream: compaction bounds read amplification
    AND snapshot expiry bounds metadata growth, with the final content
    still equal to the sequential replay oracle."""
    import os

    from ccdb_data_pipeline_spark.plans.maintenance import MaintenancePolicy

    seed = gen_seed_pandas(n_convs=30, seed=13)
    ch = gen_changes_pandas(1200, n_convs=30, seed=13)
    binlog = os.path.join(str(tmp_path), "binlog")
    write_segments(ch, binlog, n_segments=6, replay_segment=None)
    t = SnapshotParquetTable(
        spark, os.path.join(str(tmp_path), "t"), TableSpec(num_buckets=8, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    pol = MaintenancePolicy(
        max_delta_depth=1, max_dirty_buckets=1,
        retain_snapshots=2, expire_slack=0, compact_budget_buckets=None,
    )
    run_ingest(
        spark, binlog, t, os.path.join(str(tmp_path), "ckpt"),
        max_files_per_trigger=1, maintain_every=2, maintain_policy=pol,
    )
    assert_tables_equal(table_to_pandas(t.read()), replay(seed, [ch]))
    ops = [m.get("summary", {}).get("op") for m in t.history()]
    assert "compact" in ops
    # expiry kept the manifest count bounded (6 merges + 3 service sweeps
    # would otherwise retain ~10 manifests)
    mdir = os.path.join(t.root, "manifests")
    n_manifests = sum(1 for f in os.listdir(mdir) if f.endswith(".json"))
    assert n_manifests <= 6


def test_mid_stream_maintenance_delete_never_swallows_a_batch(spark, tmp_path):
    """The collision the maintenance id space exists to prevent: a cdc-mode
    TTL sweep (tombstone events through apply_changes) firing between
    micro-batches must not consume the stream's next epoch id — every
    stream batch still applies and the ledger stays gapless."""
    import datetime as dt

    from ccdb_data_pipeline_spark.plans.lineage import lineage_rows
    from ccdb_data_pipeline_spark.plans.maintenance import MaintenancePolicy

    seed = gen_seed_pandas(n_convs=30, seed=21)
    ch = gen_changes_pandas(1200, n_convs=30, seed=21)
    binlog = os.path.join(str(tmp_path), "binlog")
    write_segments(ch, binlog, n_segments=6, replay_segment=None)
    t = SnapshotParquetTable(
        spark, os.path.join(str(tmp_path), "t"),
        TableSpec(num_buckets=8, merge_mode="mor", stats_cols=("ts",)),
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    # cutoff far in the future: EVERY maintain round finds expired rows and
    # commits a tombstone batch — the worst case for id collisions
    pol = MaintenancePolicy(
        max_delta_depth=99, max_dirty_buckets=9999, retain_snapshots=50,
        ttl_column="ts", ttl_max_age=dt.timedelta(days=1),
        ttl_now=dt.datetime(2035, 1, 1), ttl_mode="cdc",
    )
    run_ingest(
        spark, binlog, t, os.path.join(str(tmp_path), "ckpt"),
        max_files_per_trigger=1, maintain_every=1, maintain_policy=pol,
    )
    # every stream batch applied: the ledger is gapless over all 6 epochs
    # and covers the full LSN range
    rows = lineage_rows(t)
    assert [r["batch_id"] for r in rows] == list(range(6))
    assert min(r["lsn_min"] for r in rows) == 1
    assert max(r["lsn_max"] for r in rows) == len(ch)
    # final state: the replay oracle minus everything the TTL aged out
    # (null event times are retained)
    exp = replay(seed, [ch])
    exp = exp[exp["ts"].isna()].reset_index(drop=True)
    assert_tables_equal(table_to_pandas(t.read()), exp)


def test_service_sweeps_keep_tombstones_under_segment_replay(spark, tmp_path):
    """A maintenance sweep landing between a delete and its segment's
    REPLAY must not reclaim the tombstone — the replayed (lower-dominance)
    event would resurrect the deleted key. Pins auto_maintain's
    compact_drop_tombstones=False default under the worst cadence
    (maintain after every batch, declared-policy-driven) with a replayed
    segment in the stream."""
    from ccdb_data_pipeline_spark.plans.maintenance import (
        MaintenancePolicy,
        set_table_policy,
    )

    seed = gen_seed_pandas(n_convs=50, seed=42)
    ch = gen_changes_pandas(2000, n_convs=50, seed=42)
    binlog = os.path.join(str(tmp_path), "binlog")
    write_segments(ch, binlog, n_segments=8, replay_segment=2)  # segment replayed
    t = SnapshotParquetTable(
        spark, os.path.join(str(tmp_path), "t"),
        TableSpec(num_buckets=8, merge_mode="mor"),
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    set_table_policy(t, MaintenancePolicy(
        max_delta_depth=1, max_dirty_buckets=1, retain_snapshots=50,
    ))
    run_ingest(
        spark, binlog, t, os.path.join(str(tmp_path), "ckpt"),
        max_files_per_trigger=2, maintain_every=1,  # policy-less: declared drives it
    )
    ops = [m.get("summary", {}).get("op") for m in t.history()]
    assert ops.count("compact") >= 3  # the declared policy really ran
    assert t.read().filter("conv_id = 'conv-edge'").count() == 0  # no resurrection
    assert_tables_equal(table_to_pandas(t.read()), replay(seed, [ch]))
