"""Autonomous table services (plans/maintenance.py auto_maintain): the
condition-driven policy loop over compact / expire_snapshots /
remove_orphans. Core claims: decisions come from the manifest alone, a
dirty table gets serviced, table content is bit-stable across a full
maintenance pass, and the immediately-following call is an all-skip
no-op with reasons."""

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.plans.maintenance import (
    MaintenancePolicy,
    auto_maintain,
)
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas
from tests.oracle import assert_tables_equal, table_to_pandas

N_CONVS = 40


def _dirty_table(spark, tmp_path, n_batches=4):
    t = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=8, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(
        t,
        spark.createDataFrame(gen_seed_pandas(n_convs=N_CONVS, seed=5), TRANSCRIPT_SCHEMA),
    )
    ch = gen_changes_pandas(n_batches * 400, n_convs=N_CONVS, seed=5)
    per = len(ch) // n_batches
    for b in range(n_batches):
        batch = ch.iloc[b * per : (b + 1) * per].reset_index(drop=True)
        apply_changes(t, spark.createDataFrame(batch, CHANGE_SCHEMA), batch_id=b)
    return t


POLICY = MaintenancePolicy(
    max_delta_depth=2, max_dirty_buckets=4, retain_snapshots=2, expire_slack=0
)


def test_auto_maintain_services_dirty_table_and_converges(spark, tmp_path):
    t = _dirty_table(spark, tmp_path)
    before = table_to_pandas(t.read())
    s0 = t.stats()
    assert s0["delta_depth_max"] >= POLICY.max_delta_depth

    r = auto_maintain(t, POLICY)
    assert r["actions"]["compact"]["run"]
    assert "delta_depth_max" in r["actions"]["compact"]["reason"]
    assert r["actions"]["compact"]["delta_depth_max_after"] == 0
    assert r["actions"]["expire_snapshots"]["run"]
    assert r["actions"]["remove_orphans"]["run"]
    assert r["version_after"] > r["version_before"]
    # content bit-stable through the full service pass
    assert_tables_equal(table_to_pandas(t.read()), before)

    # the very next call is an all-skip no-op, each skip with a reason
    r2 = auto_maintain(t, POLICY)
    for name, act in r2["actions"].items():
        assert not act["run"], (name, act)
        assert act["reason"]
    assert r2["version_after"] == r2["version_before"]


def test_auto_maintain_dry_run_plans_without_executing(spark, tmp_path):
    t = _dirty_table(spark, tmp_path)
    v0 = t.stats()["version"]
    r = auto_maintain(t, POLICY, dry_run=True)
    assert r["dry_run"] and r["actions"]["compact"]["run"]
    assert t.stats()["version"] == v0  # nothing committed
    assert t.stats()["delta_depth_max"] >= POLICY.max_delta_depth  # still dirty


def test_auto_maintain_respects_compaction_budget(spark, tmp_path):
    t = _dirty_table(spark, tmp_path)
    dirty0 = t.stats()["dirty_buckets"]
    assert dirty0 > 1
    pol = MaintenancePolicy(
        max_delta_depth=1,
        max_dirty_buckets=1,
        compact_budget_buckets=1,
        retain_snapshots=50,  # keep expiry out of this test
    )
    r = auto_maintain(t, pol)
    assert r["actions"]["compact"]["run"]
    assert r["actions"]["compact"]["budget_buckets"] == 1
    # exactly one bucket serviced this sweep
    assert r["actions"]["compact"]["dirty_buckets_after"] == dirty0 - 1
    assert not r["actions"]["expire_snapshots"]["run"]
    assert not r["actions"]["remove_orphans"]["run"]
    # repeated sweeps converge to clean
    for _ in range(dirty0):
        auto_maintain(t, pol)
    assert t.stats()["delta_depth_max"] == 0


def test_bucket_count_advisor_rebuckets_oversized_table(spark, tmp_path):
    """Round-4 verdict item #5: a table whose recorded rows/bucket exceed
    the policy target triggers an ONLINE rebucket to the next power of
    two that restores the target, content bit-stable through the rewrite,
    reason recorded with the triggering numbers; the immediately-following
    call is a no-op (the new grid is healthy)."""
    t = _dirty_table(spark, tmp_path)
    t.compact(only_dirty=False)  # exact recorded floors
    before = table_to_pandas(t.read())
    total = t.stats()["base_rows_recorded"]
    tgt = max(1, total // 32)  # 8 buckets can't hold it; ~32+ needed
    pol = MaintenancePolicy(
        max_delta_depth=99, max_dirty_buckets=9999, retain_snapshots=50,
        target_rows_per_bucket=tgt,
    )
    r = auto_maintain(t, pol)
    act = r["actions"]["rebucket"]
    assert act["run"], act
    assert str(tgt) in act["reason"] and "buckets" in act["reason"]
    new_nb = t.stats()["num_buckets"]
    assert act["num_buckets_after"] == new_nb == act["recommended_num_buckets"]
    assert new_nb >= 32 and (new_nb & (new_nb - 1)) == 0  # power of two
    assert_tables_equal(table_to_pandas(t.refresh().read()), before)
    # converged: next call skips with an in-target reason
    r2 = auto_maintain(t, pol)
    assert not r2["actions"]["rebucket"]["run"]
    assert "within target" in r2["actions"]["rebucket"]["reason"]


def test_bucket_count_advisor_healthy_and_hysteresis(spark, tmp_path):
    t = _dirty_table(spark, tmp_path)
    t.compact(only_dirty=False)
    v0 = t.stats()["version"]
    total = t.stats()["base_rows_recorded"]
    # healthy: generous target -> no-op with reason, nothing committed
    pol = MaintenancePolicy(
        max_delta_depth=99, max_dirty_buckets=9999, retain_snapshots=50,
        target_rows_per_bucket=total,
    )
    r = auto_maintain(t, pol)
    assert not r["actions"]["rebucket"]["run"]
    assert "within target" in r["actions"]["rebucket"]["reason"]
    assert t.stats()["version"] == v0
    # hysteresis: target just under mean -> needed < 2x current -> skip
    mean = total // t.stats()["num_buckets"]
    pol = MaintenancePolicy(
        max_delta_depth=99, max_dirty_buckets=9999, retain_snapshots=50,
        target_rows_per_bucket=max(1, int(mean * 0.9)),
    )
    r = auto_maintain(t, pol)
    assert not r["actions"]["rebucket"]["run"]
    assert "hysteresis" in r["actions"]["rebucket"]["reason"]
    assert t.stats()["version"] == v0


def test_bucket_count_advisor_budget_and_recommend_only(spark, tmp_path):
    t = _dirty_table(spark, tmp_path)
    t.compact(only_dirty=False)
    v0 = t.stats()["version"]
    total = t.stats()["base_rows_recorded"]
    tgt = max(1, total // 32)
    # over the execution budget: recommendation recorded, nothing rewritten
    pol = MaintenancePolicy(
        max_delta_depth=99, max_dirty_buckets=9999, retain_snapshots=50,
        target_rows_per_bucket=tgt, rebucket_max_rows=total - 1,
    )
    r = auto_maintain(t, pol)
    act = r["actions"]["rebucket"]
    assert not act["run"] and act["recommended_num_buckets"] >= 32
    assert "over budget" in act["reason"]
    assert t.stats()["version"] == v0
    # recommend-only mode: same recommendation, still nothing rewritten
    pol = MaintenancePolicy(
        max_delta_depth=99, max_dirty_buckets=9999, retain_snapshots=50,
        target_rows_per_bucket=tgt, rebucket_execute=False,
    )
    r = auto_maintain(t, pol)
    act = r["actions"]["rebucket"]
    assert not act["run"] and act["recommended_num_buckets"] >= 32
    assert "rebucket_execute=False" in act["reason"]
    assert t.stats()["version"] == v0
    # dry run plans it without executing
    r = auto_maintain(t, MaintenancePolicy(
        max_delta_depth=99, max_dirty_buckets=9999, retain_snapshots=50,
        target_rows_per_bucket=tgt,
    ), dry_run=True)
    assert not r["actions"]["rebucket"]["run"]
    assert "dry run" in r["actions"]["rebucket"]["reason"]
    assert t.stats()["version"] == v0


# ---------------------------------------------------------------- row TTL

from datetime import datetime, timedelta  # noqa: E402

import pandas as pd  # noqa: E402

TTL_NOW = datetime(2025, 6, 1)
OLD = TTL_NOW - timedelta(days=90)
YOUNG = TTL_NOW - timedelta(days=1)
TTL_ONLY = dict(max_delta_depth=99, max_dirty_buckets=9999, retain_snapshots=50,
                ttl_column="ts", ttl_max_age=timedelta(days=30), ttl_now=TTL_NOW)


def _seed_rows(ts_for):
    return pd.DataFrame(
        [(f"c{i:03d}", 0, "user", f"t{i}", None, ts_for(i)) for i in range(40)],
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )


def _ttl_table(spark, tmp_path, ts_for, stats=("ts",), mode="mor"):
    t = SnapshotParquetTable(
        spark, str(tmp_path / "ttl"),
        TableSpec(num_buckets=4, merge_mode=mode, stats_cols=tuple(stats)),
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(_seed_rows(ts_for), TRANSCRIPT_SCHEMA))
    return t


def test_ttl_sweep_ages_out_expired_rows_then_goes_commit_free(spark, tmp_path):
    # mixed files: every bucket holds old AND young rows -> DV sidecars
    t = _ttl_table(spark, tmp_path, lambda i: OLD if i % 2 == 0 else YOUNG)
    r = auto_maintain(t, MaintenancePolicy(**TTL_ONLY))
    act = r["actions"]["ttl"]
    assert act["run"] and "below cutoff" in act["reason"]
    res = act["result"]
    assert res["n_dv_positions"] + res["n_rows_dropped"] == 20
    assert res["n_dv_positions"] > 0  # stragglers went through the DV path
    got = table_to_pandas(t.read())
    assert len(got) == 20 and (got["ts"] >= pd.Timestamp(YOUNG)).all()
    v1 = t.stats()["version"]
    # second round: the straggler files' recorded min(ts) is still old, so
    # the sweep re-runs — but it is COMMIT-FREE (the positional scan reads
    # live rows only, so nothing re-matches: no snapshot, no new sidecar)
    r2 = auto_maintain(t, MaintenancePolicy(**TTL_ONLY))
    act2 = r2["actions"]["ttl"]
    assert act2["run"]
    assert act2["result"]["n_dv_positions"] == 0
    assert act2["result"]["n_files_dropped"] == 0
    assert act2["result"]["n_tombstoned"] == 0
    assert t.stats()["version"] == v1
    assert_tables_equal(table_to_pandas(t.read()), got)
    # compaction rewrites the stragglers; the trigger then goes fully
    # metadata-only (no stat-bearing file below the cutoff)
    t.compact(only_dirty=False)
    r3 = auto_maintain(t, MaintenancePolicy(**TTL_ONLY))
    assert not r3["actions"]["ttl"]["run"]
    assert ">= cutoff" in r3["actions"]["ttl"]["reason"]


def test_ttl_whole_file_drop_is_metadata_only(spark, tmp_path):
    # every row expired -> stats prove whole-file matches -> manifest drops
    t = _ttl_table(spark, tmp_path, lambda i: OLD)
    r = auto_maintain(t, MaintenancePolicy(**TTL_ONLY))
    res = r["actions"]["ttl"]["result"]
    assert res["n_files_dropped"] > 0 and res["n_rows_dropped"] == 40
    assert res["n_dv_positions"] == 0 and res["n_tombstoned"] == 0
    assert t.read().count() == 0


def test_ttl_young_table_is_metadata_only_noop(spark, tmp_path):
    t = _ttl_table(spark, tmp_path, lambda i: YOUNG)
    v0 = t.stats()["version"]
    r = auto_maintain(t, MaintenancePolicy(**TTL_ONLY))
    act = r["actions"]["ttl"]
    assert not act["run"] and ">= cutoff" in act["reason"]
    assert t.stats()["version"] == v0


def test_ttl_without_recorded_stats_reports_observation(spark, tmp_path):
    t = _ttl_table(spark, tmp_path, lambda i: OLD, stats=())
    v0 = t.stats()["version"]
    r = auto_maintain(t, MaintenancePolicy(**TTL_ONLY))
    act = r["actions"]["ttl"]
    assert not act["run"] and "stats_cols" in act["reason"]
    assert t.stats()["version"] == v0 and t.read().count() == 40


def test_ttl_dry_run_plans_without_executing(spark, tmp_path):
    t = _ttl_table(spark, tmp_path, lambda i: OLD)
    v0 = t.stats()["version"]
    r = auto_maintain(t, MaintenancePolicy(**TTL_ONLY), dry_run=True)
    assert r["actions"]["ttl"]["run"] and "result" not in r["actions"]["ttl"]
    assert t.stats()["version"] == v0 and t.read().count() == 40


def test_ttl_dirty_bucket_rows_fall_back_to_tombstones(spark, tmp_path):
    # old rows arriving through CDC land in MoR delta layers (which carry
    # stats too) -> the sweep routes their buckets to the tombstone path
    t = _ttl_table(spark, tmp_path, lambda i: YOUNG)
    ch = pd.DataFrame(
        [(100 + i, "I", f"c{i:03d}", 7, "user", "stale", None, OLD) for i in range(10)],
        columns=["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA), batch_id=1)
    r = auto_maintain(t, MaintenancePolicy(**TTL_ONLY))
    act = r["actions"]["ttl"]
    assert act["run"]
    assert act["result"]["n_tombstoned"] == 10
    got = table_to_pandas(t.read())
    assert len(got) == 40 and (got["ts"] >= pd.Timestamp(YOUNG)).all()


def test_ttl_cdc_mode_tombstones_are_feed_visible_and_converge(spark, tmp_path):
    """ttl_mode='cdc': the sweep is real tombstone events — they enter the
    change feed (so replicas converge; the DV mode is feed-invisible by
    design) — and a re-triggered round is commit-free because the
    emptiness probe sees no LIVE rows below the cutoff."""
    t = _ttl_table(spark, tmp_path, lambda i: OLD if i % 2 == 0 else YOUNG)
    v0 = t.current_version()
    pol = MaintenancePolicy(**{**TTL_ONLY, "ttl_mode": "cdc"})
    r = auto_maintain(t, pol)
    act = r["actions"]["ttl"]
    assert act["run"] and act["mode"] == "cdc"
    assert act["result"]["n_tombstoned"] == 20
    got = table_to_pandas(t.read())
    assert len(got) == 20 and (got["ts"] >= pd.Timestamp(YOUNG)).all()
    feed = t.table_changes(v0, t.current_version())
    dels = feed.filter("_change_type = 'delete'").count()
    assert dels == 20
    v1 = t.current_version()
    r2 = auto_maintain(t, pol)
    act2 = r2["actions"]["ttl"]
    assert not act2["run"] and "already tombstoned" in act2["reason"]
    assert t.current_version() == v1


def test_ttl_rejects_non_temporal_column_and_bad_mode(spark, tmp_path):
    t = _ttl_table(spark, tmp_path, lambda i: YOUNG)
    import pytest

    with pytest.raises(ValueError, match="timestamp/date"):
        auto_maintain(t, MaintenancePolicy(**{**TTL_ONLY, "ttl_column": "role"}))
    with pytest.raises(ValueError, match="ttl_mode"):
        auto_maintain(t, MaintenancePolicy(**{**TTL_ONLY, "ttl_mode": "soft"}))


# ------------------------------------------------------- declared policy

from ccdb_data_pipeline_spark.plans.maintenance import (  # noqa: E402
    set_table_policy,
    table_policy,
)


def test_declared_policy_drives_policyless_maintain(spark, tmp_path):
    """set_table_policy persists the policy ON the table (manifest block,
    metadata-only commit); auto_maintain with no policy argument applies
    it, the declaration survives later data commits, an explicit argument
    overrides it, and clearing restores defaults."""
    t = _ttl_table(spark, tmp_path, lambda i: OLD if i % 2 == 0 else YOUNG)
    assert table_policy(t) is None
    pol = MaintenancePolicy(**TTL_ONLY)
    set_table_policy(t, pol)
    got = table_policy(t)
    assert got.ttl_column == "ts" and got.ttl_max_age == pol.ttl_max_age
    assert got.ttl_now is None  # runtime clock never persisted

    # ttl_now rides only the explicit argument — declare the cutoff-free
    # fields and pass the frozen clock at run time for this test
    r = auto_maintain(t, MaintenancePolicy(**TTL_ONLY))
    assert r["actions"]["ttl"]["run"]
    assert t.read().count() == 20

    # the declaration survives a data commit
    ch = pd.DataFrame(
        [(500, "I", "zz", 0, "user", "new", None, YOUNG)],
        columns=["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA), batch_id=1)
    assert table_policy(t).ttl_column == "ts"

    # policy-less maintain resolves the declared policy (wall clock is far
    # past OLD/YOUNG, so the declared 30-day TTL ages everything out)
    r2 = auto_maintain(t)
    assert r2["actions"].get("ttl") is not None

    # explicit argument overrides the declaration
    r3 = auto_maintain(t, MaintenancePolicy(max_delta_depth=99,
                                            max_dirty_buckets=9999,
                                            retain_snapshots=50))
    assert "ttl" not in r3["actions"]

    # clearing the declaration restores defaults
    set_table_policy(t, None)
    assert table_policy(t) is None
    assert "ttl" not in auto_maintain(t, dry_run=True)["actions"]


def test_declared_policy_round_trips_every_field(spark, tmp_path):
    from datetime import timedelta as _td

    t = _ttl_table(spark, tmp_path, lambda i: YOUNG)
    pol = MaintenancePolicy(
        max_delta_depth=3, max_dirty_buckets=7, compact_budget_buckets=None,
        retain_snapshots=9, expire_slack=1, orphan_gc=False,
        zorder_by=("role", "ts"), target_rows_per_bucket=1000,
        rebucket_min_factor=3.0, rebucket_execute=False, rebucket_max_rows=5,
        ttl_column="ts", ttl_max_age=_td(days=2.5), ttl_mode="cdc",
    )
    set_table_policy(t, pol)
    got = table_policy(t)
    from dataclasses import fields as _fields

    for f in _fields(MaintenancePolicy):
        if f.name == "ttl_now":
            continue
        assert getattr(got, f.name) == getattr(pol, f.name), f.name
