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
