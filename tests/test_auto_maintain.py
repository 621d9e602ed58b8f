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
