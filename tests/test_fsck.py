"""Integrity audit (plans/fsck.py): a healthy table passes; every class of
on-disk corruption the audit claims to detect is detected when injected."""

import json
import os

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.fsck import fsck
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import (
    CHANGE_SCHEMA,
    TRANSCRIPT_SCHEMA,
    TableSpec,
)
from ccdb_data_pipeline_spark.sources.binlog import (
    gen_changes_pandas,
    gen_seed_pandas,
)


def _mk(spark, tmp_path):
    t = SnapshotParquetTable(
        spark, os.path.join(str(tmp_path), "t"),
        TableSpec(num_buckets=4, merge_mode="mor"),
    )
    t.create(TRANSCRIPT_SCHEMA)
    seed = gen_seed_pandas(n_convs=15, seed=2)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    ch = gen_changes_pandas(300, n_convs=15, seed=2)
    apply_changes(t, spark.createDataFrame(ch, CHANGE_SCHEMA), batch_id=0)
    return t


def _kinds(report):
    return {x["kind"] for x in report["violations"]}


def test_healthy_table_passes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create_tag("pin")
    t.create_branch("staging")
    t.compact(max_buckets=2)
    rep = fsck(t)
    assert rep["ok"], rep["violations"]
    assert rep["n_manifests"] >= 3 and rep["n_files"] > 0
    assert rep["n_refs"] == 3  # HEAD + branch + tag
    assert rep["n_ledger_batches"] >= 1


def test_missing_data_file_detected(spark, tmp_path):
    t = _mk(spark, tmp_path)
    m = t.manifest()
    victim = next(e for fs in m["buckets"].values() for e in fs)
    os.remove(os.path.join(t.root, victim["path"]))
    rep = fsck(t)
    assert not rep["ok"] and "missing_file" in _kinds(rep)
    assert any(x.get("path") == victim["path"] for x in rep["violations"])


def test_row_count_drift_detected(spark, tmp_path):
    t = _mk(spark, tmp_path)
    mp = t._manifest_path(t.current_version())
    with open(mp) as f:
        m = json.load(f)
    e = next(
        e for fs in m["buckets"].values() for e in fs
        if e.get("n_rows") is not None
    )
    e["n_rows"] += 7
    with open(mp, "w") as f:
        json.dump(m, f)
    rep = fsck(t)
    assert not rep["ok"] and "row_count_drift" in _kinds(rep)


def test_unknown_schema_era_detected(spark, tmp_path):
    t = _mk(spark, tmp_path)
    mp = t._manifest_path(t.current_version())
    with open(mp) as f:
        m = json.load(f)
    e = next(e for fs in m["buckets"].values() for e in fs)
    e["schema_id"] = 999
    with open(mp, "w") as f:
        json.dump(m, f)
    rep = fsck(t, verify_footers=False)
    assert not rep["ok"] and "unknown_schema_era" in _kinds(rep)


def test_dangling_ref_detected(spark, tmp_path):
    t = _mk(spark, tmp_path)
    tags_dir = os.path.join(t.root, "tags")
    os.makedirs(tags_dir, exist_ok=True)
    with open(os.path.join(tags_dir, "ghost"), "w") as f:
        f.write("424242")
    rep = fsck(t, verify_footers=False)
    assert not rep["ok"]
    assert any(
        x["kind"] == "dangling_ref" and x["ref"] == "tag:ghost"
        for x in rep["violations"]
    )


def test_fsck_catches_dv_sidecar_damage(spark, tmp_path):
    """Round 4: fsck audits deletion-vector sidecars — a missing sidecar
    dir and a count-drifted sidecar are both violations (either crashes
    reads or resurrects deleted rows)."""
    import shutil as _sh

    from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
    from ccdb_data_pipeline_spark.plans.fsck import fsck
    from ccdb_data_pipeline_spark.sources.binlog import gen_seed_pandas

    t = SnapshotParquetTable(
        spark, str(tmp_path / "dvf"), TableSpec(num_buckets=2, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(
        t, spark.createDataFrame(gen_seed_pandas(n_convs=10, seed=6), TRANSCRIPT_SCHEMA)
    )
    t.compact(only_dirty=False)
    rep = t.delete_where_dv("turn_idx % 2 = 0")
    assert rep["n_dv_positions"] > 0
    assert fsck(t)["ok"]

    # drift: tamper the manifest's recorded n_deleted
    import json as _json
    mpath = t._manifest_path(t.current_version())
    m = _json.loads(open(mpath).read())
    for fs in m["buckets"].values():
        for e in fs:
            if e.get("dv"):
                e["dv"]["n_deleted"] += 1
    open(mpath, "w").write(_json.dumps(m))
    t._manifest = None
    rep1 = fsck(t)
    assert not rep1["ok"]
    assert any(v["kind"] == "dv_count_drift" for v in rep1["violations"])

    # damage: remove the sidecar dir entirely
    import os as _os
    _sh.rmtree(_os.path.join(t.root, "dv"))
    rep2 = fsck(t)
    assert any(v["kind"] == "missing_dv_sidecar" for v in rep2["violations"])
