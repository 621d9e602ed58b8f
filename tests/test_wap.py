"""Write-audit-publish branches (plans/lake.py): staged commits on a named
ref, metadata-only audits, atomic fast-forward publish — the reference's
build-new-index-then-alias-swap (index_ccdb.py:45-71,150-178) with the audit
gate it lacks."""

import numpy as np
import pytest

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import (
    AuditFailedError,
    PublishConflictError,
    SnapshotParquetTable,
)
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas
from tests.oracle import assert_tables_equal, replay, table_to_pandas

N_CONVS = 40
N_EVENTS = 1500


@pytest.fixture(scope="module")
def seed_pdf():
    return gen_seed_pandas(n_convs=N_CONVS, seed=7)


@pytest.fixture(scope="module")
def changes_pdf():
    return gen_changes_pandas(N_EVENTS, n_convs=N_CONVS, seed=7)


def _mk_table(spark, tmp_path, seed_pdf, spec=None) -> SnapshotParquetTable:
    t = SnapshotParquetTable(spark, str(tmp_path / "table"), spec or TableSpec(num_buckets=8))
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    return t


def _changes(spark, pdf):
    return spark.createDataFrame(pdf, CHANGE_SCHEMA)


def test_branch_commits_invisible_until_publish(spark, tmp_path, seed_pdf, changes_pdf):
    t = _mk_table(spark, tmp_path, seed_pdf)
    v_main = t.current_version()
    br = t.create_branch("audit")
    parts = np.array_split(changes_pdf, 2)
    for i, p in enumerate(parts):
        stats = apply_changes(br, _changes(spark, p), batch_id=i)
        assert not stats.skipped
    # main untouched; branch ahead
    assert t.current_version() == v_main
    assert_tables_equal(table_to_pandas(t.read()), replay(seed_pdf, []))
    assert_tables_equal(table_to_pandas(br.read()), replay(seed_pdf, [changes_pdf]))
    assert t.branches() == {"audit": br.current_version()}

    v_branch = br.current_version()
    published = t.publish_branch("audit")
    assert t.current_version() == published == v_branch
    assert_tables_equal(table_to_pandas(t.read()), replay(seed_pdf, [changes_pdf]))
    assert t.branches() == {}
    # the published ledger carries the branch's batches: replay is a no-op
    assert apply_changes(t, _changes(spark, parts[0]), batch_id=0).skipped


def test_failed_audit_blocks_publish_and_abort_reclaims(
    spark, tmp_path, seed_pdf, changes_pdf
):
    t = _mk_table(spark, tmp_path, seed_pdf)
    br = t.create_branch("bad")
    apply_changes(br, _changes(spark, changes_pdf), batch_id=0)

    def reject(view, branch_m, main_m):
        raise AuditFailedError("synthetic audit failure")

    v_main = t.current_version()
    with pytest.raises(AuditFailedError):
        t.publish_branch("bad", audits=[reject])
    # main untouched, branch still staged
    assert t.current_version() == v_main
    assert "bad" in t.branches()

    t.drop_branch("bad")
    assert t.branches() == {}
    # branch data files survive until retention expires their manifests
    got = t.expire_snapshots(retain_last=1)
    assert got["n_data_files_deleted"] > 0
    assert_tables_equal(table_to_pandas(t.read()), replay(seed_pdf, []))


def test_divergent_main_raises_publish_conflict(spark, tmp_path, seed_pdf, changes_pdf):
    t = _mk_table(spark, tmp_path, seed_pdf)
    parts = np.array_split(changes_pdf, 2)
    br = t.create_branch("stale")
    apply_changes(br, _changes(spark, parts[0]), batch_id=0)
    # main advances independently -> branch is no longer a fast-forward
    apply_changes(t, _changes(spark, parts[1]), batch_id=0)
    with pytest.raises(PublishConflictError):
        t.publish_branch("stale")
    t.drop_branch("stale")


def test_ledger_rewind_audit(spark, tmp_path, seed_pdf, changes_pdf):
    """A branch forked BEFORE batches main already has must not publish:
    its ledger high-water marks are behind main's."""
    t = _mk_table(spark, tmp_path, seed_pdf)
    br = t.create_branch("rewind")
    parts = np.array_split(changes_pdf, 2)
    apply_changes(t, _changes(spark, parts[0]), batch_id=0)
    apply_changes(br, _changes(spark, parts[1]), batch_id=0)
    # ancestry check fires first (main advanced), which is also correct;
    # verify the audit itself via a merged-history branch: fork NOW (after
    # main's commit), then hand-roll a manifest regression is overkill —
    # instead assert the metadata audit rejects directly
    branch_m = br.manifest()
    main_m = t.manifest()
    idx = t._snapshot_index()
    with pytest.raises(AuditFailedError):
        t._run_default_audits(dict(branch_m, last_batch_id=-1, last_lsn=-1), main_m, idx)


def test_branch_and_main_slots_never_collide(spark, tmp_path, seed_pdf, changes_pdf):
    """Global version-slot allocation: interleaved main/branch commits get
    distinct manifest slots and both histories stay readable."""
    t = _mk_table(spark, tmp_path, seed_pdf)
    br = t.create_branch("side")
    parts = np.array_split(changes_pdf, 2)
    apply_changes(br, _changes(spark, parts[0]), batch_id=0)
    apply_changes(t, _changes(spark, parts[0]), batch_id=0)
    apply_changes(br, _changes(spark, parts[1]), batch_id=1)
    apply_changes(t, _changes(spark, parts[1]), batch_id=1)
    assert br.current_version() != t.current_version()
    # each ref's history follows its own parent chain (slots interleave)
    main_chain = [m["version"] for m in t.history()]
    side_chain = [m["version"] for m in br.history()]
    assert set(main_chain) & set(side_chain) == {0, 1}  # create + bootstrap
    assert_tables_equal(table_to_pandas(t.read()), replay(seed_pdf, [changes_pdf]))
    assert_tables_equal(table_to_pandas(br.read()), replay(seed_pdf, [changes_pdf]))


def test_publish_after_main_noop_and_row_floor_passes(
    spark, tmp_path, seed_pdf, changes_pdf
):
    """Happy-path default audits: a delete-heavy branch still publishes
    because the row floor accounts for its own deletes."""
    t = _mk_table(spark, tmp_path, seed_pdf)
    br = t.create_branch("deletes")
    apply_changes(br, _changes(spark, changes_pdf), batch_id=0)
    v = t.publish_branch("deletes")
    assert t.current_version() == v
    assert_tables_equal(table_to_pandas(t.read()), replay(seed_pdf, [changes_pdf]))


def test_publish_after_branch_dv_whole_file_drop(spark, tmp_path):
    """A branch that runs a METADATA-ONLY DV whole-file delete must still
    publish: the dropped files' rows are credited against the row floor
    (round 4 — the audit previously false-positived because dv_delete has
    no 'n_delete' merge stat)."""
    from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
    from ccdb_data_pipeline_spark.sources.binlog import gen_seed_pandas

    t = SnapshotParquetTable(
        spark, str(tmp_path / "wapdv"),
        TableSpec(num_buckets=2, merge_mode="mor", stats_cols=("role",)),
    )
    t.create(TRANSCRIPT_SCHEMA)
    import pandas as pd

    seed = gen_seed_pandas(n_convs=12, seed=8)
    seed["role"] = "user"  # homogeneous: files provably all-match
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    t.compact(only_dirty=False, sort_within_bucket=True)

    br = t.create_branch("dvwork")
    rep = br.delete_where_dv([("role", "=", "user")], ts=__import__("datetime").datetime(2030, 1, 1))
    assert rep["n_files_dropped"] > 0 and rep["n_rows_dropped"] > 0
    published = t.publish_branch("dvwork")
    assert t.current_version() == published
    assert t.refresh().read().count() == 0
