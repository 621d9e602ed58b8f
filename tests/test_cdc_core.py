"""End-to-end CDC correctness vs the pandas replay oracle (M1 walking skeleton)."""

from datetime import datetime

import numpy as np
import pandas as pd
import pytest

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.plans.lineage import lineage_rows
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas
from tests.oracle import assert_tables_equal, replay, table_to_pandas

N_CONVS = 60
N_EVENTS = 3000


@pytest.fixture(scope="module")
def seed_pdf():
    return gen_seed_pandas(n_convs=N_CONVS, seed=42)


@pytest.fixture(scope="module")
def changes_pdf():
    return gen_changes_pandas(N_EVENTS, n_convs=N_CONVS, seed=42)


def _mk_table(spark, tmp_path, seed_pdf, spec=None) -> SnapshotParquetTable:
    t = SnapshotParquetTable(spark, str(tmp_path / "table"), spec or TableSpec(num_buckets=8))
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    return t


def _spark_changes(spark, pdf):
    return spark.createDataFrame(pdf, CHANGE_SCHEMA)


def test_bootstrap_matches_seed(spark, tmp_path, seed_pdf):
    t = _mk_table(spark, tmp_path, seed_pdf)
    expected = replay(seed_pdf, [])
    assert_tables_equal(table_to_pandas(t.read()), expected)


def test_e2e_replay_matches_oracle(spark, tmp_path, seed_pdf, changes_pdf):
    """Flagship: replay the full change stream in 3 micro-batches; final table
    state must equal the sequential oracle (per-turn text equality under
    stable (conv_id, turn_idx) ordering — the input_hint invariant)."""
    t = _mk_table(spark, tmp_path, seed_pdf)
    parts = np.array_split(changes_pdf, 3)
    for i, p in enumerate(parts):
        stats = apply_changes(t, _spark_changes(spark, p), batch_id=i)
        assert not stats.skipped
        assert stats.n_source > 0
    expected = replay(seed_pdf, [changes_pdf])
    assert_tables_equal(table_to_pandas(t.read()), expected)

    # lineage ledger: one row per batch, covering the full LSN range
    rows = lineage_rows(t)
    assert [r["batch_id"] for r in rows] == [0, 1, 2]
    assert rows[0]["lsn_min"] == int(changes_pdf["lsn"].min())
    assert rows[-1]["lsn_max"] == int(changes_pdf["lsn"].max())
    assert all(r["n_malformed"] >= 0 for r in rows)
    # ranges are contiguous & non-overlapping for an in-order stream
    for a, b in zip(rows, rows[1:]):
        assert a["lsn_max"] < b["lsn_min"]


def test_batch_replay_is_skipped(spark, tmp_path, seed_pdf, changes_pdf):
    t = _mk_table(spark, tmp_path, seed_pdf)
    df = _spark_changes(spark, changes_pdf)
    s1 = apply_changes(t, df, batch_id=0)
    v1 = t.current_version()
    s2 = apply_changes(t, df, batch_id=0)  # foreachBatch epoch replay
    assert not s1.skipped and s2.skipped
    assert t.current_version() == v1


def test_duplicate_lsn_replay_is_noop(spark, tmp_path, seed_pdf, changes_pdf):
    """Same events delivered again under a NEW batch id (cross-checkpoint
    replay): strict LWW dominance makes every row a no-op."""
    t = _mk_table(spark, tmp_path, seed_pdf)
    df = _spark_changes(spark, changes_pdf)
    apply_changes(t, df, batch_id=0)
    before = table_to_pandas(t.read())
    apply_changes(t, df, batch_id=1)
    after = table_to_pandas(t.read())
    assert_tables_equal(after, before)


def test_edge_scenarios(spark, tmp_path, seed_pdf, changes_pdf):
    t = _mk_table(spark, tmp_path, seed_pdf)
    # deliver in two batches with the LATE low-lsn update arriving after the delete
    a = 1 + N_EVENTS // 2  # late update lsn (see binlog._edge_overrides)
    first = changes_pdf[changes_pdf["lsn"] != a]
    late = changes_pdf[changes_pdf["lsn"] == a]
    assert len(late) == 1 and late.iloc[0]["op"] == "U"
    apply_changes(t, _spark_changes(spark, first), batch_id=0)
    apply_changes(t, _spark_changes(spark, late), batch_id=1)

    out = table_to_pandas(t.read())
    # delete-vs-late-lower-lsn-update: stays deleted
    assert not ((out["conv_id"] == "conv-edge") & (out["turn_idx"] == 1)).any()
    # I->U->D->I chain: final insert visible
    chain = out[(out["conv_id"] == "conv-chain") & (out["turn_idx"] == 2)]
    assert len(chain) == 1 and chain.iloc[0]["text"] == "chain v4 final"
    # full equality with oracle under the same arrival split
    assert_tables_equal(out, replay(seed_pdf, [first, late]))


def test_normalization_applied(spark, tmp_path, seed_pdf):
    t = _mk_table(spark, tmp_path, seed_pdf)
    pdf = pd.DataFrame(
        {
            "lsn": [10, 11, 12],
            "op": ["U", "U", "U"],
            "conv_id": ["conv-norm"] * 3,
            "turn_idx": np.array([0, 1, 2], dtype=np.int32),
            "role": ["user", "", "assistant"],  # "" -> null
            "text": ["  a\n\n b\t c  ", "", "Ḟōö   Ƀàŕ"],  # ws collapse; "" kept
            "tool": ["", None, "search"],
            "ts": [datetime(2025, 6, 1)] * 3,
        }
    )
    apply_changes(t, _spark_changes(spark, pdf), batch_id=0)
    out = table_to_pandas(t.read())
    rows = out[out["conv_id"] == "conv-norm"].sort_values("turn_idx")
    assert list(rows["text"]) == ["a b c", "", "Ḟōö Ƀàŕ"]
    assert rows.iloc[1]["role"] is None  # ""->null
    assert rows.iloc[0]["tool"] is None
    assert rows.iloc[2]["tool"] == "search"


def test_malformed_rows_dropped_and_counted(spark, tmp_path, seed_pdf):
    t = _mk_table(spark, tmp_path, seed_pdf)
    pdf = pd.DataFrame(
        {
            "lsn": [1, 2],
            "op": ["U", "U"],
            "conv_id": [None, "conv-ok"],
            "turn_idx": np.array([0, 0], dtype=np.int32),
            "role": ["user", "user"],
            "text": ["x", "y"],
            "tool": [None, None],
            "ts": [datetime(2025, 6, 1)] * 2,
        }
    )
    stats = apply_changes(t, _spark_changes(spark, pdf), batch_id=0)
    assert stats.n_source == 1
    rows = lineage_rows(t)
    assert rows[0]["n_malformed"] == 1
    out = table_to_pandas(t.read())
    assert (out["conv_id"] == "conv-ok").sum() == 1


def test_rollback_and_time_travel(spark, tmp_path, seed_pdf, changes_pdf):
    t = _mk_table(spark, tmp_path, seed_pdf)
    v_seed = t.current_version()
    apply_changes(t, _spark_changes(spark, changes_pdf), batch_id=0)
    seed_expected = replay(seed_pdf, [])
    # time travel read of the pre-merge snapshot
    assert_tables_equal(table_to_pandas(t.read(version=v_seed)), seed_expected)
    # rollback (alias-swap failure path analog)
    t.rollback(v_seed)
    assert_tables_equal(table_to_pandas(t.read()), seed_expected)


def test_compaction_preserves_state(spark, tmp_path, seed_pdf, changes_pdf):
    t = _mk_table(spark, tmp_path, seed_pdf)
    apply_changes(t, _spark_changes(spark, changes_pdf), batch_id=0)
    before = table_to_pandas(t.read())
    n_files_before = sum(len(v) for v in t.manifest()["buckets"].values())
    t.compact()
    after = table_to_pandas(t.read())
    assert_tables_equal(after, before)
    n_files_after = sum(len(v) for v in t.manifest()["buckets"].values())
    assert n_files_after <= n_files_before


def test_concurrent_commit_loser_conflicts_then_retries(spark, tmp_path, seed_pdf, changes_pdf):
    """Optimistic concurrency: two handles on the same table root race the
    same version slot; exactly one wins, the loser gets CommitConflictError
    and succeeds after re-reading (Iceberg CommitFailedException retry)."""
    from ccdb_data_pipeline_spark.plans.lake import CommitConflictError

    t1 = _mk_table(spark, tmp_path, seed_pdf)
    t2 = SnapshotParquetTable(spark, t1.root, t1.spec)
    half = len(changes_pdf) // 2
    p1, p2 = changes_pdf.iloc[:half], changes_pdf.iloc[half:]
    # both handles cache the same parent snapshot
    t1.manifest(), t2.manifest()
    apply_changes(t1, _spark_changes(spark, p1), batch_id=0)   # t1 wins the slot
    with pytest.raises(CommitConflictError):
        apply_changes(t2, _spark_changes(spark, p2), batch_id=1)
    # loser's cache was invalidated by the conflict; plain retry succeeds
    apply_changes(t2, _spark_changes(spark, p2), batch_id=1)
    expected = replay(seed_pdf, [p1, p2])
    assert_tables_equal(table_to_pandas(t2.read()), expected)
    # the losing attempt's data files are unreferenced debris -> reclaimable
    stats = t2.remove_orphans()
    assert stats["n_data_files_deleted"] >= 0
    assert_tables_equal(table_to_pandas(t2.read()), expected)


def test_rollback_rolls_forward_then_accepts_new_writes(spark, tmp_path, seed_pdf, changes_pdf):
    """Rollback commits a NEW version (append-only slots); the rolled-back
    batch ledger re-opens so the same batch_id can be replayed after."""
    t = _mk_table(spark, tmp_path, seed_pdf)
    v_seed = t.current_version()
    apply_changes(t, _spark_changes(spark, changes_pdf), batch_id=0)
    v_merge = t.current_version()
    t.rollback(v_seed)
    assert t.current_version() == v_merge + 1          # forward, not backward
    assert t.manifest()["summary"]["op"] == "rollback"
    assert_tables_equal(table_to_pandas(t.read()), replay(seed_pdf, []))
    # abandoned commit still time-travel readable
    assert_tables_equal(
        table_to_pandas(t.read(version=v_merge)), replay(seed_pdf, [changes_pdf])
    )
    # ledger re-opened: replaying batch 0 must NOT be skipped, and lands clean
    stats = apply_changes(t, _spark_changes(spark, changes_pdf), batch_id=0)
    assert not stats.skipped
    assert_tables_equal(table_to_pandas(t.read()), replay(seed_pdf, [changes_pdf]))
