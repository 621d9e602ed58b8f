"""Merge-on-read mode: LWW delta layers + read-time resolve + compaction
must produce byte-identical final state to copy-on-write (and the pandas
replay oracle). MoR is the high-rate apply path: O(batch) write cost per
micro-batch (Iceberg's merge-on-read analog) vs CoW's O(affected buckets).
"""

from datetime import datetime

import numpy as np
import pandas as pd
import pytest

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.plans.lineage import lineage_rows
from ccdb_data_pipeline_spark.schemas import (
    CHANGE_SCHEMA,
    CHANGE_SCHEMA_V2,
    TRANSCRIPT_SCHEMA,
    TableSpec,
)
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


def _mk(spark, tmp_path, seed_pdf, **spec_kw) -> SnapshotParquetTable:
    spec = TableSpec(num_buckets=8, merge_mode="mor", **spec_kw)
    t = SnapshotParquetTable(spark, str(tmp_path / "table"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    return t


def test_mor_replay_matches_oracle(spark, tmp_path, seed_pdf, changes_pdf):
    t = _mk(spark, tmp_path, seed_pdf)
    assert t.mode == "mor"
    parts = np.array_split(changes_pdf, 3)
    for i, p in enumerate(parts):
        stats = apply_changes(t, spark.createDataFrame(p, CHANGE_SCHEMA), batch_id=i)
        assert not stats.skipped
    # delta files present, unfolded
    m = t.manifest()
    assert any(e.get("delta") for fs in m["buckets"].values() for e in fs)
    expected = replay(seed_pdf, [changes_pdf])
    assert_tables_equal(table_to_pandas(t.read()), expected)
    # lineage ledger identical shape to CoW
    assert [r["batch_id"] for r in lineage_rows(t)] == [0, 1, 2]


def test_mor_auto_compact_preserves_state(spark, tmp_path, seed_pdf, changes_pdf):
    """compact_every=2 folds layers mid-stream; final state unchanged and the
    compacted buckets scan without resolve (no delta entries remain)."""
    t = _mk(spark, tmp_path, seed_pdf, compact_every=2)
    parts = np.array_split(changes_pdf, 4)
    for i, p in enumerate(parts):
        apply_changes(t, spark.createDataFrame(p, CHANGE_SCHEMA), batch_id=i)
    # after batch 3 (batch_id+1 == 4, multiple of 2) a compact ran last
    m = t.manifest()
    assert m["summary"]["op"] == "compact"
    assert not any(e.get("delta") for fs in m["buckets"].values() for e in fs)
    assert_tables_equal(table_to_pandas(t.read()), replay(seed_pdf, [changes_pdf]))


def test_mor_tombstone_survives_compaction(spark, tmp_path, seed_pdf):
    """Delete, compact (tombstones retained), then a LATE lower-(ts,lsn)
    update arrives: the key must stay deleted — the tombstone's dominance
    pair outlives the fold."""
    t = _mk(spark, tmp_path, seed_pdf)
    base = datetime(2025, 6, 1, 12, 0, 0)
    d = pd.DataFrame(
        {
            "lsn": [100],
            "op": ["D"],
            "conv_id": ["conv-00000"],
            "turn_idx": np.array([0], dtype=np.int32),
            "role": [None],
            "text": [None],
            "tool": [None],
            "ts": [base],
        }
    )
    late = pd.DataFrame(
        {
            "lsn": [50],
            "op": ["U"],
            "conv_id": ["conv-00000"],
            "turn_idx": np.array([0], dtype=np.int32),
            "role": ["user"],
            "text": ["zombie"],
            "tool": [None],
            "ts": [datetime(2025, 5, 1, 0, 0, 0)],
        }
    )
    apply_changes(t, spark.createDataFrame(d, CHANGE_SCHEMA), batch_id=0)
    t.compact(drop_tombstones=False)
    apply_changes(t, spark.createDataFrame(late, CHANGE_SCHEMA), batch_id=1)
    out = table_to_pandas(t.read())
    assert not ((out["conv_id"] == "conv-00000") & (out["turn_idx"] == 0)).any()


def test_mor_schema_evolution(spark, tmp_path, seed_pdf, changes_pdf):
    """Mid-stream column add (tool_args) + int->long widen lands as a new
    schema era in delta files; read resolves across eras; result matches the
    oracle replay of both frames."""
    t = _mk(spark, tmp_path, seed_pdf)
    apply_changes(t, spark.createDataFrame(changes_pdf, CHANGE_SCHEMA), batch_id=0)
    v2 = pd.DataFrame(
        {
            "lsn": [10_000, 10_001],
            "op": ["U", "I"],
            "conv_id": ["conv-00001", "conv-evolved"],
            "turn_idx": np.array([0, 0], dtype=np.int64),
            "role": ["assistant", "tool"],
            "text": ["evolved  text", "new row"],
            "tool": ["search", None],
            "tool_args": ['{"q": "x"}', None],
            "ts": [datetime(2025, 7, 1), datetime(2025, 7, 2)],
        }
    )
    apply_changes(t, spark.createDataFrame(v2, CHANGE_SCHEMA_V2), batch_id=1)
    out_schema = {f.name: f.dataType.simpleString() for f in t.schema.fields}
    assert out_schema["tool_args"] == "string"
    assert out_schema["turn_idx"] == "bigint"
    assert_tables_equal(table_to_pandas(t.read()), replay(seed_pdf, [changes_pdf, v2]))
    # and compaction folds the mixed-era layers losslessly
    t.compact(drop_tombstones=False)
    assert_tables_equal(table_to_pandas(t.read()), replay(seed_pdf, [changes_pdf, v2]))


def test_mor_raw_append_matches_oracle(spark, tmp_path, seed_pdf, changes_pdf):
    """dedupe_on_write=False (raw append, JVM-only apply): dedup AND
    normalization defer to read-time resolve; final state must still equal
    the oracle, before and after compaction."""
    t = _mk(spark, tmp_path, seed_pdf, dedupe_on_write=False)
    assert t.manifest()["write_path"] == "raw"
    parts = np.array_split(changes_pdf, 3)
    for i, p in enumerate(parts):
        stats = apply_changes(t, spark.createDataFrame(p, CHANGE_SCHEMA), batch_id=i)
        assert not stats.skipped
    expected = replay(seed_pdf, [changes_pdf])
    assert_tables_equal(table_to_pandas(t.read()), expected)
    t.compact(drop_tombstones=False)
    assert_tables_equal(table_to_pandas(t.read()), expected)
    # post-compact, clean buckets scan without resolve and stay normalized
    m = t.manifest()
    assert not any(e.get("delta") for fs in m["buckets"].values() for e in fs)


def test_mor_matches_cow_exactly(spark, tmp_path, seed_pdf, changes_pdf):
    cow = SnapshotParquetTable(spark, str(tmp_path / "cow"), TableSpec(num_buckets=8))
    cow.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(cow, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    mor = _mk(spark, tmp_path, seed_pdf)
    parts = np.array_split(changes_pdf, 2)
    for i, p in enumerate(parts):
        df = spark.createDataFrame(p, CHANGE_SCHEMA)
        apply_changes(cow, df, batch_id=i)
        apply_changes(mor, df, batch_id=i)
    assert_tables_equal(table_to_pandas(mor.read()), table_to_pandas(cow.read()))


def test_mor_fused_counts_and_drops_malformed(spark, tmp_path, seed_pdf):
    """Fused apply: null-key rows are tallied by the in-job observe node
    (source-event lineage) and never reach the table."""
    t = _mk(spark, tmp_path, seed_pdf)
    pdf = pd.DataFrame(
        {
            "lsn": [1, 2, 3],
            "op": ["U", "U", "U"],
            "conv_id": [None, "conv-ok", "conv-ok"],
            "turn_idx": np.array([0, 0, 0], dtype=np.int32),
            "role": ["user"] * 3,
            "text": ["x", "y", "z"],
            "tool": [None] * 3,
            "ts": [datetime(2025, 6, 1), datetime(2025, 6, 1), datetime(2025, 6, 2)],
        }
    )
    stats = apply_changes(t, spark.createDataFrame(pdf, CHANGE_SCHEMA), batch_id=0)
    # n_source counts well-formed SOURCE events (pre-dedup), malformed tallied
    assert stats.n_source == 2 and stats.n_malformed == 1
    assert stats.lsn_min == 2 and stats.lsn_max == 3
    rows = lineage_rows(t)
    assert rows[0]["n_malformed"] == 1
    out = table_to_pandas(t.read())
    assert (out["conv_id"] == "conv-ok").sum() == 1  # LWW winner only
    assert out[out["conv_id"] == "conv-ok"].iloc[0]["text"] == "z"
