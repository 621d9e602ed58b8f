"""Dead-letter quarantine for malformed change events.

The reference's indexer silently skips rows without a document id
(index_ccdb.py:104); here those rows are parked, per batch, with a reason
column — droppable data must still be auditable at 10^10-event scale.
"""

import numpy as np
import pandas as pd
import pytest

from ccdb_data_pipeline_spark.plans.apply import (
    apply_changes,
    bootstrap_seed,
    read_quarantine,
)
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.plans.lineage import lineage_rows
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas
from ccdb_data_pipeline_spark.streaming.stream import run_ingest
from tests.oracle import assert_tables_equal, replay, table_to_pandas


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_quarantine_batch_apply(spark, tmp_path, mode):
    seed = gen_seed_pandas(n_convs=30, seed=5)
    changes = gen_changes_pandas(1200, n_convs=30, seed=5)
    n_bad = int(changes["conv_id"].isna().sum())
    assert n_bad > 0  # generator emits null-key rows by construction

    t = SnapshotParquetTable(
        spark, str(tmp_path / "table"), TableSpec(num_buckets=8, merge_mode=mode)
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    qdir = str(tmp_path / "dlq")
    for i, p in enumerate(np.array_split(changes, 2)):
        apply_changes(
            t, spark.createDataFrame(p, CHANGE_SCHEMA), batch_id=i,
            quarantine_dir=qdir,
        )

    # table state unaffected by quarantining
    assert_tables_equal(table_to_pandas(t.read()), replay(seed, [changes]))

    dlq = read_quarantine(spark, qdir)
    rows = dlq.collect()
    assert len(rows) == n_bad
    assert all(r["_reason"] == "null:conv_id" for r in rows)
    assert all(r["conv_id"] is None for r in rows)
    # quarantined rowcount reconciles with the lineage ledger
    assert sum(r["n_malformed"] for r in lineage_rows(t)) == n_bad
    # the original payload survives for replay-after-fix
    assert set(dlq.columns) >= set(CHANGE_SCHEMA.fieldNames()) | {"_reason", "_batch_id"}


def test_quarantine_replay_is_idempotent(spark, tmp_path):
    """Re-applying a batch (same batch_id) must not duplicate DLQ rows."""
    seed = gen_seed_pandas(n_convs=20, seed=9)
    changes = gen_changes_pandas(600, n_convs=20, seed=9)
    n_bad = int(changes["conv_id"].isna().sum())
    t = SnapshotParquetTable(
        spark, str(tmp_path / "table"), TableSpec(num_buckets=8, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    qdir = str(tmp_path / "dlq")
    df = spark.createDataFrame(changes, CHANGE_SCHEMA)
    s1 = apply_changes(t, df, batch_id=0, quarantine_dir=qdir)
    s2 = apply_changes(t, df, batch_id=0, quarantine_dir=qdir)  # replay
    assert not s1.skipped and s2.skipped
    assert read_quarantine(spark, qdir).count() == n_bad


def test_quarantine_streaming(spark, tmp_path):
    from ccdb_data_pipeline_spark.sources.binlog import write_segments

    seed = gen_seed_pandas(n_convs=25, seed=13)
    changes = gen_changes_pandas(1000, n_convs=25, seed=13)
    n_bad = int(changes["conv_id"].isna().sum())
    t = SnapshotParquetTable(
        spark, str(tmp_path / "table"), TableSpec(num_buckets=8)
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    write_segments(changes, str(tmp_path / "binlog"), n_segments=4,
                   replay_segment=None)
    qdir = str(tmp_path / "dlq")
    run_ingest(spark, str(tmp_path / "binlog"), t, str(tmp_path / "ckpt"),
               max_files_per_trigger=2, quarantine_dir=qdir)
    assert_tables_equal(table_to_pandas(t.read()), replay(seed, [changes]))
    assert read_quarantine(spark, qdir).count() == n_bad


def test_requeue_after_repair(spark, tmp_path):
    """Dead-lettered rows re-enter through the exactly-once path after a
    repair: fixed rows land with fresh LSNs, unfixable rows stay
    quarantined, and a replay of the same requeue batch_id is a no-op."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ccdb_data_pipeline_spark.plans.apply import (
        apply_changes,
        quarantine_malformed,
        read_quarantine,
        requeue_quarantined,
    )
    from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
    from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec

    t = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=2, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    TS = pd.Timestamp("2025-01-01")
    rows = [
        (1, "I", "a", 0, "user", "good row", None, TS),
        (2, "I", None, 1, "user", "recoverable: conv in text", None, TS),
        (3, "I", None, None, "user", "hopeless", None, TS),
    ]
    pdf = pd.DataFrame(rows, columns=["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"])
    batch = spark.createDataFrame(pdf, CHANGE_SCHEMA)
    qdir = str(tmp_path / "q")
    quarantine_malformed(batch, t.spec, qdir, batch_id=0)
    apply_changes(t, batch, batch_id=0)
    assert t.read().count() == 1
    assert read_quarantine(spark, qdir).count() == 2

    def repair(df):
        # upstream fix: rows missing conv_id but with turn_idx belong to "b"
        return df.withColumn(
            "conv_id",
            F.when(F.col("conv_id").isNull() & F.col("turn_idx").isNotNull(), F.lit("b"))
            .otherwise(F.col("conv_id")),
        )

    stats = requeue_quarantined(t, qdir, repair, batch_id=1)
    assert stats.n_source == 1 and stats.lsn_min > 3  # fresh LSN above last_lsn
    out = {(r["conv_id"], r["turn_idx"]) for r in t.read().select("conv_id", "turn_idx").collect()}
    assert out == {("a", 0), ("b", 1)}
    left = read_quarantine(spark, qdir)
    assert left.count() == 1 and left.first()["_reason"] == "null:conv_id,null:turn_idx"

    # replayed requeue (same batch_id) is a no-op on the table
    v = t.current_version()
    again = requeue_quarantined(t, qdir, repair, batch_id=1)
    assert again.skipped and t.current_version() == v
