"""Zero-copy clone: snapshot export, independence, CDC resume on the fork."""

import os

import pandas as pd
import pytest

from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec


def _batch(spark, lsns, op="I", prefix="c", ts="2025-01-01"):
    n = len(lsns)
    pdf = pd.DataFrame(
        {
            "lsn": lsns,
            "op": [op] * n,
            "conv_id": [f"{prefix}-{lsn}" for lsn in lsns],
            "turn_idx": [0] * n,
            "role": ["user"] * n,
            "text": [f"t{lsn}" for lsn in lsns],
            "tool": [None] * n,
            "ts": pd.Timestamp(ts),
        }
    )
    return spark.createDataFrame(pdf, CHANGE_SCHEMA)


def test_clone_reads_equal_and_diverge_independently(spark, tmp_path):
    src = SnapshotParquetTable(
        spark, str(tmp_path / "src"), TableSpec(num_buckets=2, merge_mode="mor")
    )
    src.create(TRANSCRIPT_SCHEMA)
    src.merge(_batch(spark, [1, 2, 3]), batch_id=0)
    src.merge(_batch(spark, [4, 5]), batch_id=1)

    fork = src.clone_to(str(tmp_path / "fork"))
    assert fork.read().count() == src.read().count() == 5
    assert fork.manifest()["summary"]["op"] == "clone"
    # ledger carried: the CDC tail resumes where the snapshot was cut
    assert fork.last_batch_id == 1 and fork.last_lsn == 5

    # divergence is private in both directions
    fork.merge(_batch(spark, [6], prefix="fork"), batch_id=2)
    src.merge(_batch(spark, [6, 7], prefix="src"), batch_id=2)
    assert fork.read().count() == 6
    src._manifest = None
    assert src.read().count() == 7
    assert {r["conv_id"] for r in fork.read().collect()} >= {"fork-6"}
    assert not any(r["conv_id"] == "src-6" for r in fork.read().collect())


def test_clone_pins_a_past_version_and_survives_source_gc(spark, tmp_path):
    src = SnapshotParquetTable(
        spark, str(tmp_path / "src"), TableSpec(num_buckets=2, merge_mode="mor")
    )
    src.create(TRANSCRIPT_SCHEMA)
    src.merge(_batch(spark, [1, 2]), batch_id=0)
    v1 = src.current_version()
    src.merge(_batch(spark, [3]), batch_id=1)

    old = src.clone_to(str(tmp_path / "old"), version=v1)
    assert old.read().count() == 2

    # source compacts + expires + GCs: the hardlinked clone keeps its bytes
    src.compact()
    src.expire_snapshots(retain_last=1)
    src.remove_orphans()
    assert old.read().count() == 2
    assert {r["conv_id"] for r in old.read().collect()} == {"c-1", "c-2"}


def test_clone_refuses_existing_target(spark, tmp_path):
    src = SnapshotParquetTable(
        spark, str(tmp_path / "src"), TableSpec(num_buckets=2, merge_mode="mor")
    )
    src.create(TRANSCRIPT_SCHEMA)
    src.merge(_batch(spark, [1]), batch_id=0)
    src.clone_to(str(tmp_path / "dup"))
    with pytest.raises(ValueError, match="already exists"):
        src.clone_to(str(tmp_path / "dup"))
