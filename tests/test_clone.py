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


def test_clone_carries_dv_sidecars(spark, tmp_path):
    """A table with deletion vectors clones WITH its referenced sidecars
    (round-4 fix: they were skipped — the clone's DV'd reads referenced
    missing files). Both modes; clone state == source state."""
    import os as _os

    from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
    from ccdb_data_pipeline_spark.sources.binlog import gen_seed_pandas

    t = SnapshotParquetTable(
        spark, str(tmp_path / "dvsrc"), TableSpec(num_buckets=2, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(
        t, spark.createDataFrame(gen_seed_pandas(n_convs=10, seed=4), TRANSCRIPT_SCHEMA)
    )
    t.compact(only_dirty=False)
    rep = t.delete_where_dv("turn_idx % 3 = 0")
    assert rep["n_dv_positions"] > 0
    want = sorted(map(tuple, t.read().select("conv_id", "turn_idx", "text").collect()))
    for mode in ("hardlink", "copy"):
        c = t.clone_to(str(tmp_path / f"dvclone-{mode}"), mode=mode)
        assert _os.path.isdir(_os.path.join(c.root, "dv"))
        got = sorted(map(tuple, c.read().select("conv_id", "turn_idx", "text").collect()))
        assert got == want, mode


def test_clone_copy_on_mock_scheme(spark, tmp_path):
    """mode='copy' routes through the scheme layer: a local table clones
    onto an in-memory mock:// root and reads back identically (hardlink is
    refused with a clear error on remote roots)."""
    import pyarrow.fs as pafs
    import pytest as _pt

    from ccdb_data_pipeline_spark.plans import fsio
    from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
    from ccdb_data_pipeline_spark.sources.binlog import gen_seed_pandas

    fs = pafs._MockFileSystem()
    fsio.register_filesystem("mock", fs, conditional_put=True)
    try:
        t = SnapshotParquetTable(
            spark, str(tmp_path / "locsrc"), TableSpec(num_buckets=2, merge_mode="mor")
        )
        t.create(TRANSCRIPT_SCHEMA)
        bootstrap_seed(
            t, spark.createDataFrame(gen_seed_pandas(n_convs=6, seed=2), TRANSCRIPT_SCHEMA)
        )
        with _pt.raises(ValueError, match="hardlink"):
            t.clone_to("mock://clone1", mode="hardlink")
        c = t.clone_to("mock://clone1", mode="copy")
        got = sorted(map(tuple, c.read().select("conv_id", "turn_idx", "text").collect()))
        want = sorted(map(tuple, t.read().select("conv_id", "turn_idx", "text").collect()))
        assert got == want
    finally:
        fsio._REGISTERED.pop("mock", None)
        fsio._CONDITIONAL_PUT.pop("mock", None)
