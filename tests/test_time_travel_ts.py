"""TIMESTAMP AS OF time travel over the ref's own ancestry."""

import pandas as pd
import pytest

from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec


def _batch(spark, lsns):
    n = len(lsns)
    pdf = pd.DataFrame(
        {
            "lsn": lsns,
            "op": ["I"] * n,
            "conv_id": [f"c-{x}" for x in lsns],
            "turn_idx": [0] * n,
            "role": ["user"] * n,
            "text": [f"t{x}" for x in lsns],
            "tool": [None] * n,
            "ts": pd.Timestamp("2025-01-01"),
        }
    )
    return spark.createDataFrame(pdf, CHANGE_SCHEMA)


def test_read_as_of_commit_times(spark, tmp_path):
    t = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=2, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    t.merge(_batch(spark, [1, 2]), batch_id=0)
    t1 = t.manifest()["committed_at"]
    t.merge(_batch(spark, [3]), batch_id=1)
    t2 = t.manifest()["committed_at"]

    assert t.read_as_of(t1).count() == 2
    assert t.read_as_of((t1 + t2) / 2).count() == 2
    assert t.read_as_of(t2 + 1).count() == 3
    with pytest.raises(ValueError, match="no snapshot"):
        t.version_as_of(t1 - 3600)

    # a branch's later commit must not hijack main's TIMESTAMP AS OF answer
    b = t.create_branch("wip")
    b.merge(_batch(spark, [4]), batch_id=2)
    t._manifest = None
    assert t.read_as_of(b.manifest()["committed_at"] + 1).count() == 3


def test_register_view_sql_front_door(spark, tmp_path):
    """register_view exposes a resolved (optionally pinned) snapshot to
    spark.sql; the view is stable while the table advances."""
    import pandas as pd

    from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
    from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
    from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
    from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas

    t = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=2, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(gen_seed_pandas(n_convs=10, seed=5), TRANSCRIPT_SCHEMA))
    v0 = t.current_version()
    n0 = t.read().count()
    t.register_view("live", version=v0)

    apply_changes(t, spark.createDataFrame(gen_changes_pandas(300, n_convs=10, seed=5), CHANGE_SCHEMA), batch_id=0)
    # the registered view still answers from the pinned snapshot
    assert spark.sql("SELECT COUNT(*) AS n FROM live").first()["n"] == n0
    # re-register follows the new commit; SQL aggregations run on the resolved rows
    t.register_view("live")
    assert spark.sql("SELECT COUNT(*) AS n FROM live").first()["n"] == t.read().count()
    assert spark.sql(
        "SELECT COUNT(DISTINCT conv_id) AS c FROM live WHERE text IS NOT NULL"
    ).first()["c"] > 0
    spark.catalog.dropTempView("live")
