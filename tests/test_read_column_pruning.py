"""read(columns=...) prunes payload width BEFORE the MoR resolve.

Catalyst cannot push a projection through the resolve's max_by(struct(all
columns)) aggregate, so a caller-side .select() still shuffles the full
row; the columns= parameter is the engine-side fix. Checked here: values
match a full read, the parquet ReadSchema actually shrinks, and the
point-lookup path composes."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    t = SnapshotParquetTable(
        spark,
        str(tmp_path_factory.mktemp("prune") / "t"),
        TableSpec(num_buckets=8, merge_mode="mor"),
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(
        t, spark.createDataFrame(gen_seed_pandas(n_convs=40, seed=3), TRANSCRIPT_SCHEMA)
    )
    ch = gen_changes_pandas(1200, n_convs=40, seed=3)
    for i, p in enumerate(np.array_split(ch, 2)):
        apply_changes(t, spark.createDataFrame(p, CHANGE_SCHEMA), batch_id=i)
    return t


def _fmt_plan(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_pruned_read_matches_full_read(table):
    full = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in table.read().select("conv_id", "turn_idx", "text").collect()
    }
    pruned = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in table.read(columns=["conv_id", "turn_idx", "text"]).collect()
    }
    assert pruned == full and len(full) > 0


def test_pruned_read_shrinks_scan_schema(table):
    # the table has unfolded MoR deltas, so the resolve aggregate is in the
    # plan; the scan must still read only keys + markers + requested column
    df = table.read(columns=["text"])
    assert df.columns == ["text"]
    plan = _fmt_plan(df)
    assert "role" not in plan and "tool" not in plan, (
        "unrequested payload columns leaked into the physical plan:\n" + plan
    )


def test_unpruned_select_cannot_push_through_resolve(table):
    """Control: the same projection applied AFTER read() leaves the full
    width in the resolve (this is why columns= exists)."""
    plan = _fmt_plan(table.read().select("text"))
    assert "role" in plan  # full payload still flows into max_by


def test_keys_always_available_for_resolve_but_not_leaked(table):
    out = table.read(columns=["text", "ts"])
    assert out.columns == ["text", "ts"]


def test_read_keys_with_columns(table):
    some = [r["conv_id"] for r in table.read(columns=["conv_id"]).limit(3).collect()]
    out = table.read_keys(some, columns=["turn_idx", "text"])
    assert out.columns == ["turn_idx", "text"]
    assert out.count() > 0


def test_unknown_column_raises(table):
    with pytest.raises(ValueError, match="unknown columns"):
        table.read(columns=["nope"])
