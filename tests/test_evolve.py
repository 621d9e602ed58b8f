"""Schema evolution: column add + type widen, mid-stream (SURVEY.md M3).

Mirrors the reference's v1->v2 intake migration (fixtures v1-intake.csv ->
v2-intake.csv add event_tag) but automatic: the engine unions schemas and
widens types instead of requiring hand-edited field files
(csv2json.py:61-85)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T

from ccdb_data_pipeline_spark.operators.evolve import align_to_schema, evolve_schema
from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import (
    CHANGE_SCHEMA,
    CHANGE_SCHEMA_V2,
    TRANSCRIPT_SCHEMA,
    TableSpec,
)
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas
from tests.oracle import assert_tables_equal, replay, table_to_pandas


def test_evolve_schema_rules():
    a = T.StructType([T.StructField("x", T.IntegerType()), T.StructField("y", T.StringType())])
    b = T.StructType([T.StructField("x", T.LongType()), T.StructField("z", T.FloatType())])
    out = evolve_schema(a, b)
    assert [f.name for f in out.fields] == ["x", "y", "z"]
    assert out["x"].dataType == T.LongType()  # widen
    assert out["y"].dataType == T.StringType()  # kept (missing in batch -> nulls)
    assert out["z"].dataType == T.FloatType()  # added

    with pytest.raises(TypeError):
        evolve_schema(
            T.StructType([T.StructField("x", T.StringType())]),
            T.StructType([T.StructField("x", T.LongType())]),
        )


def test_align_to_schema(spark):
    df = spark.createDataFrame([(1, "a")], "x int, keep string")
    target = T.StructType(
        [
            T.StructField("x", T.LongType()),
            T.StructField("y", T.StringType()),
        ]
    )
    out = align_to_schema(df, target)
    assert out.schema["x"].dataType == T.LongType()
    assert out.schema["y"].dataType == T.StringType()
    assert "keep" in out.columns  # extras ride along
    row = out.collect()[0]
    assert row["x"] == 1 and row["y"] is None and row["keep"] == "a"


def test_mid_stream_evolution_e2e(spark, tmp_path):
    seed = gen_seed_pandas(n_convs=30, seed=42)
    v1 = gen_changes_pandas(800, n_convs=30, seed=42)
    v2 = gen_changes_pandas(800, n_convs=30, seed=43, start_lsn=801, v2=True)

    t = SnapshotParquetTable(spark, str(tmp_path / "table"), TableSpec(num_buckets=8))
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    apply_changes(t, spark.createDataFrame(v1, CHANGE_SCHEMA), batch_id=0)
    pre_schema = t.schema
    assert "tool_args" not in [f.name for f in pre_schema.fields]

    apply_changes(t, spark.createDataFrame(v2, CHANGE_SCHEMA_V2), batch_id=1)
    schema = t.schema
    assert schema["tool_args"].dataType == T.StringType()
    assert schema["turn_idx"].dataType == T.LongType()  # widened int32 -> int64

    out = table_to_pandas(t.read())
    expected = replay(seed, [v1, v2])
    assert_tables_equal(out, expected)

    # pre-switchpoint rows read back with null tool_args (null backfill)
    v2_keys = set(zip(v2["conv_id"], v2["turn_idx"].astype("int64")))
    old_rows = out[~out.apply(lambda r: (r["conv_id"], r["turn_idx"]) in v2_keys, axis=1)]
    assert old_rows["tool_args"].isna().all()
    assert len(old_rows) > 0


def test_evolution_then_more_v1_batches(spark, tmp_path):
    """A straggler producer still sending the OLD schema after evolution:
    its rows align into the evolved table (missing cols -> null)."""
    seed = gen_seed_pandas(n_convs=10, seed=42)
    t = SnapshotParquetTable(spark, str(tmp_path / "table"), TableSpec(num_buckets=4))
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))

    v2 = gen_changes_pandas(200, n_convs=10, seed=43, start_lsn=1, v2=True)
    apply_changes(t, spark.createDataFrame(v2, CHANGE_SCHEMA_V2), batch_id=0)

    straggler = pd.DataFrame(
        {
            "lsn": [10_000],
            "op": ["U"],
            "conv_id": ["conv-straggler"],
            "turn_idx": np.array([0], dtype=np.int32),
            "role": ["user"],
            "text": ["old schema row"],
            "tool": [None],
            "ts": [pd.Timestamp("2025-06-01")],
        }
    )
    apply_changes(t, spark.createDataFrame(straggler, CHANGE_SCHEMA), batch_id=1)
    out = table_to_pandas(t.read())
    row = out[out["conv_id"] == "conv-straggler"]
    assert len(row) == 1
    assert row.iloc[0]["text"] == "old schema row"
    assert pd.isna(row.iloc[0]["tool_args"])


def test_classify_compat_verdicts():
    from pyspark.sql import types as T

    from ccdb_data_pipeline_spark.operators.evolve import (
        classify_compat,
        require_compat,
    )

    table = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("x", T.DoubleType()),
        ]
    )
    # identical (order ignored)
    same = T.StructType([table["x"], table["k"], table["n"]])
    assert classify_compat(table, same)["verdict"] == "identical"

    # adds + widen + missing -> compatible, fully itemized
    prod = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("tool_args", T.StringType()),
        ]
    )
    rep = classify_compat(table, prod)
    assert rep["verdict"] == "compatible"
    assert rep["adds"] == ["tool_args"]
    assert rep["missing"] == ["x"]
    assert rep["widens"] == [("n", "int", "bigint")]

    # narrower producer is compatible (data widens into the table type)
    narrow = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("n", T.ShortType())]
    )
    rep = classify_compat(table, narrow)
    assert rep["verdict"] == "compatible" and rep["narrows"] == [
        ("n", "int", "smallint")
    ]

    # cross-family conflict -> incompatible, and require_compat raises
    bad = T.StructType([T.StructField("n", T.StringType())])
    assert classify_compat(table, bad)["verdict"] == "incompatible"
    import pytest as _pytest

    with _pytest.raises(TypeError, match="incompatible producer schema"):
        require_compat(table, bad)
