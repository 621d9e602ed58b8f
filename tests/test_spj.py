"""Storage-partitioned join (plans/spj.py): the bucket-local arrow join
must equal the vanilla shuffled df.join over read() states — across CoW,
MoR-with-unfolded-deltas, tombstones, and left-outer null extension — and
its physical plan must contain no data shuffle and no Spark join node."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.plans.spj import join_cobucketed
from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_seed_pandas

N_CONVS = 40

DIM_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("priority", T.LongType()),
        T.StructField("dim_ts", T.TimestampType()),
    ]
)


def _dim_spec(n_buckets=8, mode="mor"):
    return TableSpec(
        key_cols=("conv_id",),
        bucket_col="conv_id",
        ts_col="dim_ts",
        lsn_col="lsn",
        op_col="op",
        num_buckets=n_buckets,
        merge_mode=mode,
        empty_to_null_exempt=("channel",),
        normalize_ws_cols=(),
    )


def _dim_pdf(conv_ids, lsn0=1, ts="2024-01-01"):
    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "channel": [f"ch{i % 3}" for i in range(len(conv_ids))],
            "priority": np.arange(len(conv_ids), dtype=np.int64) % 5,
            "dim_ts": pd.Timestamp(ts),
            "op": "U",
            "lsn": np.arange(lsn0, lsn0 + len(conv_ids), dtype=np.int64),
        }
    )


@pytest.fixture(scope="module")
def seed_pdf():
    return gen_seed_pandas(n_convs=N_CONVS, seed=23)


def _make(spark, tmp_path, seed_pdf, fact_mode="mor", dim_mode="mor", n_buckets=8):
    fact = SnapshotParquetTable(
        spark,
        str(tmp_path / "fact"),
        TableSpec(num_buckets=n_buckets, merge_mode=fact_mode),
    )
    fact.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(fact, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    dim = SnapshotParquetTable(spark, str(tmp_path / "dim"), _dim_spec(n_buckets, dim_mode))
    dim.create(DIM_SCHEMA)
    convs = sorted(seed_pdf["conv_id"].unique())
    dim.merge(spark.createDataFrame(_dim_pdf(convs)), batch_id=0)
    return fact, dim


def _as_sorted_pdf(df):
    pdf = df.toPandas()
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True).astype(str)


def _reference_join(fact, dim, how="inner"):
    return fact.read().join(dim.read(), on="conv_id", how=how)


@pytest.mark.parametrize("modes", [("cow", "cow"), ("mor", "mor")])
def test_inner_join_matches_shuffled_join(spark, tmp_path, seed_pdf, modes):
    fact, dim = _make(spark, tmp_path, seed_pdf, *modes)
    got = _as_sorted_pdf(join_cobucketed(fact, dim, on=["conv_id"]))
    want = _as_sorted_pdf(_reference_join(fact, dim))
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])


def test_mor_deltas_and_tombstones_resolve_in_task(spark, tmp_path, seed_pdf):
    """Merge updates AND deletes into both sides WITHOUT compacting: the
    per-task arrow fold must resolve delta layers and drop tombstones."""
    fact, dim = _make(spark, tmp_path, seed_pdf, "mor", "mor")
    convs = sorted(seed_pdf["conv_id"].unique())
    upd = _dim_pdf(convs[::3], lsn0=500, ts="2024-02-01")
    upd["channel"] = "escalated"
    dele = _dim_pdf(convs[:4], lsn0=900, ts="2024-03-01")
    dele["op"] = "D"
    dim.merge(spark.createDataFrame(pd.concat([upd[~upd.conv_id.isin(dele.conv_id)], dele])), batch_id=1)

    got = _as_sorted_pdf(join_cobucketed(fact, dim, on=["conv_id"]))
    want = _as_sorted_pdf(_reference_join(fact, dim))
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
    # the deleted convs are gone from the inner join
    assert not set(dele["conv_id"]) & set(got["conv_id"])


def test_left_join_null_extends_missing_dim(spark, tmp_path, seed_pdf):
    fact, dim = _make(spark, tmp_path, seed_pdf)
    convs = sorted(seed_pdf["conv_id"].unique())
    dele = _dim_pdf(convs[::2], lsn0=900, ts="2024-03-01")
    dele["op"] = "D"
    dim.merge(spark.createDataFrame(dele), batch_id=1)

    got = _as_sorted_pdf(join_cobucketed(fact, dim, on=["conv_id"], how="left"))
    want = _as_sorted_pdf(_reference_join(fact, dim, how="left"))
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
    assert (got["channel"] == "None").any()  # null-extended rows exist


def test_column_pruning(spark, tmp_path, seed_pdf):
    fact, dim = _make(spark, tmp_path, seed_pdf)
    out = join_cobucketed(
        fact, dim, on=["conv_id"], columns_a=["role", "text"], columns_b=["channel"]
    )
    assert out.columns == ["conv_id", "role", "text", "channel"]
    want = _as_sorted_pdf(
        fact.read().select("conv_id", "role", "text").join(
            dim.read().select("conv_id", "channel"), on="conv_id"
        )
    )
    pd.testing.assert_frame_equal(_as_sorted_pdf(out), want)


def test_plan_has_no_data_shuffle_or_join_node(spark, tmp_path, seed_pdf):
    fact, dim = _make(spark, tmp_path, seed_pdf)
    plan = join_cobucketed(fact, dim, on=["conv_id"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # no Spark join operator at all
    # exactly one Exchange: the kilobyte-sized metadata fan-out
    assert plan.count("Exchange") == 1


def test_preconditions_are_validated(spark, tmp_path, seed_pdf):
    fact, dim = _make(spark, tmp_path, seed_pdf, n_buckets=8)
    other = SnapshotParquetTable(
        spark, str(tmp_path / "dim4"), _dim_spec(n_buckets=4)
    )
    other.create(DIM_SCHEMA)
    convs = sorted(seed_pdf["conv_id"].unique())
    other.merge(spark.createDataFrame(_dim_pdf(convs)), batch_id=0)

    with pytest.raises(ValueError, match="bucket counts differ"):
        join_cobucketed(fact, other, on=["conv_id"])
    with pytest.raises(ValueError, match="must include the bucket column"):
        join_cobucketed(fact, dim, on=["turn_idx"])
    with pytest.raises(ValueError, match="exist on both sides"):
        join_cobucketed(fact, fact, on=["conv_id"])
