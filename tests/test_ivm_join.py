"""Incremental JOIN view maintenance (plans/ivm.py IncrementalJoinView):
the maintained fact ⋈ dim state must equal a full re-join recompute after
every refresh — across fact-only windows, dim-only windows (attribute
updates and dim deletes), and windows where BOTH tables changed (the
ΔA⋈ΔB cross term)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.ivm import IncrementalJoinView
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas

N_CONVS = 30
N_EVENTS = 1200

DIM_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("priority", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

DIM_SPEC = TableSpec(
    key_cols=("conv_id",),
    bucket_col="conv_id",
    ts_col="ts",
    lsn_col="lsn",
    op_col="op",
    num_buckets=4,
    empty_to_null_exempt=("channel",),
    normalize_ws_cols=(),
)


@pytest.fixture(scope="module")
def seed_pdf():
    return gen_seed_pandas(n_convs=N_CONVS, seed=11)


@pytest.fixture(scope="module")
def changes_pdf():
    return gen_changes_pandas(N_EVENTS, n_convs=N_CONVS, seed=11)


def _dim_pdf(conv_ids, lsn0=1, ts="2024-01-01"):
    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "channel": [f"ch{i % 3}" for i in range(len(conv_ids))],
            "priority": np.arange(len(conv_ids), dtype=np.int64) % 5,
            "ts": pd.Timestamp(ts),
            "op": "U",
            "lsn": np.arange(lsn0, lsn0 + len(conv_ids), dtype=np.int64),
        }
    )


def _make_tables(spark, tmp_path, seed_pdf, fact_mode="mor"):
    fact = SnapshotParquetTable(
        spark, str(tmp_path / "fact"), TableSpec(num_buckets=8, merge_mode=fact_mode)
    )
    fact.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(fact, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    dim = SnapshotParquetTable(spark, str(tmp_path / "dim"), DIM_SPEC)
    dim.create(DIM_SCHEMA)
    convs = sorted(seed_pdf["conv_id"].unique())
    dim.merge(spark.createDataFrame(_dim_pdf(convs)), batch_id=0)
    return fact, dim


def _recompute(fact, dim):
    d = dim.read().select("conv_id", "channel", "priority")
    return fact.read().join(d, on="conv_id", how="inner")


def _as_sorted_pdf(df):
    pdf = df.toPandas()
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True).astype(str)


def _assert_matches(view, fact, dim):
    got = _as_sorted_pdf(view.read().drop("ts_dim", "dim_ts"))
    want = _as_sorted_pdf(_recompute(fact, dim))
    # align column sets: the view carries every fact col + dim payload
    want = want[got.columns]
    pd.testing.assert_frame_equal(got, want)


def _view(spark, tmp_path):
    return IncrementalJoinView(spark, str(tmp_path / "view"), on={"conv_id": "conv_id"})


def test_dim_ts_clash_is_rejected(spark, tmp_path, seed_pdf):
    """The dim table's own ts column collides with the fact's ts column —
    the view must refuse rather than silently shadow."""
    fact, dim = _make_tables(spark, tmp_path, seed_pdf)
    v = _view(spark, tmp_path)
    with pytest.raises(ValueError, match="collide"):
        v.refresh(fact, dim)


def _make_disjoint_tables(spark, tmp_path, seed_pdf, fact_mode="mor"):
    """Same as _make_tables but the dim drops its ts from the payload via a
    rename so output schemas are disjoint."""
    fact = SnapshotParquetTable(
        spark, str(tmp_path / "fact"), TableSpec(num_buckets=8, merge_mode=fact_mode)
    )
    fact.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(fact, spark.createDataFrame(seed_pdf, TRANSCRIPT_SCHEMA))
    schema = T.StructType(
        [f if f.name != "ts" else T.StructField("dim_ts", f.dataType) for f in DIM_SCHEMA]
    )
    spec = TableSpec(
        key_cols=("conv_id",),
        bucket_col="conv_id",
        ts_col="dim_ts",
        lsn_col="lsn",
        op_col="op",
        num_buckets=4,
        empty_to_null_exempt=("channel",),
        normalize_ws_cols=(),
    )
    dim = SnapshotParquetTable(spark, str(tmp_path / "dim"), spec)
    dim.create(schema)
    convs = sorted(seed_pdf["conv_id"].unique())
    pdf = _dim_pdf(convs).rename(columns={"ts": "dim_ts"})
    dim.merge(spark.createDataFrame(pdf), batch_id=0)
    return fact, dim


@pytest.mark.parametrize("fact_mode", ["cow", "mor"])
def test_tracks_fact_changes(spark, tmp_path, seed_pdf, changes_pdf, fact_mode):
    fact, dim = _make_disjoint_tables(spark, tmp_path, seed_pdf, fact_mode)
    v = _view(spark, tmp_path)
    stats = v.refresh(fact, dim)
    assert stats["n_changes"] == -1
    _assert_matches(v, fact, dim)

    for i, part in enumerate(np.array_split(changes_pdf, 3)):
        apply_changes(fact, spark.createDataFrame(part, CHANGE_SCHEMA), batch_id=i)
        v.refresh(fact, dim)
        _assert_matches(v, fact, dim)

    # idempotent when nothing changed
    before = _as_sorted_pdf(v.read())
    assert v.refresh(fact, dim)["n_changes"] == 0
    pd.testing.assert_frame_equal(_as_sorted_pdf(v.read()), before)


def test_tracks_dim_changes_and_deletes(spark, tmp_path, seed_pdf):
    fact, dim = _make_disjoint_tables(spark, tmp_path, seed_pdf)
    v = _view(spark, tmp_path)
    v.refresh(fact, dim)
    convs = sorted(seed_pdf["conv_id"].unique())

    # attribute update on a third of the convs: every fact row for those
    # convs must flip channel in the view
    upd = _dim_pdf(convs[::3], lsn0=1000, ts="2024-02-01").rename(columns={"ts": "dim_ts"})
    upd["channel"] = "escalated"
    dim.merge(spark.createDataFrame(upd), batch_id=1)
    v.refresh(fact, dim)
    _assert_matches(v, fact, dim)
    n_upd = v.read().filter(F.col("channel") == "escalated").count()
    assert n_upd > 0

    # dim delete: the deleted conv's turns drop out of the inner join
    victim = convs[0]
    dele = _dim_pdf([victim], lsn0=2000, ts="2024-03-01").rename(columns={"ts": "dim_ts"})
    dele["op"] = "D"
    dim.merge(spark.createDataFrame(dele), batch_id=2)
    v.refresh(fact, dim)
    _assert_matches(v, fact, dim)
    assert v.read().filter(F.col("conv_id") == victim).count() == 0


def test_both_sides_change_in_one_window(spark, tmp_path, seed_pdf, changes_pdf):
    """The ΔA⋈ΔB cross term: a conversation's turns AND its dim row change
    between two refreshes — the bilinear rule must not double-count."""
    fact, dim = _make_disjoint_tables(spark, tmp_path, seed_pdf)
    v = _view(spark, tmp_path)
    v.refresh(fact, dim)

    convs = sorted(seed_pdf["conv_id"].unique())
    apply_changes(fact, spark.createDataFrame(changes_pdf, CHANGE_SCHEMA), batch_id=0)
    upd = _dim_pdf(convs[::2], lsn0=5000, ts="2024-04-01").rename(columns={"ts": "dim_ts"})
    upd["priority"] = 99
    dim.merge(spark.createDataFrame(upd), batch_id=1)

    stats = v.refresh(fact, dim)
    assert stats["n_changes"] > 0
    _assert_matches(v, fact, dim)
    # multiplicities must consolidate to exactly 1 (keys are unique)
    mult = v.read(with_multiplicity=True).select(F.min("_n"), F.max("_n")).first()
    assert (mult[0], mult[1]) == (1, 1)
