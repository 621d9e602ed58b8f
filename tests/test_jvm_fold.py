"""The all-JVM fused fold (fold_engine="jvm": max_by groupBy riding the
write repartition + Catalyst-expression normalization) must be
byte-identical to the arrow/pandas folds and the pure-pandas replay oracle
— including the unicode-whitespace normalization class and delete
tombstones — and its physical plan must contain exactly ONE exchange (the
groupBy reuses the write repartition via the subset rule)."""

import numpy as np
import pandas as pd
import pytest

from ccdb_data_pipeline_spark.functions.normalize import (
    normalize_pandas_frame,
    normalize_payload_jvm,
)
from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import (
    CHANGE_SCHEMA,
    TRANSCRIPT_SCHEMA,
    TableSpec,
)
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas
from tests.oracle import assert_tables_equal, replay, table_to_pandas
from tests.test_arrow_fold import NASTY


def test_ws_parity_pandas_vs_jvm_expressions(spark):
    spec = TableSpec(empty_to_null_exempt=(), normalize_ws_cols=("text",))
    pdf = pd.DataFrame({"text": NASTY * 3, "other": [""] * len(NASTY) * 3})
    expected = normalize_pandas_frame(pdf.copy(), spec, ["text", "other"])
    df = spark.createDataFrame(pdf.where(pdf.notna(), None))
    got = normalize_payload_jvm(df, spec, ["text", "other"]).toPandas()
    assert list(got["text"].fillna("<null>")) == list(expected["text"].fillna("<null>"))
    assert got["other"].isna().all() and expected["other"].isna().all()


@pytest.mark.parametrize("n_convs,n_events", [(50, 4000)])
def test_jvm_fold_end_to_end_matches_arrow_and_oracle(spark, tmp_path, n_convs, n_events):
    seed = gen_seed_pandas(n_convs=n_convs, seed=11)
    changes = gen_changes_pandas(n_events, n_convs=n_convs, seed=11)
    upd = changes.index[changes["op"] != "D"][: len(NASTY) * 4]
    changes.loc[upd, "text"] = (NASTY * 4)[: len(upd)]

    finals = {}
    for engine in ("jvm", "arrow"):
        spec = TableSpec(num_buckets=8, merge_mode="mor", fold_engine=engine)
        t = SnapshotParquetTable(spark, str(tmp_path / engine), spec)
        t.create(TRANSCRIPT_SCHEMA)
        bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
        for i, p in enumerate(np.array_split(changes, 3)):
            apply_changes(t, spark.createDataFrame(p, CHANGE_SCHEMA), batch_id=i)
        finals[engine] = table_to_pandas(t.read())

    assert_tables_equal(finals["jvm"], finals["arrow"])
    assert_tables_equal(finals["jvm"], replay(seed, [changes]))


def test_jvm_fold_salted_hive_path(spark, tmp_path):
    """Force the non-flat (hive dirs + salt) branch: grouping must include
    (bucket, salt) so the distribution is still satisfied."""
    seed = gen_seed_pandas(n_convs=30, seed=5)
    changes = gen_changes_pandas(2000, n_convs=30, seed=5)
    spec = TableSpec(num_buckets=8, merge_mode="mor", fold_engine="jvm",
                     write_salt=2)
    t = SnapshotParquetTable(spark, str(tmp_path / "salted"), spec)
    # shrink the exact-placement guard so the fallback branch runs
    t._EXACT_PLACEMENT_MAX = 0
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    apply_changes(t, spark.createDataFrame(changes, CHANGE_SCHEMA), batch_id=0)
    assert_tables_equal(table_to_pandas(t.read()), replay(seed, [changes]))


def test_jvm_fold_plan_has_single_exchange(spark):
    """Plan-shape guard: the fold groupBy must reuse the write repartition
    (one Exchange total), or the whole point is lost. Same shape as the
    merge_events jvm branch: repartition on the probe column, group on
    (probe, keys), max_by over one struct."""
    from pyspark.sql import functions as F

    changes = gen_changes_pandas(500, n_convs=10, seed=3)
    df = spark.createDataFrame(changes, CHANGE_SCHEMA)
    probe = df.withColumn("_probe", F.pmod(F.xxhash64("conv_id"), F.lit(8)))
    plan = (
        probe.repartition(8, F.col("_probe"))
        .groupBy("_probe", "conv_id", "turn_idx")
        .agg(F.expr("max_by(struct(text), struct(ts, lsn))").alias("_w"))
    )
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert s.count("Exchange") == 1, s
