"""Predicate DML (plans/dml.py): DELETE/UPDATE WHERE compiled to change
events through the exactly-once apply path — on both CoW and MoR tables."""

import datetime as dt
import os

import pytest

from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
from ccdb_data_pipeline_spark.plans.dml import delete_where, update_where
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.plans.lineage import lineage_rows
from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import gen_seed_pandas

TS = dt.datetime(2030, 1, 1)


@pytest.fixture(params=["cow", "mor"])
def table(request, spark, tmp_path):
    spec = TableSpec(num_buckets=4, merge_mode=request.param)
    t = SnapshotParquetTable(spark, os.path.join(str(tmp_path), "t"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    seed = gen_seed_pandas(n_convs=20, seed=3)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    return t


def test_delete_where_removes_only_matching(table):
    before = table.read().count()
    n_user = table.read().filter("role = 'user'").count()
    assert 0 < n_user < before
    stats = delete_where(table, "role = 'user'", ts=TS)
    assert stats.n_source == n_user and not stats.skipped
    after = table.read()
    assert after.count() == before - n_user
    assert after.filter("role = 'user'").count() == 0


def test_update_where_rewrites_matching_rows(table):
    n = table.read().filter("role = 'assistant'").count()
    update_where(
        table,
        "role = 'assistant'",
        {"tool": "'redacted'", "text": "upper(text)"},
        ts=TS,
    )
    got = table.read().filter("role = 'assistant'")
    assert got.count() == n
    assert got.filter("tool <> 'redacted'").count() == 0
    assert got.filter("text <> upper(text)").count() == 0
    # non-matching rows untouched
    assert table.read().filter("role <> 'assistant' AND tool = 'redacted'").count() == 0


def test_dml_rides_history_with_fresh_lsns_outside_the_stream_ledger(table):
    """DML commits live in the MAINTENANCE id space: fresh LSNs above the
    watermark, an internal-marked merge in history — and NO row in the
    stream lineage ledger, whose batch-id sequence must stay a gapless
    record of stream epochs alone (a DML at last_batch_id + 1 would
    collide with the stream's next checkpointed epoch)."""
    wm0 = table.last_lsn
    stream_rows0 = lineage_rows(table)
    last_stream0 = table.last_batch_id
    stats = delete_where(table, "turn_idx = 0", ts=TS)
    assert stats.batch_id == 0 and table.last_dml_batch_id == 0
    assert table.last_batch_id == last_stream0  # stream space untouched
    assert lineage_rows(table) == stream_rows0  # ledger untouched
    s = table.history()[-1]["summary"]
    assert s["op"] == "merge" and s.get("internal") is True
    assert s["lsn_min"] == wm0 + 1
    assert s["lsn_max"] == wm0 + stats.n_source
    assert table.last_lsn == wm0 + stats.n_source


def test_dml_batch_replay_is_noop(table):
    stats = delete_where(table, "turn_idx = 1", ts=TS)
    count1 = table.read().count()
    # replaying the same INTERNAL batch_id is an exactly-once no-op
    from ccdb_data_pipeline_spark.plans.apply import apply_changes

    from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA

    empty = table.spark.createDataFrame([], CHANGE_SCHEMA)
    replay = apply_changes(table, empty, batch_id=stats.batch_id, internal=True)
    assert replay.skipped
    assert table.read().count() == count1
    # and a STREAM batch at the id the DML would previously have consumed
    # still applies — the collision this id-space split exists to prevent
    nxt = apply_changes(table, empty, batch_id=table.last_batch_id + 1)
    assert not nxt.skipped


def test_delete_where_no_match_is_clean(table):
    v0 = table.current_version()
    stats = delete_where(table, "role = 'no-such-role'", ts=TS)
    assert stats.n_source == 0
    assert table.read().count() > 0
    assert table.current_version() >= v0  # empty commit allowed but harmless


def test_update_where_rejects_key_and_unknown_columns(table):
    with pytest.raises(ValueError, match="key column"):
        update_where(table, "true", {"conv_id": "'x'"}, ts=TS)
    with pytest.raises(ValueError, match="not in table schema"):
        update_where(table, "true", {"nope": "'x'"}, ts=TS)


def test_dml_on_partial_update_table(spark, tmp_path):
    """DML sees the patch-resolved state: update_where full images replace
    rows whose current value came from a patch overlay."""
    from tests.test_partial_updates import EVENTS_B1, _apply, _read_state, _table

    t = _table(spark, tmp_path)
    _apply(t, spark, EVENTS_B1, 0)
    update_where(t, "tool = 'calc'", {"tool": "'calc-v2'"}, ts=TS)
    got = _read_state(t)
    assert got[("c1", 0)]["tool"] == "calc-v2"
    assert got[("c1", 0)]["text"] == "hello world"


def test_reconcile_to_converges_on_authoritative_snapshot(spark, tmp_path):
    """reconcile_to emits the minimal I/U/D batch making the table equal an
    authoritative snapshot, applies exactly-once, and converges (second
    reconcile is empty)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
    from ccdb_data_pipeline_spark.plans.dml import reconcile_to
    from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
    from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
    from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, gen_seed_pandas

    t = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=4, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(gen_seed_pandas(n_convs=20, seed=9), TRANSCRIPT_SCHEMA))
    apply_changes(t, spark.createDataFrame(gen_changes_pandas(800, n_convs=20, seed=9), CHANGE_SCHEMA), batch_id=0)

    cur = t.read()
    # authoritative snapshot: one row's text corrected, one row dropped,
    # one brand-new row appended
    some = cur.orderBy("conv_id", "turn_idx").limit(2).collect()
    (k_edit, k_drop) = [(r["conv_id"], r["turn_idx"]) for r in some]
    desired = (
        cur.withColumn(
            "text",
            F.when(
                (F.col("conv_id") == k_edit[0]) & (F.col("turn_idx") == k_edit[1]),
                F.lit("authoritative corrected text"),
            ).otherwise(F.col("text")),
        )
        .filter(~((F.col("conv_id") == k_drop[0]) & (F.col("turn_idx") == k_drop[1])))
        .unionByName(
            spark.createDataFrame(
                [("conv-new", 0, "user", "brand new row", None, dt.datetime(2026, 1, 1))],
                cur.schema,
            )
        )
    )
    diff = reconcile_to(t, desired, ts=dt.datetime(2026, 6, 1), dry_run=True)
    got_ops = sorted((r["op"], r["conv_id"], r["turn_idx"]) for r in diff.collect())
    assert got_ops == sorted(
        [("U", k_edit[0], k_edit[1]), ("D", k_drop[0], k_drop[1]), ("I", "conv-new", 0)]
    )

    stats = reconcile_to(t, desired, ts=dt.datetime(2026, 6, 1))
    assert stats.n_source == 3
    after = t.read()
    cmp_cols = [c for c in after.columns if c != "ts"]
    assert after.select(cmp_cols).exceptAll(desired.select(cmp_cols)).count() == 0
    assert desired.select(cmp_cols).exceptAll(after.select(cmp_cols)).count() == 0
    # convergence: nothing left to repair
    assert reconcile_to(t, desired, ts=dt.datetime(2026, 6, 2), dry_run=True).count() == 0


def test_dml_on_timestamp_ntz_table(spark, tmp_path):
    """The event-time stamp casts to the TABLE's ts type: a TIMESTAMP_NTZ
    table (the events-testdata shape) must accept delete_where /
    update_where without a schema-union refusal (round-3 fix)."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable

    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
    ])
    spec = TableSpec(
        key_cols=("k",), bucket_col="k", ts_col="ts", lsn_col="lsn",
        op_col="op", num_buckets=2, merge_mode="mor",
        empty_to_null_exempt=(), normalize_ws_cols=(),
    )
    t = SnapshotParquetTable(spark, str(tmp_path / "ntz"), spec)
    seed = spark.createDataFrame(
        [(f"k{i}", i, dt.datetime(2025, 1, 1)) for i in range(20)], schema
    ).select("*", F.col("v").alias("lsn"), F.lit("I").alias("op"))
    t.create(schema)
    t.merge_events(seed, batch_id=0)
    st = delete_where(t, "v % 2 = 0", ts=dt.datetime(2026, 1, 1))
    assert st.n_delete == 10
    assert t.read().count() == 10
    update_where(t, "v = 1", {"v": "v + 100"}, ts=dt.datetime(2026, 1, 2))
    assert t.read().filter("k = 'k1'").collect()[0]["v"] == 101
