"""Debezium envelope adapter: round-trip identity + wire-format tolerance."""

import json

from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, CHANGE_SCHEMA_V2
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas
from ccdb_data_pipeline_spark.sources.debezium import (
    from_debezium,
    from_debezium_v2,
    to_debezium,
)


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy("lsn").collect()]


def test_roundtrip_identity_on_generated_binlog(spark):
    # includes the generator's edge content: malformed null-key rows, null
    # ts, empty strings, UTF-8, whitespace mess, deletes
    pdf = gen_changes_pandas(start_lsn=0, n_events=500, n_convs=40)
    src = spark.createDataFrame(pdf, CHANGE_SCHEMA)
    back = from_debezium(to_debezium(src))
    cols = [f.name for f in CHANGE_SCHEMA.fields]
    assert _sorted_rows(back, cols) == _sorted_rows(src, cols)
    assert back.schema == CHANGE_SCHEMA or [
        (f.name, f.dataType) for f in back.schema.fields
    ] == [(f.name, f.dataType) for f in CHANGE_SCHEMA.fields]


def test_roundtrip_v2_schema_evolution(spark):
    pdf = gen_changes_pandas(start_lsn=1000, n_events=300, n_convs=30, v2=True)
    src = spark.createDataFrame(pdf, CHANGE_SCHEMA_V2)
    back = from_debezium_v2(to_debezium(src, CHANGE_SCHEMA_V2))
    cols = [f.name for f in CHANGE_SCHEMA_V2.fields]
    assert _sorted_rows(back, cols) == _sorted_rows(src, cols)


def test_accepts_bare_payload_and_snapshot_reads(spark):
    # schemas.enable=false wire shape (no {"payload": ...} wrapper), op 'r'
    bare = {
        "op": "r",
        "before": None,
        "after": {
            "conv_id": "c1",
            "turn_idx": 3,
            "role": "user",
            "text": "hello",
            "tool": None,
            "ts": 1735689600000000,
        },
        "source": {"lsn": 7},
        "ts_ms": 1735689600000,
    }
    wrapped = {"payload": dict(bare, op="d", before=bare["after"], after=None,
                               source={"lsn": 8})}
    raw = spark.createDataFrame(
        [(json.dumps(bare),), (json.dumps(wrapped),)], "value string"
    )
    out = {r["lsn"]: r for r in from_debezium(raw).collect()}
    assert out[7]["op"] == "I" and out[7]["conv_id"] == "c1"
    assert out[7]["ts"].isoformat().startswith("2025-01-01")
    assert out[8]["op"] == "D" and out[8]["turn_idx"] == 3


def test_garbage_records_become_malformed_rows(spark):
    raw = spark.createDataFrame([("not json",), ("{}",)], "value string")
    rows = from_debezium(raw).collect()
    assert len(rows) == 2
    assert all(r["conv_id"] is None and r["op"] is None for r in rows)


def test_parse_is_jvm_only(spark):
    raw = to_debezium(
        spark.createDataFrame(
            gen_changes_pandas(start_lsn=0, n_events=50, n_convs=5), CHANGE_SCHEMA
        )
    )
    plan = from_debezium(raw)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
