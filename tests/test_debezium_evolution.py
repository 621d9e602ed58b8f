"""Mid-stream schema evolution on the Debezium wire: v1 and v2 envelopes
interleaved in one topic parse under the v2 schema with schema-union
semantics (missing column -> null, int32 -> int64 widen)."""

from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, CHANGE_SCHEMA_V2
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas
from ccdb_data_pipeline_spark.sources.debezium import from_debezium_v2, to_debezium


def test_mixed_v1_v2_envelopes_parse_with_union_semantics(spark):
    v1 = spark.createDataFrame(
        gen_changes_pandas(start_lsn=0, n_events=200, n_convs=20), CHANGE_SCHEMA
    )
    v2 = spark.createDataFrame(
        gen_changes_pandas(start_lsn=200, n_events=200, n_convs=20, v2=True),
        CHANGE_SCHEMA_V2,
    )
    topic = to_debezium(v1, CHANGE_SCHEMA).unionByName(to_debezium(v2, CHANGE_SCHEMA_V2))

    parsed = from_debezium_v2(topic)
    assert [f.name for f in parsed.schema.fields] == [
        f.name for f in CHANGE_SCHEMA_V2.fields
    ]
    assert dict(parsed.dtypes)["turn_idx"] == "bigint"  # widened for v1 rows too

    n_v1 = parsed.filter((F.col("lsn") < 200)).count()
    assert n_v1 == 200
    # v1 rows: tool_args unknown -> null; v2 rows keep theirs
    assert parsed.filter((F.col("lsn") < 200) & F.col("tool_args").isNotNull()).count() == 0
    v2_args = parsed.filter((F.col("lsn") >= 200) & F.col("tool_args").isNotNull()).count()
    v2_src = v2.filter(F.col("tool_args").isNotNull()).count()
    assert v2_args == v2_src > 0
    # payload integrity across the mixed parse (spot: per-lsn text equality)
    src_text = {r["lsn"]: r["text"] for r in v1.collect()}
    got_text = {r["lsn"]: r["text"] for r in parsed.filter("lsn < 200").collect()}
    assert got_text == src_text
