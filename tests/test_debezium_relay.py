"""CDC relay: table A's change feed, emitted as Debezium envelopes, replays
into table B and reproduces A exactly — both wire directions compose."""

import pandas as pd

from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.debezium import changes_as_debezium, from_debezium


def _batch(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    return spark.createDataFrame(pdf, CHANGE_SCHEMA)


def test_feed_relay_reproduces_source_table(spark, tmp_path):
    TS1, TS2 = pd.Timestamp("2025-01-01"), pd.Timestamp("2025-01-02")
    a = SnapshotParquetTable(
        spark, str(tmp_path / "a"), TableSpec(num_buckets=2, merge_mode="mor")
    )
    a.create(TRANSCRIPT_SCHEMA)
    v0 = a.current_version()
    a.merge(
        _batch(
            spark,
            [
                (1, "I", "x", 0, "user", "x0", None, TS1),
                (2, "I", "y", 0, "user", "y0", None, TS1),
                (3, "I", "z", 0, "user", "z0", None, TS1),
            ],
        ),
        batch_id=0,
    )
    v1 = a.current_version()
    a.merge(
        _batch(
            spark,
            [
                (4, "U", "x", 0, "user", "x1", None, TS2),  # update -> u envelope
                (5, "D", "y", 0, None, None, None, TS2),    # delete -> d envelope
                (6, "I", "w", 0, "user", "w0", None, TS2),  # insert -> c envelope
            ],
        ),
        batch_id=1,
    )
    v2 = a.current_version()

    b = SnapshotParquetTable(
        spark, str(tmp_path / "b"), TableSpec(num_buckets=2, merge_mode="mor")
    )
    b.create(TRANSCRIPT_SCHEMA)
    for i, (lo, hi) in enumerate([(v0, v1), (v1, v2)]):
        feed = changes_as_debezium(a, lo, hi)
        b.merge(from_debezium(feed), batch_id=i)

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    got = sorted(tuple(r) for r in b.read().select(*cols).collect())
    want = sorted(tuple(r) for r in a.read().select(*cols).collect())
    assert got == want
    assert {r["conv_id"] for r in b.read().collect()} == {"x", "z", "w"}

    # replaying the same window is idempotent under (ts, lsn) dominance
    b.merge(from_debezium(changes_as_debezium(a, v1, v2)), batch_id=2)
    again = sorted(tuple(r) for r in b.read().select(*cols).collect())
    assert again == want


def test_envelope_ops_and_images(spark, tmp_path):
    TS1, TS2 = pd.Timestamp("2025-01-01"), pd.Timestamp("2025-01-02")
    a = SnapshotParquetTable(
        spark, str(tmp_path / "a"), TableSpec(num_buckets=2, merge_mode="mor")
    )
    a.create(TRANSCRIPT_SCHEMA)
    a.merge(_batch(spark, [(1, "I", "x", 0, "user", "x0", None, TS1)]), batch_id=0)
    v1 = a.current_version()
    a.merge(_batch(spark, [(2, "U", "x", 0, "user", "x1", None, TS2)]), batch_id=1)

    import json

    env = [json.loads(r["value"]) for r in changes_as_debezium(a, v1).collect()]
    assert len(env) == 1
    p = env[0]["payload"]
    assert p["op"] == "u"
    assert p["before"]["text"] == "x0" and p["after"]["text"] == "x1"
    assert p["source"]["lsn"] == a.current_version()
