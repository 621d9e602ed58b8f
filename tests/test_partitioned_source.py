"""Partitioned-topic LSN packing: bijection, per-key monotonicity, e2e apply."""

import pandas as pd
import pytest

from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.partitioned import pack_lsn, unpack


def test_pack_unpack_bijection_and_order(spark):
    rows = [(p, s) for p in range(4) for s in range(100)]
    df = spark.createDataFrame(rows, "partition_id int, seq long")
    packed = pack_lsn(df, drop=False)
    back = unpack(packed.select("lsn"))
    got = {(r["partition_id"], r["seq"]) for r in back.collect()}
    assert got == set(rows)
    # uniqueness + per-partition monotonicity
    lsns = [r["lsn"] for r in packed.orderBy("partition_id", "seq").collect()]
    assert len(set(lsns)) == len(rows)
    per_part = {}
    for r in packed.collect():
        per_part.setdefault(r["partition_id"], []).append((r["seq"], r["lsn"]))
    for pairs in per_part.values():
        pairs.sort()
        assert all(a[1] < b[1] for a, b in zip(pairs, pairs[1:]))


def test_out_of_range_partition_fails_loudly(spark):
    df = spark.createDataFrame([(5000, 1)], "partition_id int, seq long")
    with pytest.raises(Exception, match="out of range"):
        pack_lsn(df).collect()


def test_partitioned_feed_applies_with_lww(spark, tmp_path):
    # key 'a' lives on partition 0, 'b' on partition 1; same ts ->
    # the packed-LSN tie-break decides within each key's own partition order
    ev = pd.DataFrame(
        {
            "partition_id": [0, 0, 1, 1],
            "seq": [1, 2, 1, 2],
            "op": ["I", "U", "I", "U"],
            "conv_id": ["a", "a", "b", "b"],
            "turn_idx": [0, 0, 0, 0],
            "role": ["user"] * 4,
            "text": ["a1", "a2", "b1", "b2"],
            "tool": [None] * 4,
            "ts": pd.Timestamp("2025-01-01"),
        }
    )
    raw = spark.createDataFrame(
        ev,
        "partition_id int, seq long, op string, conv_id string, turn_idx int, "
        "role string, text string, tool string, ts timestamp",
    )
    changes = pack_lsn(raw).select([f.name for f in CHANGE_SCHEMA.fields])
    t = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=2, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    t.merge(changes, batch_id=0)
    got = {r["conv_id"]: r["text"] for r in t.read().collect()}
    assert got == {"a": "a2", "b": "b2"}  # seq 2 wins per key despite equal ts
