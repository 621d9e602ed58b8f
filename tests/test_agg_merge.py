"""Aggregation merge engine (TableSpec.agg_spec) through the real MoR lake
path: change events FOLD INTO the stored row (sum/min/max/last per column),
a delete RESETS the key. Verified against an independent sequential replay,
across batches, deletes, resurrection, compaction, the raw (unfused) write
path, and the standalone operators/aggmerge.py resolve."""

import datetime as dt
import math
import os

import pytest
from pyspark.sql import types as T

from ccdb_data_pipeline_spark.operators.aggmerge import resolve_aggregate
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import TableSpec

T0 = dt.datetime(2025, 1, 1)

AGG_SPEC = {"spend": "sum", "hi": "max", "lo": "min", "tag": "last"}

SCHEMA = T.StructType(
    [
        T.StructField("uid", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("spend", T.LongType()),
        T.StructField("hi", T.DoubleType()),
        T.StructField("lo", T.DoubleType()),
        T.StructField("tag", T.StringType()),
    ]
)

EV_SCHEMA = T.StructType(
    list(SCHEMA.fields)
    + [T.StructField("lsn", T.LongType()), T.StructField("op", T.StringType())]
)


def _table(spark, tmp_path, name="t", **spec_kw):
    kw = dict(
        key_cols=("uid",),
        bucket_col="uid",
        num_buckets=4,
        merge_mode="mor",
        agg_spec=AGG_SPEC,
    )
    kw.update(spec_kw)
    spec = TableSpec(**kw)
    t = SnapshotParquetTable(spark, os.path.join(str(tmp_path), name), spec)
    t.create(SCHEMA)
    return t


def _ev(uid, lsn, op, spend=None, hi=None, lo=None, tag=None):
    return (uid, T0 + dt.timedelta(minutes=lsn), spend, hi, lo, tag, lsn, op)


def _batch(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


def _replay(batches):
    """Independent oracle: strict sequential per-key fold in LSN order."""
    state = {}
    for rows in batches:
        for uid, ts, spend, hi, lo, tag, lsn, op in sorted(rows, key=lambda r: r[6]):
            if op == "D":
                state.pop(uid, None)
                continue
            acc = state.setdefault(
                uid, {"spend": None, "hi": None, "lo": None, "tag": None, "ts": None}
            )
            if spend is not None:
                acc["spend"] = spend if acc["spend"] is None else acc["spend"] + spend
            if hi is not None:
                acc["hi"] = hi if acc["hi"] is None else max(acc["hi"], hi)
            if lo is not None:
                acc["lo"] = lo if acc["lo"] is None else min(acc["lo"], lo)
            if tag is not None:
                acc["tag"] = tag
            if ts is not None:
                acc["ts"] = ts  # default 'last'
    return state


def _read_state(t):
    out = {}
    for r in t.read().collect():
        out[r["uid"]] = {
            "spend": r["spend"],
            "hi": r["hi"],
            "lo": r["lo"],
            "tag": r["tag"],
            "ts": r["ts"],
        }
    return out


def _assert_same(got, want):
    assert set(got) == set(want)
    for k in want:
        for c, v in want[k].items():
            g = got[k][c]
            if isinstance(v, float):
                assert g is not None and math.isclose(g, v), (k, c, g, v)
            else:
                assert g == v, (k, c, g, v)


BATCHES = [
    [
        _ev(1, 1, "I", spend=10, hi=1.0, lo=5.0, tag="a"),
        _ev(1, 2, "U", spend=5, hi=3.0, lo=2.0),
        _ev(2, 3, "I", spend=100, hi=9.0, lo=9.0, tag="x"),
        _ev(3, 4, "I", spend=7, hi=1.0, lo=1.0, tag="z"),
        _ev(3, 5, "D"),  # ends deleted
        _ev(4, 6, "I"),  # all-null contribution: live key, NULL accumulators
    ],
    [
        _ev(1, 7, "U", spend=1, hi=10.0, lo=0.5, tag="b"),
        _ev(2, 8, "D"),
        _ev(2, 9, "I", spend=3, hi=2.0, lo=2.0, tag="y"),  # restart in-batch
        _ev(3, 10, "U", spend=50, hi=4.0, lo=4.0),  # resurrect across batches
    ],
    [
        _ev(2, 11, "U", spend=2, hi=1.0, lo=1.0),
        _ev(4, 12, "U", spend=8, tag="w"),
        _ev(1, 13, "D"),  # delete a twice-written key
    ],
]


def test_agg_merge_matches_replay_across_batches(spark, tmp_path):
    t = _table(spark, tmp_path)
    for i, rows in enumerate(BATCHES):
        t.merge_events(_batch(spark, rows), i)
        _assert_same(_read_state(t), _replay(BATCHES[: i + 1]))


def test_agg_merge_compaction_preserves_state(spark, tmp_path):
    t = _table(spark, tmp_path)
    for i, rows in enumerate(BATCHES[:2]):
        t.merge_events(_batch(spark, rows), i)
    t.compact()
    _assert_same(_read_state(t), _replay(BATCHES[:2]))
    # folding continues correctly on the compacted base
    t.merge_events(_batch(spark, BATCHES[2]), 2)
    _assert_same(_read_state(t), _replay(BATCHES))
    # tombstone reclaim doesn't resurrect uid=1 (deleted in batch 2)
    t.compact(only_dirty=False, drop_tombstones=True)
    _assert_same(_read_state(t), _replay(BATCHES))


def test_agg_merge_raw_write_path_same_result(spark, tmp_path):
    """write_path='raw' appends single-event rows; the read-time merge is
    closed over that form — same final state as the fused fold."""
    t = _table(spark, tmp_path, name="raw", dedupe_on_write=False)
    for i, rows in enumerate(BATCHES):
        t.merge_events(_batch(spark, rows), i)
    _assert_same(_read_state(t), _replay(BATCHES))
    t.compact()
    _assert_same(_read_state(t), _replay(BATCHES))


def test_agg_merge_replay_is_idempotent(spark, tmp_path):
    t = _table(spark, tmp_path)
    for i, rows in enumerate(BATCHES):
        t.merge_events(_batch(spark, rows), i)
    # crash-replay: re-applying an already-committed batch is a no-op
    stats = t.merge_events(_batch(spark, BATCHES[2]), 2)
    assert stats.skipped
    _assert_same(_read_state(t), _replay(BATCHES))


def test_agg_spec_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="mor"):
        _table(spark, tmp_path, name="v1", merge_mode="cow")
    with pytest.raises(ValueError, match="unsupported"):
        spec = TableSpec(
            key_cols=("uid",), bucket_col="uid", merge_mode="mor",
            agg_spec={"spend": "avg"},
        )
        SnapshotParquetTable(spark, os.path.join(str(tmp_path), "v2"), spec).create(SCHEMA)
    with pytest.raises(ValueError, match="non-payload"):
        spec = TableSpec(
            key_cols=("uid",), bucket_col="uid", merge_mode="mor",
            agg_spec={"uid": "sum"},
        )
        SnapshotParquetTable(spark, os.path.join(str(tmp_path), "v3"), spec).create(SCHEMA)


def test_standalone_resolve_matches_replay(spark):
    flat = [r for rows in BATCHES for r in rows]
    df = _batch(spark, flat).drop("ts")
    out = resolve_aggregate(
        df, ["uid"], "lsn", {"spend": "sum", "hi": "max", "lo": "min", "tag": "last"}
    )
    got = {
        r["uid"]: {"spend": r["spend"], "hi": r["hi"], "lo": r["lo"], "tag": r["tag"]}
        for r in out.collect()
    }
    want = {
        k: {c: v for c, v in acc.items() if c != "ts"}
        for k, acc in _replay(BATCHES).items()
    }
    _assert_same(got, want)
