"""SCD Type-2 history materialization (operators/scd.py)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.operators.scd import scd2_history, snapshot_as_of


def _ts(d, h=0):
    return datetime(2024, 1, d, h)


@pytest.fixture(scope="module")
def changes(spark):
    rows = [
        # key A: insert -> update -> update (open-ended current version)
        ("A", _ts(1), 1, "U", 10.0),
        ("A", _ts(3), 2, "U", 20.0),
        ("A", _ts(5), 3, "U", 30.0),
        # key B: insert -> delete (tombstone closes the history)
        ("B", _ts(2), 4, "U", 1.0),
        ("B", _ts(4), 5, "D", None),
        # key C: single insert
        ("C", _ts(6), 6, "U", 7.0),
    ]
    return spark.createDataFrame(
        rows, "k string, ts timestamp, lsn long, op string, v double"
    )


def test_versions_and_intervals(changes):
    h = scd2_history(changes, ["k"], ts_col="ts", lsn_col="lsn", op_col="op")
    got = {
        (r["k"], r["version_no"]): (r["valid_from"], r["valid_to"], r["is_current"])
        for r in h.collect()
    }
    assert got[("A", 1)] == (_ts(1), _ts(3), False)
    assert got[("A", 2)] == (_ts(3), _ts(5), False)
    assert got[("A", 3)] == (_ts(5), None, True)
    # delete is a terminal tombstone: closes its own interval, never current
    assert got[("B", 1)] == (_ts(2), _ts(4), False)
    assert got[("B", 2)] == (_ts(4), _ts(4), False)
    assert got[("C", 1)] == (_ts(6), None, True)
    # exactly one current version per live key, none for deleted keys
    cur = h.filter("is_current").groupBy("k").count().collect()
    assert {r["k"]: r["count"] for r in cur} == {"A": 1, "C": 1}


def test_as_of_covers_the_right_version(changes):
    h = scd2_history(changes, ["k"], ts_col="ts", lsn_col="lsn", op_col="op")
    # Jan 4 noon: A is on version 2, B already deleted, C not yet born
    snap = snapshot_as_of(h, ["k"], _ts(4, 12))
    got = {r["k"]: (r["version_no"], r["v"]) for r in snap.collect()}
    assert got == {"A": (2, 20.0)}
    # after everything: current state only
    snap2 = snapshot_as_of(h, ["k"], _ts(30))
    assert {r["k"]: r["v"] for r in snap2.collect()} == {"A": 30.0, "C": 7.0}


def test_single_window_node(changes):
    """lead + row_number over the same (partition, order) spec must collapse
    into ONE Window physical node — one sort, one shuffle."""
    h = scd2_history(changes, ["k"], ts_col="ts", lsn_col="lsn", op_col="op")
    plan = h._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1, plan


def test_without_op_col_every_tail_is_current(changes):
    h = scd2_history(changes.drop("op"), ["k"], ts_col="ts", lsn_col="lsn")
    cur = {r["k"] for r in h.filter("is_current").collect()}
    assert cur == {"A", "B", "C"}
