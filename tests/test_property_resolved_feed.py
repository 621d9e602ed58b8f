"""Property search for the RESOLVED change feed (round-5): arbitrary
aggregation-engine op/key streams with arbitrary batch boundaries and
optional mid-stream compaction — a mirror built by applying the feed's
resolved U/D rows in commit order must equal the engine read at EVERY
committed version (prefix-by-prefix, not just the head). This is the
replication contract the feed exists for: the mirror sees only public
feed rows, never engine internals. Sibling searches:
tests/test_property_engines.py (engine folds), test_property_replay.py
(LWW), test_property_seqgroups.py (patch)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.plans.datasource import register
from tests.test_agg_merge import (
    _batch as _agg_batch,
    _ev as _agg_ev,
    _read_state as _agg_read,
    _table as _agg_table,
)

_uid = st.sampled_from([1, 2])
_aop = st.sampled_from(["U", "U", "D"])
_spend = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
_hilo = st.one_of(st.none(), st.integers(min_value=0, max_value=9).map(float))
_tag = st.one_of(st.none(), st.sampled_from(["x", "y"]))
_agg_event = st.tuples(_uid, _aop, _spend, _hilo, _hilo, _tag)
_agg_stream = st.lists(_agg_event, min_size=1, max_size=14)


@pytest.fixture(scope="module")
def sess(spark):
    register(spark)
    return spark


def _mirror_states(feed_rows):
    """Apply resolved feed rows in commit order; yield (version, state)
    after each commit's rows — the replication consumer's view."""
    state: dict = {}
    out = []
    by_ver: dict[int, list] = {}
    for r in feed_rows:
        by_ver.setdefault(int(r["_commit_version"]), []).append(r)
    for v in sorted(by_ver):
        for r in by_ver[v]:
            if r["_change_type"] == "delete":
                state.pop(r["uid"], None)
            else:
                state[r["uid"]] = {
                    "spend": r["spend"], "hi": r["hi"], "lo": r["lo"],
                    "tag": r["tag"], "ts": r["ts"],
                }
        out.append((v, {k: dict(s) for k, s in state.items()}))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_agg_stream, nb=st.integers(min_value=1, max_value=3), data=st.data())
def test_resolved_feed_mirror_equals_engine_at_every_version(
    sess, tmp_path_factory, events, nb, data
):
    rows = [
        _agg_ev(uid, i + 1, op, spend=spend, hi=hi, lo=lo, tag=tag)
        for i, (uid, op, spend, hi, lo, tag) in enumerate(events)
    ]
    root = tmp_path_factory.mktemp("feedprop")
    t = _agg_table(sess, root, name="t")
    cuts = sorted(
        data.draw(
            st.sets(st.integers(min_value=1, max_value=len(rows)), max_size=nb - 1),
            label="cuts",
        )
    ) + [len(rows)]
    lo_i = 0
    for b, hi_i in enumerate(cuts):
        if hi_i > lo_i:
            t.merge_events(_agg_batch(sess, rows[lo_i:hi_i]), batch_id=b)
            lo_i = hi_i
        if data.draw(st.booleans(), label=f"compact_{b}"):
            t.compact(drop_tombstones=False)
    feed = (
        sess.read.format("transcript_changes")
        .option("startingVersion", 0)
        .load(t.root)
        .collect()
    )
    states = _mirror_states(feed)
    assert states, "at least one merge commit must emit feed rows"
    for v, mirror in states:
        want = _agg_read_at(t, v)
        assert mirror == want, (v, mirror, want)
    # the final mirror equals the head read
    assert states[-1][1] == _agg_read(t.refresh())


def _agg_read_at(t, version):
    out = {}
    for r in t.refresh().read(version=version).collect():
        out[r["uid"]] = {
            "spend": r["spend"], "hi": r["hi"], "lo": r["lo"],
            "tag": r["tag"], "ts": r["ts"],
        }
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_agg_stream, data=st.data())
def test_resolved_feed_is_marker_minimal(sess, tmp_path_factory, events, data):
    """No wasted rows: a feed row's key must have CHANGED at its commit —
    re-reading the resolved state at (v-1) and v, the emitted key's
    dominance marker differs (carry-over suppression is the thing that
    keeps resolved-feed cost O(changed keys), so pin it)."""
    rows = [
        _agg_ev(uid, i + 1, op, spend=spend, hi=hi, lo=lo, tag=tag)
        for i, (uid, op, spend, hi, lo, tag) in enumerate(events)
    ]
    root = tmp_path_factory.mktemp("feedmin")
    t = _agg_table(sess, root, name="t")
    half = max(1, len(rows) // 2)
    t.merge_events(_agg_batch(sess, rows[:half]), batch_id=0)
    if rows[half:]:
        t.merge_events(_agg_batch(sess, rows[half:]), batch_id=1)
    feed = (
        sess.read.format("transcript_changes")
        .option("startingVersion", 0)
        .load(t.root)
    )
    # per (version, key): at most ONE row, and only for keys whose lsn
    # marker moved at that version
    dup = (
        feed.groupBy("_commit_version", "uid")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter("n > 1")
        .count()
    )
    assert dup == 0
    rows_by = {}
    for r in feed.collect():
        rows_by[(int(r["_commit_version"]), r["uid"])] = r["_change_type"]
    # CONTAINMENT both ways, with the one documented asymmetry: the feed
    # may additionally emit a delete for a key whose TOMBSTONE marker
    # moved (already-dead key re-deleted — idempotent for any mirror);
    # the visible-state engine diff cannot see those. Every visible
    # change the engine reports must be in the feed, and every feed
    # UPSERT must be a visible engine change.
    for v in sorted({v for v, _ in rows_by}):
        eng_rows = t.table_changes(v - 1, v).filter(
            F.col("_change_type").isin("insert", "delete", "update_postimage")
        ).collect()
        eng_keys = {r["uid"] for r in eng_rows}
        feed_keys = {k for (vv, k) in rows_by if vv == v}
        feed_upserts = {
            k for (vv, k), ct in rows_by.items() if vv == v and ct == "upsert"
        }
        assert eng_keys <= feed_keys, (v, eng_keys, feed_keys)
        assert feed_upserts <= eng_keys, (v, feed_upserts, eng_keys)
