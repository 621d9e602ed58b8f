"""Property-based semantics for the aggregation and first-row merge
engines (hypothesis) — the two engines the curated replay suites pin with
fixed examples. Arbitrary op/key streams, duplicate keys per batch,
deletes racing claims, arbitrary batch boundaries, and optional mid-stream
compaction must always resolve to each engine's documented oracle:
sequential per-key fold with delete-reset (aggregation); minimum (ts, lsn)
non-delete writer with permanent-erase deletes (first-row). The sibling
searches are tests/test_property_replay.py (plain LWW) and
tests/test_property_seqgroups.py (partial-update) — the latter found a
real compaction bug, hence the symmetry here."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_agg_merge import (
    _batch as _agg_batch,
    _ev as _agg_ev,
    _read_state as _agg_read,
    _replay as _agg_replay,
    _table as _agg_table,
)
from tests.test_first_row import (
    _batch as _fr_batch,
    _read_state as _fr_read,
    _replay as _fr_replay,
    _table as _fr_table,
)


@pytest.fixture(scope="module")
def sess(spark):
    return spark


_uid = st.sampled_from([1, 2])
_aop = st.sampled_from(["U", "U", "D"])  # updates over-weighted
_spend = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
_hilo = st.one_of(st.none(), st.integers(min_value=0, max_value=9).map(float))
_tag = st.one_of(st.none(), st.sampled_from(["x", "y"]))
_agg_event = st.tuples(_uid, _aop, _spend, _hilo, _hilo, _tag)
_agg_stream = st.lists(_agg_event, min_size=1, max_size=16)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_agg_stream, nb=st.integers(min_value=1, max_value=3), data=st.data())
def test_any_agg_stream_folds_to_sequential_oracle(
    sess, tmp_path_factory, events, nb, data
):
    rows = [
        _agg_ev(uid, i + 1, op, spend=spend, hi=hi, lo=lo, tag=tag)
        for i, (uid, op, spend, hi, lo, tag) in enumerate(events)
    ]
    root = tmp_path_factory.mktemp("aggprop")
    t = _agg_table(sess, root, name="t")
    cuts = sorted(
        data.draw(
            st.sets(st.integers(min_value=1, max_value=len(rows)), max_size=nb - 1),
            label="cuts",
        )
    ) + [len(rows)]
    lo_i = 0
    batches = []
    for b, hi_i in enumerate(cuts):
        if hi_i > lo_i:
            batches.append(rows[lo_i:hi_i])
            t.merge_events(_agg_batch(sess, rows[lo_i:hi_i]), batch_id=b)
            lo_i = hi_i
        if data.draw(st.booleans(), label=f"compact_{b}"):
            t.compact(drop_tombstones=False)
    got = _agg_read(t)
    exp = _agg_replay(batches)
    assert set(got) == set(exp)
    for k in exp:
        for c, v in exp[k].items():
            assert got[k][c] == v, (k, c, got[k], exp[k])


_conv = st.sampled_from(["a", "b"])
_turn = st.integers(min_value=0, max_value=1)
_fop = st.sampled_from(["I", "I", "U", "D"])
_text = st.sampled_from(["t1", "t2", "t3"])
_mins = st.integers(min_value=0, max_value=5)
_fr_event = st.tuples(_fop, _conv, _turn, _text, _mins)
_fr_stream = st.lists(_fr_event, min_size=1, max_size=16)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_fr_stream, nb=st.integers(min_value=1, max_value=3), data=st.data())
def test_any_first_row_stream_resolves_to_min_pair_oracle(
    sess, tmp_path_factory, events, nb, data
):
    rows = [
        (i + 1, op, conv, turn, None if op == "D" else text, m)
        for i, (op, conv, turn, text, m) in enumerate(events)
    ]
    root = tmp_path_factory.mktemp("frprop")
    t = _fr_table(sess, root, name="t")
    cuts = sorted(
        data.draw(
            st.sets(st.integers(min_value=1, max_value=len(rows)), max_size=nb - 1),
            label="cuts",
        )
    ) + [len(rows)]
    lo_i = 0
    batches = []
    for b, hi_i in enumerate(cuts):
        if hi_i > lo_i:
            batches.append(rows[lo_i:hi_i])
            t.merge_events(_fr_batch(sess, rows[lo_i:hi_i]), batch_id=b)
            lo_i = hi_i
        if data.draw(st.booleans(), label=f"compact_{b}"):
            t.compact()  # first-row: tombstone reclaim auto-downgraded
    assert _fr_read(t) == _fr_replay(batches)


# ---------------------------------------------------------------------------
# Round 4: the SAME searches driven through the DataSource facade WRITER
# instead of merge_events — arbitrary streams, batch boundaries, and
# mid-stream compaction folding facade-written deltas must resolve to the
# identical sequential oracles (the facade's per-engine delta projection +
# within-task Arrow fold is a second implementation of the apply path; the
# property search is the strongest equivalence evidence we can run).


def _facade_apply_df(df, root, batch_id):
    from ccdb_data_pipeline_spark.plans.datasource import LakeWriter

    w = LakeWriter(
        {"path": root, "batchid": str(batch_id)}, overwrite=False,
        batch_schema=df.schema,
    )
    w.commit([w.write(iter(df.toArrow().to_batches()))])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_agg_stream, nb=st.integers(min_value=1, max_value=3), data=st.data())
def test_any_agg_stream_through_facade_writer(
    sess, tmp_path_factory, events, nb, data
):
    rows = [
        _agg_ev(uid, i + 1, op, spend=spend, hi=hi, lo=lo, tag=tag)
        for i, (uid, op, spend, hi, lo, tag) in enumerate(events)
    ]
    root = tmp_path_factory.mktemp("aggfac")
    t = _agg_table(sess, root, name="t")
    cuts = sorted(
        data.draw(
            st.sets(st.integers(min_value=1, max_value=len(rows)), max_size=nb - 1),
            label="cuts",
        )
    ) + [len(rows)]
    lo_i = 0
    batches = []
    for b, hi_i in enumerate(cuts):
        if hi_i > lo_i:
            batches.append(rows[lo_i:hi_i])
            _facade_apply_df(_agg_batch(sess, rows[lo_i:hi_i]), t.root, batch_id=b)
            lo_i = hi_i
        if data.draw(st.booleans(), label=f"compact_{b}"):
            t.refresh().compact(drop_tombstones=False)
    t.refresh()
    got = _agg_read(t)
    exp = _agg_replay(batches)
    assert set(got) == set(exp)
    for k in exp:
        for c, v in exp[k].items():
            assert got[k][c] == v, (k, c, got[k], exp[k])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_fr_stream, nb=st.integers(min_value=1, max_value=3), data=st.data())
def test_any_first_row_stream_through_facade_writer(
    sess, tmp_path_factory, events, nb, data
):
    rows = [
        (i + 1, op, conv, turn, None if op == "D" else text, m)
        for i, (op, conv, turn, text, m) in enumerate(events)
    ]
    root = tmp_path_factory.mktemp("frfac")
    t = _fr_table(sess, root, name="t")
    cuts = sorted(
        data.draw(
            st.sets(st.integers(min_value=1, max_value=len(rows)), max_size=nb - 1),
            label="cuts",
        )
    ) + [len(rows)]
    lo_i = 0
    batches = []
    for b, hi_i in enumerate(cuts):
        if hi_i > lo_i:
            batches.append(rows[lo_i:hi_i])
            _facade_apply_df(_fr_batch(sess, rows[lo_i:hi_i]), t.root, batch_id=b)
            lo_i = hi_i
        if data.draw(st.booleans(), label=f"compact_{b}"):
            t.refresh().compact()
    assert _fr_read(t.refresh()) == _fr_replay(batches)


# ---------------------------------------------------------------------------
# Round 4 (read direction): engine-written streams read back through the
# facade's per-engine Arrow resolvers (_fold_patches_arrow over layers;
# _merge_agg_arrow — new code this round) must equal the engine read.


def _facade_read_rows(root, cols):
    from ccdb_data_pipeline_spark.plans.datasource import LakeReader, _read_bucket

    r = LakeReader({"path": root})
    out = []
    for part in r.partitions():
        if part.entries:
            for b in _read_bucket(r.meta, part):
                out.extend(b.to_pylist())
    return sorted(tuple(x[c] for c in cols) for x in out)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_agg_stream, nb=st.integers(min_value=1, max_value=3), data=st.data())
def test_facade_read_equals_engine_read_agg(sess, tmp_path_factory, events, nb, data):
    rows = [
        _agg_ev(uid, i + 1, op, spend=spend, hi=hi, lo=lo, tag=tag)
        for i, (uid, op, spend, hi, lo, tag) in enumerate(events)
    ]
    root = tmp_path_factory.mktemp("aggfr")
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
    cols = ["uid", "spend", "hi", "lo", "tag"]
    want = sorted(tuple(r[c] for c in cols) for r in t.read().collect())
    assert _facade_read_rows(t.root, cols) == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_fr_stream, nb=st.integers(min_value=1, max_value=3), data=st.data())
def test_facade_read_equals_engine_read_first_row(
    sess, tmp_path_factory, events, nb, data
):
    rows = [
        (i + 1, op, conv, turn, None if op == "D" else text, m)
        for i, (op, conv, turn, text, m) in enumerate(events)
    ]
    root = tmp_path_factory.mktemp("frfr")
    t = _fr_table(sess, root, name="t")
    cuts = sorted(
        data.draw(
            st.sets(st.integers(min_value=1, max_value=len(rows)), max_size=nb - 1),
            label="cuts",
        )
    ) + [len(rows)]
    lo_i = 0
    for b, hi_i in enumerate(cuts):
        if hi_i > lo_i:
            t.merge_events(_fr_batch(sess, rows[lo_i:hi_i]), batch_id=b)
            lo_i = hi_i
        if data.draw(st.booleans(), label=f"compact_{b}"):
            t.compact()
    cols = ["conv_id", "turn_idx", "text"]
    want = sorted(tuple(r[c] for c in cols) for r in t.read().collect())
    assert _facade_read_rows(t.root, cols) == want
