"""Property-based sequence-group semantics (hypothesis).

The curated suite (test_sequence_groups.py) pins the headline behaviors;
this one lets hypothesis search the space directly: arbitrary mixes of full
images / deletes / patches with colliding keys, seq ties, NULL seqs, NULL
group members, out-of-order event times, arbitrary batch boundaries, and
optional mid-stream compaction must always resolve to the documented argmax
oracle — the batch-boundary-invariance claim as a searched property, not a
fixed example."""

from datetime import timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_sequence_groups import (
    T0,
    _batch,
    _read_state,
    _replay,
    _table,
)

# tiny pools force collisions: one key hit by many writers, equal seqs
# (lsn tie-break), null seqs (group untouched), null members (atomic null
# overwrite by a winning writer)
_conv = st.sampled_from(["a", "b"])
_turn = st.integers(min_value=0, max_value=1)
_op = st.sampled_from(["I", "U", "D", "P", "P"])  # patches over-weighted
_seq = st.one_of(st.none(), st.integers(min_value=0, max_value=3))
_role = st.one_of(st.none(), st.sampled_from(["user", "assistant"]))
_tool = st.one_of(st.none(), st.sampled_from(["calc"]))
_text = st.one_of(st.none(), st.sampled_from(["x", "yy"]))
_mins = st.integers(min_value=0, max_value=5)

_event = st.tuples(_op, _conv, _turn, _role, _text, _tool, _seq, _mins)
_stream = st.lists(_event, min_size=1, max_size=20)


def _rows(events):
    out = []
    for i, (op, conv, turn, role, text, tool, seq, m) in enumerate(events):
        if op == "D":
            role = text = tool = seq = None
        out.append((i + 1, op, conv, turn, role, text, tool, seq, m))
    return out


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_stream, nb=st.integers(min_value=1, max_value=3), data=st.data())
def test_any_seqgroup_stream_resolves_to_argmax_oracle(
    sess, tmp_path_factory, events, nb, data
):
    rows = _rows(events)
    root = tmp_path_factory.mktemp("sgprop")
    t = _table(sess, root, name="t")
    cuts = sorted(
        data.draw(
            st.sets(st.integers(min_value=1, max_value=len(rows)), max_size=nb - 1),
            label="cuts",
        )
    ) + [len(rows)]
    lo = 0
    for b, hi in enumerate(cuts):
        if hi > lo:
            t.merge_events(_batch(sess, rows[lo:hi]), batch_id=b)
            lo = hi
        if data.draw(st.booleans(), label=f"compact_{b}"):
            t.compact(drop_tombstones=False)
    got = _read_state(t)
    exp = _replay(rows)
    assert set(got) == set(exp)
    for k in exp:
        for c in ("role", "text", "tool", "meta_seq", "ts"):
            assert got[k][c] == exp[k][c], (k, c, got[k], exp[k])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_stream, nb=st.integers(min_value=1, max_value=3), data=st.data())
def test_any_seqgroup_stream_through_facade_writer(
    sess, tmp_path_factory, events, nb, data
):
    """Round 4: the same argmax search driven through the DataSource facade
    WRITER (per-engine patch projection + within-task _fold_patches_arrow,
    seq groups from manifest engine params) instead of merge_events —
    arbitrary streams, boundaries, and compaction folding facade deltas
    must hit the identical oracle."""
    from ccdb_data_pipeline_spark.plans.datasource import LakeWriter

    rows = _rows(events)
    root = tmp_path_factory.mktemp("sgfac")
    t = _table(sess, root, name="t")
    cuts = sorted(
        data.draw(
            st.sets(st.integers(min_value=1, max_value=len(rows)), max_size=nb - 1),
            label="cuts",
        )
    ) + [len(rows)]
    lo = 0
    for b, hi in enumerate(cuts):
        if hi > lo:
            df = _batch(sess, rows[lo:hi])
            w = LakeWriter(
                {"path": t.root, "batchid": str(b)}, overwrite=False,
                batch_schema=df.schema,
            )
            w.commit([w.write(iter(df.toArrow().to_batches()))])
            lo = hi
        if data.draw(st.booleans(), label=f"compact_{b}"):
            t.refresh().compact(drop_tombstones=False)
    got = _read_state(t.refresh())
    exp = _replay(rows)
    assert set(got) == set(exp)
    for k in exp:
        for c in ("role", "text", "tool", "meta_seq", "ts"):
            assert got[k][c] == exp[k][c], (k, c, got[k], exp[k])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_stream, nb=st.integers(min_value=1, max_value=3), data=st.data())
def test_facade_read_equals_engine_read_seqgroups(
    sess, tmp_path_factory, events, nb, data
):
    """Round 4 (read direction): engine-written seq-group streams read back
    through the facade's layered _fold_patches_arrow must equal the engine
    read — the composition-closure claim exercised at the READ boundary."""
    from ccdb_data_pipeline_spark.plans.datasource import LakeReader, _read_bucket

    rows = _rows(events)
    root = tmp_path_factory.mktemp("sgfr")
    t = _table(sess, root, name="t")
    cuts = sorted(
        data.draw(
            st.sets(st.integers(min_value=1, max_value=len(rows)), max_size=nb - 1),
            label="cuts",
        )
    ) + [len(rows)]
    lo = 0
    for b, hi in enumerate(cuts):
        if hi > lo:
            t.merge_events(_batch(sess, rows[lo:hi]), batch_id=b)
            lo = hi
        if data.draw(st.booleans(), label=f"compact_{b}"):
            t.compact(drop_tombstones=False)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "meta_seq"]
    want = sorted(tuple(r[c] for c in cols) for r in t.read().collect())
    r = LakeReader({"path": t.root})
    got = []
    for part in r.partitions():
        if part.entries:
            for bch in _read_bucket(r.meta, part):
                got.extend(bch.to_pylist())
    assert sorted(tuple(x[c] for c in cols) for x in got) == want
