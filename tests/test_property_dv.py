"""Property search: deletion-vector DELETE == tombstone DELETE on the
visible state, across random tables, predicates, compaction states, and
predicate forms (SQL string vs structured tuples with the metadata-drop
tier). The two paths differ only in later-event interplay (documented);
immediately after the delete their visible states must be identical."""

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
from ccdb_data_pipeline_spark.plans.dml import delete_where
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec

TS = dt.datetime(2030, 6, 1)

_roles = st.sampled_from(["user", "assistant", "tool"])
_row = st.tuples(
    st.integers(min_value=0, max_value=7),   # conv
    st.integers(min_value=0, max_value=3),   # turn
    _roles,
    st.one_of(st.none(), st.sampled_from(["x", "yy", "zzz"])),  # text
)
_pred_pool = [
    ("role = 'user'", [("role", "=", "user")]),
    ("role >= 't'", [("role", ">=", "t")]),
    ("role IN ('tool', 'assistant')", [("role", "in", ("tool", "assistant"))]),
    ("role = 'user' AND turn_idx < 2", [("role", "=", "user"), ("turn_idx", "<", 2)]),
]


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    rows=st.lists(_row, min_size=1, max_size=30, unique_by=lambda r: (r[0], r[1])),
    pred_i=st.integers(min_value=0, max_value=len(_pred_pool) - 1),
    compact=st.booleans(),
    structured=st.booleans(),
    data=st.data(),
)
def test_dv_equals_tombstones_everywhere(
    sess, tmp_path_factory, rows, pred_i, compact, structured, data
):
    base = tmp_path_factory.mktemp("dvprop")
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{c}" for c, _t, _r, _x in rows],
            "turn_idx": [t for _c, t, _r, _x in rows],
            "role": [r for _c, _t, r, _x in rows],
            "text": [x for _c, _t, _r, x in rows],
            "tool": [None] * len(rows),
            "ts": [TS - dt.timedelta(days=1)] * len(rows),
        }
    )
    sql_pred, tuples_pred = _pred_pool[pred_i]

    def build(name):
        t = SnapshotParquetTable(
            sess, str(base / name),
            TableSpec(num_buckets=4, merge_mode="mor", stats_cols=("role",)),
        )
        t.create(TRANSCRIPT_SCHEMA)
        bootstrap_seed(t, sess.createDataFrame(pdf, TRANSCRIPT_SCHEMA))
        if compact:
            t.compact(only_dirty=False)
        return t

    a, b = build("dv"), build("tomb")
    a.delete_where_dv(tuples_pred if structured else sql_pred, ts=TS)
    delete_where(b, sql_pred, ts=TS)

    def state(t):
        return sorted(
            (r["conv_id"], r["turn_idx"], r["role"], r["text"])
            for r in t.read().collect()
        )

    assert state(a) == state(b)
    assert a.count_fast() == a.read().count()
    # local oracle: surviving rows = those NOT matching
    want = sorted(
        (f"c{c}", t, r, x)
        for c, t, r, x in rows
        if not eval_pred(r, t, pred_i)
    )
    assert state(a) == want


def eval_pred(role, turn, pred_i):
    if pred_i == 0:
        return role == "user"
    if pred_i == 1:
        return role >= "t"
    if pred_i == 2:
        return role in ("tool", "assistant")
    return role == "user" and turn < 2
