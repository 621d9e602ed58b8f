"""Property-based replay equivalence (hypothesis).

The fixed-seed suites cover the generator's curated edge mix; this suite
lets hypothesis search the semantics space directly: arbitrary op/key/ts
streams — ts ties, null ts, duplicate keys in one batch, deletes before
inserts, "" and whitespace-mangled payloads, malformed null keys, arbitrary
batch boundaries — must always replay to the sequential oracle's state,
in both CoW and MoR modes. Shrinking gives a minimal counterexample if a
dominance rule ever regresses.
"""

from datetime import datetime, timedelta

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec
from tests.oracle import assert_tables_equal, replay, table_to_pandas

BASE = datetime(2025, 6, 1)

# tiny pools force collisions: same key hit by many events, ts ties decided
# by lsn, deletes racing updates
_conv = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
_turn = st.integers(min_value=0, max_value=2)
_op = st.sampled_from(["I", "U", "D"])
_ts = st.one_of(
    st.none(),
    st.integers(min_value=0, max_value=5).map(lambda s: BASE + timedelta(seconds=s)),
)
_text = st.one_of(
    st.none(),
    st.sampled_from(["", " ", "x", "  a  b ", "tab\there", "same text"]),
)
_role = st.one_of(st.none(), st.sampled_from(["", "user", "assistant"]))

_event = st.fixed_dictionaries(
    {"op": _op, "conv_id": _conv, "turn_idx": _turn, "role": _role,
     "text": _text, "tool": st.none(), "ts": _ts}
)
_stream = st.lists(_event, min_size=1, max_size=25)
_mode = st.sampled_from(["cow", "mor"])
_nbatches = st.integers(min_value=1, max_value=3)


def _frame(events):
    rows = [dict(e, lsn=i + 1) for i, e in enumerate(events)]
    pdf = pd.DataFrame(rows, columns=CHANGE_SCHEMA.fieldNames())
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return pdf


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_stream, mode=_mode, nb=_nbatches, data=st.data())
def test_any_stream_replays_to_oracle(sess, tmp_path_factory, events, mode, nb, data):
    import numpy as np

    changes = _frame(events)
    root = tmp_path_factory.mktemp("prop")
    t = SnapshotParquetTable(
        sess, str(root / "t"), TableSpec(num_buckets=4, merge_mode=mode)
    )
    t.create(TRANSCRIPT_SCHEMA)
    seed = pd.DataFrame(
        [{"conv_id": "a", "turn_idx": 0, "role": "user", "text": "seed",
          "tool": None, "ts": BASE - timedelta(days=1)}]
    )
    bootstrap_seed(t, sess.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    for i, part in enumerate(np.array_split(changes, nb)):
        apply_changes(t, sess.createDataFrame(part, CHANGE_SCHEMA), batch_id=i)
    if mode == "mor" and data.draw(st.booleans(), label="compact"):
        t.compact(drop_tombstones=False)
    assert_tables_equal(table_to_pandas(t.read()), replay(seed, [changes]))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_stream, nb=_nbatches, data=st.data())
def test_any_stream_through_facade_writer_replays_to_oracle(
    sess, tmp_path_factory, events, nb, data
):
    """Round 4: the LWW search driven through the DataSource facade WRITER
    (raw dominance rows, write-side normalization, malformed drop) — same
    sequential pandas oracle, arbitrary boundaries, optional compaction."""
    import numpy as np

    from ccdb_data_pipeline_spark.plans.datasource import LakeWriter

    changes = _frame(events)
    root = tmp_path_factory.mktemp("facprop")
    t = SnapshotParquetTable(
        sess, str(root / "t"), TableSpec(num_buckets=4, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    seed = pd.DataFrame(
        [{"conv_id": "a", "turn_idx": 0, "role": "user", "text": "seed",
          "tool": None, "ts": BASE - timedelta(days=1)}]
    )
    bootstrap_seed(t, sess.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    for i, part in enumerate(np.array_split(changes, nb)):
        df = sess.createDataFrame(part, CHANGE_SCHEMA)
        w = LakeWriter(
            {"path": t.root, "batchid": str(i)}, overwrite=False,
            batch_schema=df.schema,
        )
        w.commit([w.write(iter(df.toArrow().to_batches()))])
        if data.draw(st.booleans(), label=f"compact_{i}"):
            t.refresh().compact(drop_tombstones=False)
    assert_tables_equal(table_to_pandas(t.refresh().read()), replay(seed, [changes]))
