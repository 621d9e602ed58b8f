"""Property search for the replica floor-bootstrap (snapshot-then-tail,
plans/replicate._bootstrap_floor): arbitrary LWW op streams, an arbitrary
expiry point, and an arbitrary replica staleness must always heal to the
source's state. Two contracts, searched separately:

1. Tombstones RETAINED across the gap (the sound operating contract,
   Kafka delete.retention analog): heal is exact for any stream — the
   floor replay carries every tombstone with its original dominance pair.
2. Tombstones RECLAIMED (compact(drop_tombstones=True)) with post-expiry
   event time moving forward (fresh timestamps — the realistic stream):
   the synthetic-tombstone anti-join still converges the stale replica —
   each reclaimed key dies at its own pair, strictly-newer re-inserts
   land. (With backwards post-gap timestamps the SOURCE itself behaves
   differently once its tombstone is gone — not replayable by design.)
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ccdb_data_pipeline_spark.plans.datasource import register
from ccdb_data_pipeline_spark.plans.replicate import ReplicaSet, replica_handle

from tests.test_replicate import _events, _mk, _state

_key = st.sampled_from(["a", "b", "c"])
_op = st.sampled_from(["U", "U", "D"])
_event = st.tuples(_key, _op, st.integers(min_value=0, max_value=9))
_stream = st.lists(_event, min_size=2, max_size=12)


def _run(spark, base, events, n_pre, sync_before, drop_tombstones, fresh_ts):
    register(spark)
    rows = [
        (k, i + 1, f"{k}{i}" if op != "D" else None,
         (m + 100 * (i >= n_pre)) if fresh_ts else m, i + 1, op)
        for i, (k, op, m) in enumerate(events)
    ]
    src = _mk(spark, base, "s")
    rs = ReplicaSet(spark, str(base / "txnlog"), str(base / "replog"),
                    {src.root: str(base / "r")})
    src.merge_events(_events(spark, rows[:n_pre]), batch_id=0)
    if sync_before:
        rs.sync_to_head()
    src.merge_events(_events(spark, rows[n_pre:]), batch_id=1)
    src.compact(drop_tombstones=drop_tombstones, only_dirty=False)
    src.expire_snapshots(retain_last=1)
    src.merge_events(
        _events(spark, [("d", 99, "tail", 200 if fresh_ts else 9, 99, "I")]),
        batch_id=2,
    )
    rs.sync_to_head()
    rep = replica_handle(spark, str(base / "r"))
    assert _state(rep) == _state(src), (rows, n_pre, sync_before)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_stream, data=st.data())
def test_heal_exact_with_retained_tombstones(spark, tmp_path_factory, events, data):
    n_pre = data.draw(
        st.integers(min_value=1, max_value=max(1, len(events) - 1)), label="n_pre"
    )
    sync_before = data.draw(st.booleans(), label="sync_before")
    _run(spark, tmp_path_factory.mktemp("gapheal"), events, n_pre,
         sync_before, drop_tombstones=False, fresh_ts=False)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_stream, data=st.data())
def test_heal_converges_after_tombstone_reclaim_fresh_ts(
    spark, tmp_path_factory, events, data
):
    n_pre = data.draw(
        st.integers(min_value=1, max_value=max(1, len(events) - 1)), label="n_pre"
    )
    _run(spark, tmp_path_factory.mktemp("gapheal2"), events, n_pre,
         sync_before=True, drop_tombstones=True, fresh_ts=True)
