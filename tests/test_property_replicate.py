"""Property search for transactionally-consistent replication
(plans/replicate.py): arbitrary LWW op streams over two tables (duplicate
keys, deletes, out-of-order event times), arbitrary sealed-cut boundaries
with arbitrary per-cut table membership, optional mid-stream source
compaction (tombstones retained — the sound replication contract), and an
arbitrary resync schedule must always yield (a) replicas equal to their
sources, and (b) at EVERY sealed replica cut, the replica time-traveled to
the cut's pinned version equal to the source time-traveled to the version
the source transaction pinned. Sibling searches: test_property_replay.py
(the LWW engine itself), test_property_engines.py (agg/first-row)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ccdb_data_pipeline_spark.plans.datasource import register
from ccdb_data_pipeline_spark.plans.replicate import ReplicaSet, replica_handle, sealed_records
from ccdb_data_pipeline_spark.plans.txn import TransactionLog

from tests.test_replicate import _events, _mk, _state

_key = st.sampled_from(["a", "b", "c"])
_op = st.sampled_from(["U", "U", "U", "D"])
_tsmin = st.integers(min_value=0, max_value=9)  # collisions + out-of-order
_event = st.tuples(_key, _op, _tsmin)
_stream = st.lists(_event, min_size=2, max_size=14)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_stream, data=st.data())
def test_any_cut_chain_replicates_consistently(
    spark, tmp_path_factory, events, data
):
    register(spark)
    base = tmp_path_factory.mktemp("replprop")
    rows = [
        (k, i + 1, f"{k}{i}" if op != "D" else None, m, i + 1, op)
        for i, (k, op, m) in enumerate(events)
    ]
    # route each event to one of two tables (drawn), then cut the combined
    # stream into 1-3 sealed transactions at drawn boundaries
    routes = data.draw(
        st.lists(st.booleans(), min_size=len(rows), max_size=len(rows)),
        label="routes",
    )
    n_cuts = data.draw(st.integers(min_value=1, max_value=3), label="n_cuts")
    bounds = sorted(
        data.draw(
            st.sets(st.integers(min_value=1, max_value=len(rows)), max_size=n_cuts - 1),
            label="bounds",
        )
    ) + [len(rows)]

    t1, t2 = _mk(spark, base, "s1"), _mk(spark, base, "s2")
    log = TransactionLog(str(base / "txnlog"))
    rs = ReplicaSet(
        spark, str(base / "txnlog"), str(base / "replog"),
        {t1.root: str(base / "r1"), t2.root: str(base / "r2")},
    )
    src_pins: list[dict] = []
    lo = 0
    for b, hi in enumerate(bounds):
        part, rt = rows[lo:hi], routes[lo:hi]
        lo = hi
        rows1 = [r for r, one in zip(part, rt) if one]
        rows2 = [r for r, one in zip(part, rt) if not one]
        txn = log.begin()
        staged = []
        if rows1:
            staged.append((t1, txn.stage(t1), rows1))
        if rows2:
            staged.append((t2, txn.stage(t2), rows2))
        if not staged:
            txn.abort()
            continue
        for _t, br, rws in staged:
            br.merge_events(_events(spark, rws), batch_id=b)
        txn.commit()
        src_pins.append({t.root: t.refresh().current_version() for t, _b, _r in staged})
        if data.draw(st.booleans(), label=f"compact_{b}"):
            t1.compact(drop_tombstones=False)
        if data.draw(st.booleans(), label=f"sync_{b}"):
            rs.sync()
    rs.sync()

    r1 = replica_handle(spark, str(base / "r1"))
    r2 = replica_handle(spark, str(base / "r2"))
    assert _state(r1) == _state(t1)
    assert _state(r2) == _state(t2)

    cuts = [r for r in sealed_records(rs.dst_log_dir) if r["kind"] == "txn"]
    assert len(cuts) == len(src_pins)
    reps = {t1.root: r1, t2.root: r2}
    for rec, pins in zip(cuts, src_pins):
        dst_pin = {t["root"]: t["target_version"] for t in rec["tables"]}
        for m in rec["replica"]["tables"]:
            src_root = m["src_root"]
            assert m["src_version"] == pins[src_root]
            src = t1 if src_root == t1.root else t2
            rep = reps[src_root]
            assert _state(rep, version=dst_pin[m["dst_root"]]) == _state(
                src, version=pins[src_root]
            ), (rec["txn_id"], src_root)
