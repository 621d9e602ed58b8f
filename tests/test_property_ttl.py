"""Property search: row-level TTL (auto_maintain) equals the pandas
oracle — LWW replay of an arbitrary seed + change batch, then drop every
row whose event time fell behind the cutoff (NULL event times retained) —
for BOTH delete planes (dv sidecars / cdc tombstones), any compaction
state, with the immediately-following sweep commit-free and the
post-compaction trigger metadata-only."""

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.plans.maintenance import MaintenancePolicy, auto_maintain
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec

from tests.oracle import assert_tables_equal, replay, table_to_pandas

BASE = dt.datetime(2030, 1, 1)

_seed_row = st.tuples(
    st.integers(min_value=0, max_value=7),           # conv
    st.integers(min_value=0, max_value=3),           # turn
    st.one_of(st.none(), st.integers(min_value=0, max_value=9)),  # ts day (None = null)
)
_chg = st.tuples(
    st.integers(min_value=0, max_value=7),
    st.integers(min_value=0, max_value=3),
    st.sampled_from(["I", "U", "D"]),
    st.integers(min_value=0, max_value=9),           # event-time day
)


@pytest.fixture(scope="module")
def sess(spark):
    return spark


def _day(d):
    return None if d is None else BASE + dt.timedelta(days=int(d))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    seed_rows=st.lists(_seed_row, min_size=1, max_size=20,
                       unique_by=lambda r: (r[0], r[1])),
    changes=st.lists(_chg, min_size=0, max_size=12),
    cutoff_day=st.integers(min_value=1, max_value=10),
    mode=st.sampled_from(["dv", "cdc"]),
    pre_compact=st.booleans(),
)
def test_any_table_ttl_equals_oracle(
    sess, tmp_path_factory, seed_rows, changes, cutoff_day, mode, pre_compact
):
    root = tmp_path_factory.mktemp("ttlprop")
    seed = pd.DataFrame(
        {
            "conv_id": [f"c{c}" for c, _t, _d in seed_rows],
            "turn_idx": [t for _c, t, _d in seed_rows],
            "role": ["user"] * len(seed_rows),
            "text": [f"s{i}" for i in range(len(seed_rows))],
            "tool": [None] * len(seed_rows),
            "ts": [_day(d) for _c, _t, d in seed_rows],
        }
    )
    ch = pd.DataFrame(
        [
            (i + 1, op, f"c{c}", t, "user", f"u{i}", None, _day(d))
            for i, (c, t, op, d) in enumerate(changes)
        ],
        columns=["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    t = SnapshotParquetTable(
        sess, str(root / "t"),
        TableSpec(num_buckets=4, merge_mode="mor", stats_cols=("ts",)),
    )
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, sess.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    if len(ch):
        apply_changes(t, sess.createDataFrame(ch, CHANGE_SCHEMA), batch_id=1)
    if pre_compact:
        t.compact(only_dirty=False)

    cutoff = BASE + dt.timedelta(days=int(cutoff_day))
    now = BASE + dt.timedelta(days=30)
    pol = MaintenancePolicy(
        max_delta_depth=99, max_dirty_buckets=9999, retain_snapshots=50,
        ttl_column="ts", ttl_max_age=now - cutoff, ttl_now=now, ttl_mode=mode,
    )
    auto_maintain(t, pol)

    exp = replay(seed, [ch] if len(ch) else [])
    exp = exp[exp["ts"].isna() | (exp["ts"] >= pd.Timestamp(cutoff))].reset_index(
        drop=True
    )
    assert_tables_equal(table_to_pandas(t.read()), exp)

    # the immediately-following sweep changes nothing and commits nothing
    v1 = t.stats()["version"]
    auto_maintain(t, pol)
    assert t.stats()["version"] == v1
    assert_tables_equal(table_to_pandas(t.read()), exp)

    # compaction refreshes stats; the trigger then goes metadata-only
    t.compact(only_dirty=False, drop_tombstones=True)
    r3 = auto_maintain(t, pol)
    act = r3["actions"]["ttl"]
    assert not act["run"] or act.get("result", {}).get("n_dv_positions", 1) == 0
    assert_tables_equal(table_to_pandas(t.read()), exp)
