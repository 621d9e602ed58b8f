"""Partial-update (column-level patch) merge through the real MoR lake path:
op 'P' events carry only the columns they change (NULL = don't touch).
Verified against an independent pandas replay implementing the Paimon-style
partial-update rules, across batches, deletes, compaction, and pruned reads."""

import datetime as dt
import os

import pandas as pd
import pytest

from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec

T0 = dt.datetime(2025, 1, 1)


def _ts(m):
    return T0 + dt.timedelta(minutes=m)


def _table(spark, tmp_path, **spec_kw):
    spec = TableSpec(num_buckets=4, merge_mode="mor", partial_updates=True, **spec_kw)
    t = SnapshotParquetTable(spark, os.path.join(str(tmp_path), "t"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    return t


def _batch(spark, rows):
    """rows: (lsn, op, conv, turn, role, text, tool, ts_minutes)"""
    data = [
        (lsn, op, conv, turn, role, text, tool, _ts(m))
        for (lsn, op, conv, turn, role, text, tool, m) in rows
    ]
    return spark.createDataFrame(data, CHANGE_SCHEMA)


def _replay_patches(events):
    """Independent oracle: sequential per-key replay of the patch rules."""
    state = {}  # key -> dict | "DELETED"
    for (lsn, op, conv, turn, role, text, tool, m) in sorted(events):
        key = (conv, turn)
        row = {"role": role, "text": text, "tool": tool}
        if op == "D":
            state[key] = "DELETED"
        elif op == "P":
            cur = state.get(key)
            if isinstance(cur, dict):
                for c, v in row.items():
                    if v is not None:
                        cur[c] = v
        else:  # I / U full image
            state[key] = row
    return {
        k: v for k, v in state.items() if isinstance(v, dict)
    }


def _read_state(table):
    out = {}
    for r in table.read().collect():
        out[(r["conv_id"], r["turn_idx"])] = {
            "role": r["role"], "text": r["text"], "tool": r["tool"]
        }
    return out


def _apply(table, spark, events, batch_id):
    table.merge_events(_batch(spark, events), batch_id=batch_id)


EVENTS_B1 = [
    (1, "I", "c1", 0, "user", "hello world", None, 1),
    (2, "I", "c1", 1, "assistant", "hi there", "search", 2),
    (3, "P", "c1", 0, None, None, "calc", 3),        # patch tool only
    (4, "I", "c2", 0, "user", "question", None, 4),
    (5, "P", "c9", 0, None, "ghost", None, 5),       # patch to nonexistent key
]

EVENTS_B2 = [
    (6, "P", "c1", 1, None, "hi there edited", None, 6),  # cross-batch text patch
    (7, "D", "c2", 0, None, None, None, 7),
    (8, "P", "c2", 0, "user", None, None, 8),        # patch after delete: no-op
    (9, "U", "c1", 0, "user", "rewritten", None, 9),  # full image wipes batch-1 patch
]


def test_within_batch_patch_overlay(spark, tmp_path):
    t = _table(spark, tmp_path)
    _apply(t, spark, EVENTS_B1, 0)
    assert _read_state(t) == _replay_patches(EVENTS_B1)
    # the patch landed: tool set, other columns untouched
    assert _read_state(t)[("c1", 0)] == {"role": "user", "text": "hello world", "tool": "calc"}
    # patch to a key that never had a full image creates nothing
    assert ("c9", 0) not in _read_state(t)


def test_cross_batch_patch_delete_and_full_rewrite(spark, tmp_path):
    t = _table(spark, tmp_path)
    _apply(t, spark, EVENTS_B1, 0)
    _apply(t, spark, EVENTS_B2, 1)
    expect = _replay_patches(EVENTS_B1 + EVENTS_B2)
    assert _read_state(t) == expect
    got = _read_state(t)
    assert got[("c1", 1)]["text"] == "hi there edited"      # patch overlays
    assert got[("c1", 1)]["tool"] == "search"               # untouched col survives
    assert ("c2", 0) not in got                             # delete wins, patch can't resurrect
    # the later full image beat the earlier patch: tool back to NULL
    assert got[("c1", 0)] == {"role": "user", "text": "rewritten", "tool": None}


def test_compaction_preserves_patch_resolution(spark, tmp_path):
    t = _table(spark, tmp_path)
    _apply(t, spark, EVENTS_B1, 0)
    _apply(t, spark, EVENTS_B2, 1)
    before = _read_state(t)
    t.compact(only_dirty=False)
    assert _read_state(t) == before
    # after compaction all rows are materialized full images: a fresh patch
    # still overlays correctly
    _apply(t, spark, [(10, "P", "c1", 0, None, None, "browser", 10)], 2)
    assert _read_state(t)[("c1", 0)]["tool"] == "browser"
    assert _read_state(t)[("c1", 0)]["text"] == "rewritten"


def test_pruned_read_on_patch_table(spark, tmp_path):
    t = _table(spark, tmp_path)
    _apply(t, spark, EVENTS_B1, 0)
    _apply(t, spark, EVENTS_B2, 1)
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in t.read(columns=["conv_id", "turn_idx", "text"]).collect()
    }
    expect = {k: v["text"] for k, v in _replay_patches(EVENTS_B1 + EVENTS_B2).items()}
    assert got == expect


def test_lww_out_of_order_patch_loses_to_newer_full(spark, tmp_path):
    t = _table(spark, tmp_path)
    _apply(t, spark, [(1, "I", "c1", 0, "user", "v1", None, 5)], 0)
    # late-arriving patch with OLDER event time than the current full image:
    # per-column last-writer is by (ts, lsn) — the full image stays
    _apply(t, spark, [(2, "P", "c1", 0, None, "stale-edit", None, 1)], 1)
    assert _read_state(t)[("c1", 0)]["text"] == "v1"


def test_partial_updates_rejected_on_cow(spark, tmp_path):
    spec = TableSpec(num_buckets=4, merge_mode="cow", partial_updates=True)
    t = SnapshotParquetTable(spark, os.path.join(str(tmp_path), "cow"), spec)
    t.create(TRANSCRIPT_SCHEMA)
    with pytest.raises(ValueError, match="merge_mode='mor'"):
        t.merge(_batch(spark, EVENTS_B1[:1]), batch_id=0)


def test_streaming_ingest_applies_patches(spark, tmp_path):
    """Patches flow through the real Structured Streaming path
    (file source -> foreachBatch -> merge_events) unchanged."""
    import pandas as pd

    from ccdb_data_pipeline_spark.sources.binlog import write_segments
    from ccdb_data_pipeline_spark.streaming.stream import run_ingest

    events = EVENTS_B1 + EVENTS_B2
    pdf = pd.DataFrame(
        [
            {"lsn": lsn, "op": op, "conv_id": conv, "turn_idx": turn,
             "role": role, "text": text, "tool": tool, "ts": _ts(m)}
            for (lsn, op, conv, turn, role, text, tool, m) in events
        ]
    )
    binlog = os.path.join(str(tmp_path), "binlog")
    write_segments(pdf, binlog, n_segments=3, replay_segment=1)
    t = _table(spark, tmp_path)
    run_ingest(spark, binlog, t, os.path.join(str(tmp_path), "ckpt"),
               max_files_per_trigger=1)
    assert _read_state(t) == _replay_patches(events)


def test_schema_evolution_with_patches(spark, tmp_path):
    """A patch batch in the evolved v2 schema (adds tool_args) patches the
    new column on pre-evolution rows; old rows read NULL for it."""
    from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA_V2

    t = _table(spark, tmp_path)
    _apply(t, spark, EVENTS_B1, 0)
    v2 = spark.createDataFrame(
        [
            (20, "P", "c1", 0, None, None, None, '{"q": 1}', _ts(20)),
            (21, "I", "c3", 0, "user", "new-era row", None, None, _ts(21)),
        ],
        CHANGE_SCHEMA_V2,
    )
    t.merge_events(v2, batch_id=1)
    rows = {
        (r["conv_id"], r["turn_idx"]): r
        for r in t.read().collect()
    }
    assert rows[("c1", 0)]["tool_args"] == '{"q": 1}'   # patched new column
    assert rows[("c1", 0)]["text"] == "hello world"     # untouched
    assert rows[("c1", 1)]["tool_args"] is None          # pre-evolution row
    assert rows[("c3", 0)]["text"] == "new-era row"
