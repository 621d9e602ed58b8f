"""Sequence groups (Paimon ``fields.<seq>.sequence-group`` analog) through
the real MoR partial-update path: the (role, tool) pair is versioned by its
own ``meta_seq`` column, so two upstreams each owning a column subset can
patch the same row without arrival order (LSN) clobbering newer values.

Verified against an independent sequential replay implementing the documented
argmax rules, across batch splits (boundary invariance), deletes, compaction,
the raw write path, and the standalone resolve_with_patches operator."""

import datetime as dt
import os

import pytest
from pyspark.sql import types as T

from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import TableSpec

T0 = dt.datetime(2025, 1, 1)
LONG_MIN = -(2**63)

SEQ_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("meta_seq", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

CHANGE_SEQ_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("meta_seq", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

GROUPS = {"meta_seq": ("role", "tool")}


def _ts(m):
    return T0 + dt.timedelta(minutes=m)


def _table(spark, tmp_path, name="t", **spec_kw):
    spec = TableSpec(
        num_buckets=4,
        merge_mode="mor",
        partial_updates=True,
        sequence_groups=GROUPS,
        **spec_kw,
    )
    t = SnapshotParquetTable(spark, os.path.join(str(tmp_path), name), spec)
    t.create(SEQ_SCHEMA)
    return t


def _batch(spark, rows):
    """rows: (lsn, op, conv, turn, role, text, tool, meta_seq, ts_minutes)"""
    data = [
        (lsn, op, conv, turn, role, text, tool, seq, _ts(m))
        for (lsn, op, conv, turn, role, text, tool, seq, m) in rows
    ]
    return spark.createDataFrame(data, CHANGE_SEQ_SCHEMA)


def _replay(events):
    """Independent oracle: the documented argmax semantics, computed naively.

    Ungrouped columns (text): latest writer by (ts, lsn) among full images
    and non-NULL patches. Grouped columns (role, tool, meta_seq): the whole
    group from the writer with greatest (coalesce(meta_seq, MIN), lsn) among
    full images and seq-carrying patches. Existence: latest full-image op.
    """
    by_key = {}
    for ev in events:
        by_key.setdefault((ev[2], ev[3]), []).append(ev)
    state = {}
    for key, evs in by_key.items():
        full = [e for e in evs if e[1] in ("I", "U", "D")]
        if not full:
            continue
        last_full = max(full, key=lambda e: (e[8], e[0]))
        if last_full[1] == "D":
            continue
        row = {}
        # ungrouped: text (index 5), ts (index 8) — (ts, lsn) argmax over
        # full images (always write) and patches with a non-NULL value
        for name, idx in (("text", 5), ("ts", 8)):
            writers = [e for e in evs if e[1] != "P" or e[idx] is not None]
            w = max(writers, key=lambda e: (e[8], e[0])) if writers else None
            val = w[idx] if w else None
            row[name] = _ts(val) if (name == "ts" and val is not None) else val
        # grouped: atomic (role, tool, meta_seq) from the (seq, lsn) argmax
        gw = [e for e in evs if e[1] != "P" or e[7] is not None]
        if gw:
            w = max(gw, key=lambda e: (e[7] if e[7] is not None else LONG_MIN, e[0]))
            row["role"], row["tool"], row["meta_seq"] = w[4], w[6], w[7]
        else:
            row["role"] = row["tool"] = row["meta_seq"] = None
        state[key] = row
    return state


def _read_state(table):
    out = {}
    for r in table.read().collect():
        out[(r["conv_id"], r["turn_idx"])] = {
            "role": r["role"],
            "text": r["text"],
            "tool": r["tool"],
            "meta_seq": r["meta_seq"],
            "ts": r["ts"],
        }
    return out


# the core scenario: two upstreams interleaved out of group-seq order.
# upstream A owns (role, tool) and stamps meta_seq; upstream B owns text
# (ungrouped). A's lsn-later patch carries an OLDER meta_seq and must lose.
EVENTS = [
    (1, "I", "c1", 0, "user", "hello", None, 10, 1),
    (2, "I", "c1", 1, "assistant", "hi", "search", 10, 2),
    # A: newer group write (seq 30)
    (3, "P", "c1", 0, "admin", None, "calc", 30, 3),
    # A late replay: lsn-newest but STALE group seq 20 -> must not clobber
    (4, "P", "c1", 0, "ghost", None, "stale", 20, 4),
    # B: text patch, no seq -> group untouched, text updated
    (5, "P", "c1", 0, None, "hello v2", None, None, 5),
    # patch without seq carrying group columns: never touches the group
    (6, "P", "c1", 1, "smuggler", None, "smuggled", None, 6),
    # delete + recreate with a LOWER seq: group argmax ranges over history
    # by design (LWW-by-declared-version, same stance as ts for ungrouped)
    (7, "D", "c2", 0, None, None, None, None, 7),
    (8, "I", "c2", 0, "user", "recreated", None, 5, 8),
    (9, "I", "c2", 0, "user", "recreated2", None, 4, 9),  # stale group, newer ts
    # key that only ever saw patches: does not exist
    (10, "P", "c9", 0, "never", None, None, 99, 10),
]


def test_sequence_group_core_semantics(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_events(_batch(spark, EVENTS), batch_id=0)
    got = _read_state(t)
    exp = _replay(EVENTS)
    assert set(got) == set(exp)
    for k in exp:
        for c in ("role", "text", "tool", "meta_seq", "ts"):
            assert got[k][c] == exp[k][c], (k, c, got[k], exp[k])
    # spot-pin the headline behaviors (independent of the oracle impl)
    assert got[("c1", 0)]["role"] == "admin"          # seq 30 beat lsn-later seq 20
    assert got[("c1", 0)]["tool"] == "calc"
    assert got[("c1", 0)]["meta_seq"] == 30
    assert got[("c1", 0)]["text"] == "hello v2"       # ungrouped: lsn order
    assert got[("c1", 1)]["role"] == "assistant"      # null-seq patch ignored
    assert got[("c1", 1)]["tool"] == "search"
    assert got[("c2", 0)]["role"] == "user"
    assert got[("c2", 0)]["meta_seq"] == 5            # seq 5 > seq 4 despite older ts
    assert got[("c2", 0)]["text"] == "recreated2"     # ungrouped follows (ts, lsn)
    assert ("c9", 0) not in got


@pytest.mark.parametrize("splits", [[10], [3, 7, 10], [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]])
def test_batch_boundary_invariance(spark, tmp_path, splits):
    """Same event set under any batching -> identical table (the property
    Paimon's stored-seq gate does NOT have; our argmax semantics do)."""
    t = _table(spark, tmp_path, name=f"t{len(splits)}")
    lo = 0
    for b, hi in enumerate(splits):
        t.merge_events(_batch(spark, EVENTS[lo:hi]), batch_id=b)
        lo = hi
    assert _read_state(t) == _read_state_ref(spark, tmp_path)


_REF_CACHE = {}


def _read_state_ref(spark, tmp_path):
    key = str(tmp_path)
    if key not in _REF_CACHE:
        t = _table(spark, tmp_path, name="ref")
        t.merge_events(_batch(spark, EVENTS), batch_id=0)
        _REF_CACHE[key] = _read_state(t)
    return _REF_CACHE[key]


def test_compaction_preserves_group_state(spark, tmp_path):
    """Compaction folds the layers into base rows that store the winning
    seq — a post-compaction stale patch must STILL lose to the stored seq."""
    t = _table(spark, tmp_path)
    t.merge_events(_batch(spark, EVENTS[:5]), batch_id=0)
    before = _read_state(t)
    t.compact()
    assert _read_state(t) == before
    # stale group patch after compaction: stored seq 30 dominates seq 25
    t.merge_events(
        _batch(spark, [(11, "P", "c1", 0, "late", None, "late", 25, 11)]),
        batch_id=1,
    )
    got = _read_state(t)
    assert got[("c1", 0)]["role"] == "admin" and got[("c1", 0)]["meta_seq"] == 30
    # and a genuinely newer one wins
    t.merge_events(
        _batch(spark, [(12, "P", "c1", 0, "v40", None, "t40", 40, 12)]),
        batch_id=2,
    )
    got = _read_state(t)
    assert got[("c1", 0)]["role"] == "v40" and got[("c1", 0)]["meta_seq"] == 40


def test_raw_write_path_matches_fused(spark, tmp_path):
    """dedupe_on_write=False stores single-event rows; the read-side resolve
    alone must produce the same state the fused fold does."""
    fused = _table(spark, tmp_path, name="fused")
    raw = _table(spark, tmp_path, name="raw", dedupe_on_write=False)
    for tt in (fused, raw):
        tt.merge_events(_batch(spark, EVENTS), batch_id=0)
    assert _read_state(fused) == _read_state(raw)
    for tt in (fused, raw):
        tt.compact()
    assert _read_state(fused) == _read_state(raw)


def test_spec_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="requires partial_updates"):
        SnapshotParquetTable(
            spark,
            os.path.join(str(tmp_path), "v1"),
            TableSpec(merge_mode="mor", sequence_groups=GROUPS),
        ).create(SEQ_SCHEMA)
    with pytest.raises(ValueError, match="not in payload"):
        SnapshotParquetTable(
            spark,
            os.path.join(str(tmp_path), "v2"),
            TableSpec(
                merge_mode="mor",
                partial_updates=True,
                sequence_groups={"meta_seq": ("role", "nope")},
            ),
        ).create(SEQ_SCHEMA)
    with pytest.raises(ValueError, match="overlap"):
        SnapshotParquetTable(
            spark,
            os.path.join(str(tmp_path), "v3"),
            TableSpec(
                merge_mode="mor",
                partial_updates=True,
                sequence_groups={"meta_seq": ("role",), "turn_seq": ("role",)},
            ),
        ).create(
            T.StructType(
                list(SEQ_SCHEMA.fields)
                + [T.StructField("turn_seq", T.LongType(), True)]
            )
        )
    with pytest.raises(ValueError, match="integer type"):
        SnapshotParquetTable(
            spark,
            os.path.join(str(tmp_path), "v4"),
            TableSpec(
                merge_mode="mor",
                partial_updates=True,
                sequence_groups={"role": ("tool",)},
            ),
        ).create(SEQ_SCHEMA)


def test_standalone_resolve_matches_lake(spark, tmp_path):
    """operators/patch.py resolve_with_patches(sequence_groups=) — the
    query-side twin — agrees with the lake path on the same events."""
    from ccdb_data_pipeline_spark.operators.patch import resolve_with_patches

    t = _table(spark, tmp_path)
    t.merge_events(_batch(spark, EVENTS), batch_id=0)
    lake = _read_state(t)

    # standalone resolve orders ungrouped columns by ver_col alone (no
    # event-time) — restrict the comparison to keys where (ts, lsn) order
    # == lsn order, which EVENTS satisfies everywhere except c2 (out-of-
    # order ts); drop that key from the comparison.
    df = _batch(spark, [e for e in EVENTS if e[2] != "c2"])
    out = resolve_with_patches(
        df,
        ["conv_id", "turn_idx"],
        "lsn",
        ["role", "text", "tool", "meta_seq", "ts"],
        sequence_groups=GROUPS,
    )
    got = {
        (r["conv_id"], r["turn_idx"]): {
            "role": r["role"],
            "text": r["text"],
            "tool": r["tool"],
            "meta_seq": r["meta_seq"],
            "ts": r["ts"],
        }
        for r in out.collect()
    }
    lake_sub = {k: v for k, v in lake.items() if k[0] != "c2"}
    assert got == lake_sub

    with pytest.raises(ValueError, match="not in payload"):
        resolve_with_patches(
            df, ["conv_id", "turn_idx"], "lsn", ["role"], sequence_groups=GROUPS
        )


def test_orphan_patch_survives_compaction(spark, tmp_path):
    """Patch-before-insert ACROSS a compaction boundary (the hypothesis-
    found regression): a key whose only rows are patches must neither
    materialize as a row nor fold into a dominance-carrying tombstone at
    compaction — the raw patch rows carry through so the late insert
    composes with them, and count_fast never counts them."""
    t = _table(spark, tmp_path)
    # batch 0: ONLY patches for two keys (text for k1, group-seq for k2)
    t.merge_events(
        _batch(
            spark,
            [
                (1, "P", "k1", 0, None, "patched-text", None, None, 9),
                (2, "P", "k2", 0, "admin", None, "calc", 7, 9),
            ],
        ),
        batch_id=0,
    )
    t.compact(drop_tombstones=False)
    assert _read_state(t) == {}            # patches alone create nothing
    assert t.count_fast() == 0             # footer fast path must agree
    # batch 1: the inserts arrive LATER with OLDER ts and higher lsn
    t.merge_events(
        _batch(
            spark,
            [
                (3, "I", "k1", 0, "user", "inserted", None, None, 1),
                (4, "I", "k2", 0, "user", "inserted", None, None, 1),
            ],
        ),
        batch_id=1,
    )
    got = _read_state(t)
    # k1: text from the patch ((ts 9, lsn 1) beats the insert's (1, 3))
    assert got[("k1", 0)]["text"] == "patched-text"
    assert got[("k1", 0)]["role"] == "user"
    # k2: the whole group from the seq-7 patch (insert carries no seq)
    assert got[("k2", 0)]["role"] == "admin"
    assert got[("k2", 0)]["tool"] == "calc"
    assert got[("k2", 0)]["meta_seq"] == 7
    assert t.count_fast() == 2
    # a second compaction folds patch + insert into clean base rows
    t.compact(drop_tombstones=False)
    assert _read_state(t) == got
    assert t.count_fast() == 2


def test_patch_survives_same_batch_delete_then_later_insert(spark, tmp_path):
    """Hypothesis-found (round 3): a patch whose key is TOMBSTONED later in
    the same batch must still contribute to a later-batch insert — group
    and column state are argmax over the whole event set, and the fold now
    emits the folded patch row alongside the tombstone instead of
    destroying it. Covers the fold fix, compaction carry, and both fold
    engines via the shared read resolve."""
    import pandas as pd

    for eng, compact_mid in (("arrow", False), ("pandas", False), ("arrow", True)):
        t = _table(spark, tmp_path, name=f"pd-{eng}-{compact_mid}", fold_engine=eng)
        batch0 = [
            # (lsn, op, conv, turn, role, text, tool, meta_seq, ts_minutes)
            (2, "P", "b", 1, None, "yy", "calc", 0, 5),
            (7, "D", "b", 1, None, None, None, None, 0),
        ]
        t.merge_events(_batch(spark, batch0), batch_id=0)
        if compact_mid:
            t.compact(drop_tombstones=False)
        t.merge_events(
            _batch(spark, [(10, "I", "b", 1, None, None, None, None, 5)]), batch_id=1
        )
        got = _read_state(t)[("b", 1)]
        assert got["tool"] == "calc" and got["meta_seq"] == 0, (eng, compact_mid, got)
        assert got["text"] is None  # later full image outranks the patch
        # ... and the delete still wins when no insert follows
        t2 = _table(spark, tmp_path, name=f"pd2-{eng}-{compact_mid}", fold_engine=eng)
        t2.merge_events(_batch(spark, batch0), batch_id=0)
        assert ("b", 1) not in _read_state(t2)


def test_out_of_order_ts_across_batches_regression(spark, tmp_path):
    """Round-4 hypothesis find (R3-10's sibling, pre-existing since round
    2): the old single-row overlay fold stamped every column with the
    row's max (ts, lsn), so an UNGROUPED column whose true writer was
    older mis-resolved against writers from other batches when event
    times arrived out of order across batch boundaries. Shrunk falsifying
    example: text's whole-set winner is U@lsn3 (ts=5); the second batch's
    last event is a higher-(ts,lsn) PATCH that does not write text, so
    the folded row presented I@lsn13's text at the patch's version and
    wrongly beat U@3. The survivor-set fold keeps original rows, so the
    read argmax sees true per-column versions — across every batch split
    and through compaction."""
    rows = [
        (2, "U", "a", 1, "assistant", None, "calc", 2, 4),
        (3, "U", "a", 1, "user", None, None, None, 5),
        (7, "D", "a", 1, None, None, None, None, 4),
        (8, "P", "a", 1, None, None, None, 2, 5),
        (9, "U", "a", 1, None, None, None, None, 4),
        (13, "I", "a", 1, None, "x", "calc", 1, 4),
    ]
    exp = _replay(rows)
    for cut in (None, 1, 2, 3, 4, 5):
        t = _table(spark, tmp_path, name=f"oo-{cut}")
        if cut is None:
            t.merge_events(_batch(spark, rows), batch_id=0)
        else:
            t.merge_events(_batch(spark, rows[:cut]), batch_id=0)
            t.merge_events(_batch(spark, rows[cut:]), batch_id=1)
        assert _read_state(t) == exp, ("pre-compact", cut)
        t.compact(drop_tombstones=False)
        assert _read_state(t) == exp, ("post-compact", cut)
        # a LATE patch older than the stored text writer must still lose,
        # and one newer must win — per-column provenance survives compaction
        late_lose = [(20, "P", "a", 1, None, "stale", None, None, 4)]
        late_win = [(21, "P", "a", 1, None, "fresh", None, None, 6)]
        t.merge_events(_batch(spark, late_lose), batch_id=2)
        assert _read_state(t)[("a", 1)]["text"] == exp[("a", 1)]["text"], cut
        t.merge_events(_batch(spark, late_win), batch_id=3)
        assert _read_state(t)[("a", 1)]["text"] == "fresh", cut
