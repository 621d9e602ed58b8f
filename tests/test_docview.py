"""Incrementally-maintained conversation-document view == full re-render,
through mid-conversation edits, whole-conversation deletes, appends and new
conversations (the CDC→training-text loop, re-render-changed-groups-only)."""

from datetime import datetime

import pandas as pd

from ccdb_data_pipeline_spark.plans.ivm import IncrementalDocView
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec

TS = datetime(2025, 1, 1)
TS2 = datetime(2025, 1, 2)


def _batch(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    return spark.createDataFrame(pdf, CHANGE_SCHEMA)


def _docs(view):
    return {r["conv_id"]: (r["doc"], r["n_turns"]) for r in view.read().collect()}


def _full_render(view, table):
    return {
        r["conv_id"]: (r["doc"], r["n_turns"])
        for r in view._render(table.read()).collect()
    }


def test_docview_tracks_changes_per_group(spark, tmp_path):
    t = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=4, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    view = IncrementalDocView(spark, str(tmp_path / "docs"))

    t.merge(
        _batch(
            spark,
            [
                (1, "I", "a", 0, "user", "hi", None, TS),
                (2, "I", "a", 1, "assistant", "hello", None, TS),
                (3, "I", "b", 0, "user", "bye", None, TS),
                (4, "I", "b", 1, "assistant", "later", None, TS),
            ],
        ),
        batch_id=0,
    )
    stats = view.refresh(t)
    assert stats["applied_to"] == t.current_version()
    got = _docs(view)
    assert got == _full_render(view, t)
    assert got["a"] == ("user: hi\nassistant: hello", 2)

    # mid-conversation edit + whole-conv delete + append + new conv
    t.merge(
        _batch(
            spark,
            [
                (5, "U", "a", 0, "user", "hi there", None, TS2),
                (6, "D", "b", 0, None, None, None, TS2),
                (7, "D", "b", 1, None, None, None, TS2),
                (8, "I", "a", 2, "user", "thanks", None, TS2),
                (9, "I", "c", 0, "user", "new", None, TS2),
            ],
        ),
        batch_id=1,
    )
    stats = view.refresh(t)
    assert stats["n_changes"] > 0
    got = _docs(view)
    assert got == _full_render(view, t)
    assert got["a"] == ("user: hi there\nassistant: hello\nuser: thanks", 3)
    assert "b" not in got  # fully-deleted conversation dropped out
    assert got["c"] == ("user: new", 1)

    # idempotent no-op refresh
    assert view.refresh(t)["n_changes"] == 0
    assert _docs(view) == got


def test_docview_out_of_order_turn_arrival(spark, tmp_path):
    """A turn that ARRIVES later but sorts earlier lands in its ordinal
    position, not at the end — rendering is by turn_idx, not ingest order."""
    t = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=2, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    view = IncrementalDocView(spark, str(tmp_path / "docs"))

    t.merge(_batch(spark, [(1, "I", "a", 1, "assistant", "second", None, TS)]), batch_id=0)
    view.refresh(t)
    t.merge(_batch(spark, [(2, "I", "a", 0, "user", "first", None, TS2)]), batch_id=1)
    view.refresh(t)
    assert _docs(view)["a"] == ("user: first\nassistant: second", 2)


def test_docview_state_is_lake_table(spark, tmp_path):
    """The state inherits lake-table machinery: O(changed) delta merges,
    compaction, and the exactly-once ledger (replaying a refresh after a
    'crash' — same source version — is a no-op)."""
    t = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=2, merge_mode="mor")
    )
    t.create(TRANSCRIPT_SCHEMA)
    view = IncrementalDocView(spark, str(tmp_path / "docs"), num_buckets=2)

    t.merge(
        _batch(
            spark,
            [
                (1, "I", "a", 0, "user", "one", None, TS),
                (2, "I", "b", 0, "user", "two", None, TS),
            ],
        ),
        batch_id=0,
    )
    view.refresh(t)
    t.merge(_batch(spark, [(3, "U", "a", 0, "user", "one!", None, TS2)]), batch_id=1)
    view.refresh(t)
    before = _docs(view)
    assert before["a"] == ("user: one!", 1)

    # crash-replay: force a merge of the same source version again — the
    # batch ledger (batch_id = source version) makes it a skipped no-op
    stats = view.table.merge(
        view._stamp(view._render(t.read()), t.current_version(), "U"),
        batch_id=t.current_version(),
    )
    assert stats.skipped
    assert _docs(view) == before

    # compacting the view's own lake table changes nothing visible
    view.table.compact()
    assert _docs(view) == before


def test_stream_keeps_docview_fresh(spark, tmp_path):
    """Binlog tail -> lake table -> conversation documents, fresh after
    every micro-batch (the full CDC→training-text loop, streaming)."""
    from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
    from ccdb_data_pipeline_spark.sources.binlog import (
        gen_changes_pandas,
        gen_seed_pandas,
        write_segments,
    )
    from ccdb_data_pipeline_spark.streaming.stream import run_ingest

    seed = gen_seed_pandas(n_convs=25, seed=19)
    changes = gen_changes_pandas(600, n_convs=25, seed=19)
    write_segments(changes, str(tmp_path / "binlog"), n_segments=4)

    table = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=4, merge_mode="mor")
    )
    table.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(table, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))

    view = IncrementalDocView(spark, str(tmp_path / "docs"), num_buckets=4)
    refreshes = []

    def on_batch(stats):
        if not stats.skipped:
            refreshes.append(view.refresh(table))

    run_ingest(
        spark,
        str(tmp_path / "binlog"),
        table,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
        on_batch=on_batch,
    )
    assert len(refreshes) >= 2
    assert all(r["n_changes"] >= 0 for r in refreshes[1:])
    assert _docs(view) == _full_render(view, table)


def test_docview_property_random_streams(spark, tmp_path_factory):
    """Hypothesis: ANY op/key/ts stream, split at arbitrary batch
    boundaries with a refresh after every batch, leaves the view equal to
    a full re-render of the table — including ts ties, deletes racing
    updates, empty-change batches and conversations that vanish."""
    import numpy as np
    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ccdb_data_pipeline_spark.plans.apply import apply_changes
    from datetime import datetime, timedelta

    BASE = datetime(2025, 6, 1)
    _event = st.fixed_dictionaries(
        {
            "op": st.sampled_from(["I", "U", "D"]),
            "conv_id": st.sampled_from(["a", "b", "c"]),
            "turn_idx": st.integers(min_value=0, max_value=2),
            "role": st.sampled_from(["user", "assistant"]),
            "text": st.sampled_from(["x", "y", "same text", ""]),
            "tool": st.none(),
            "ts": st.integers(min_value=0, max_value=5).map(
                lambda s: BASE + timedelta(seconds=s)
            ),
        }
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[
            HealthCheck.function_scoped_fixture,
            HealthCheck.too_slow,
        ],
    )
    @given(
        events=st.lists(_event, min_size=1, max_size=20),
        nb=st.integers(min_value=1, max_value=3),
    )
    def run(events, nb):
        rows = [dict(e, lsn=i + 1) for i, e in enumerate(events)]
        pdf = pd.DataFrame(rows, columns=CHANGE_SCHEMA.fieldNames())
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        root = tmp_path_factory.mktemp("dvprop")
        t = SnapshotParquetTable(
            spark, str(root / "t"), TableSpec(num_buckets=2, merge_mode="mor")
        )
        t.create(TRANSCRIPT_SCHEMA)
        view = IncrementalDocView(spark, str(root / "v"), num_buckets=2)
        for i, part in enumerate(np.array_split(pdf, nb)):
            apply_changes(t, spark.createDataFrame(part, CHANGE_SCHEMA), batch_id=i)
            view.refresh(t)
        assert _docs(view) == _full_render(view, t)

    run()
