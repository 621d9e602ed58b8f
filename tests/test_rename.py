"""Column-rename schema evolution (Iceberg field-id rename analog):
metadata-only DDL; old-era files serve the renamed column at read time,
lagging producers are remapped, a re-added retired name is a distinct
field, and time travel shows the historical name. Reference analog: the
positional header swap in /root/reference/common/csv2json.py:74-77 (rename
by editing the field file + rewriting the output)."""

import datetime as dt
import os

import pytest

from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, TableSpec

T0 = dt.datetime(2025, 1, 1)


def _table(spark, tmp_path, name="t", **kw):
    spec = TableSpec(num_buckets=4, merge_mode="mor", **kw)
    t = SnapshotParquetTable(spark, os.path.join(str(tmp_path), name), spec)
    t.create(TRANSCRIPT_SCHEMA)
    return t


def _batch(spark, rows):
    """rows: (lsn, op, conv, turn, text, tool, ts_minutes)"""
    data = [
        (lsn, op, conv, turn, "user", text, tool, T0 + dt.timedelta(minutes=m))
        for (lsn, op, conv, turn, text, tool, m) in rows
    ]
    return spark.createDataFrame(data, CHANGE_SCHEMA)


def _state(t, col, **kw):
    return {
        (r["conv_id"], r["turn_idx"]): r[col] for r in t.read(**kw).collect()
    }


def test_rename_preserves_old_data_and_accepts_new_writes(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_events(_batch(spark, [(1, "I", "c1", 0, "hello", "bash", 1),
                                  (2, "I", "c2", 0, "hi", None, 2)]), 0)
    v = t.rename_column("tool", "tool_name")
    assert v == t.current_version()
    # old files (written under "tool") serve the renamed column
    assert _state(t, "tool_name") == {("c1", 0): "bash", ("c2", 0): None}
    assert "tool" not in t.read().columns
    # a post-rename batch using the NEW name merges normally
    new = _batch(spark, [(3, "I", "c3", 0, "yo", "grep", 3)]).withColumnRenamed(
        "tool", "tool_name"
    )
    t.merge_events(new, 1)
    assert _state(t, "tool_name")[("c3", 0)] == "grep"


def test_lagging_producer_old_name_is_remapped(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_events(_batch(spark, [(1, "I", "c1", 0, "a", "bash", 1)]), 0)
    t.rename_column("tool", "tool_name")
    # producer still emits "tool": unambiguous lag case -> lands in tool_name
    t.merge_events(_batch(spark, [(2, "I", "c2", 0, "b", "sed", 2)]), 1)
    assert _state(t, "tool_name") == {("c1", 0): "bash", ("c2", 0): "sed"}
    cols = [f.name for f in t.schema.fields]
    assert "tool" not in cols  # no accidental union-evolution re-add


def test_strict_mode_reintroduces_literal_name(spark, tmp_path):
    t = _table(spark, tmp_path, remap_renamed_columns=False)
    t.merge_events(_batch(spark, [(1, "I", "c1", 0, "a", "bash", 1)]), 0)
    t.rename_column("tool", "tool_name")
    t.merge_events(_batch(spark, [(2, "I", "c2", 0, "b", "sed", 2)]), 1)
    cols = [f.name for f in t.schema.fields]
    # strict: "tool" union-evolves back in as a DISTINCT field
    assert "tool" in cols and "tool_name" in cols
    st = {(r["conv_id"], r["turn_idx"]): (r["tool_name"], r["tool"])
          for r in t.read().collect()}
    # pre-rename file: value under the renamed field, null for the re-add;
    # post-rename write: the literal "tool" field, null for tool_name
    assert st == {("c1", 0): ("bash", None), ("c2", 0): (None, "sed")}


def test_chained_renames_compose(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_events(_batch(spark, [(1, "I", "c1", 0, "a", "bash", 1)]), 0)
    t.rename_column("tool", "tool_a")
    t.rename_column("tool_a", "tool_b")
    assert _state(t, "tool_b") == {("c1", 0): "bash"}
    # compaction rewrites to current names; reads unchanged after
    t.compact()
    assert _state(t, "tool_b") == {("c1", 0): "bash"}
    m = t.manifest()
    assert [r["from"] for r in m["renames"]] == ["tool", "tool_a"]


def test_time_travel_shows_historical_name(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_events(_batch(spark, [(1, "I", "c1", 0, "a", "bash", 1)]), 0)
    v_before = t.current_version()
    t.rename_column("tool", "tool_name")
    old = t.read(version=v_before)
    assert "tool" in old.columns and "tool_name" not in old.columns
    assert old.collect()[0]["tool"] == "bash"


def test_table_changes_across_rename_boundary(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_events(_batch(spark, [(1, "I", "c1", 0, "a", "bash", 1)]), 0)
    v0 = t.current_version()
    t.rename_column("tool", "tool_name")
    t.merge_events(
        _batch(spark, [(2, "U", "c1", 0, "a2", "grep", 2)]).withColumnRenamed(
            "tool", "tool_name"
        ),
        1,
    )
    ch = t.table_changes(v0).collect()
    by_type = {r["_change_type"]: r for r in ch}
    assert by_type["update_preimage"]["tool_name"] == "bash"
    assert by_type["update_postimage"]["tool_name"] == "grep"


def test_rename_validation(spark, tmp_path):
    t = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="not renameable"):
        t.rename_column("conv_id", "cid")
    with pytest.raises(ValueError, match="not renameable"):
        t.rename_column("ts", "event_ts")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists or is reserved"):
        t.rename_column("tool", "text")
    with pytest.raises(ValueError, match="already exists or is reserved"):
        t.rename_column("tool", "_deleted")


def test_drop_column_hides_old_data(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_events(_batch(spark, [(1, "I", "c1", 0, "a", "bash", 1)]), 0)
    t.drop_column("tool")
    assert "tool" not in t.read().columns
    cols = [f.name for f in t.schema.fields]
    assert "tool" not in cols


def test_drop_then_readd_is_a_new_field(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_events(_batch(spark, [(1, "I", "c1", 0, "a", "stale-secret", 1)]), 0)
    t.drop_column("tool")
    # a later batch re-introduces the NAME (union evolution): new field
    t.merge_events(_batch(spark, [(2, "I", "c2", 0, "b", "fresh", 2)]), 1)
    st = {(r["conv_id"], r["turn_idx"]): r["tool"] for r in t.read().collect()}
    # pre-drop row must NOT resurrect the stale value
    assert st == {("c1", 0): None, ("c2", 0): "fresh"}
    # compaction physically rewrites; semantics unchanged
    t.compact()
    st2 = {(r["conv_id"], r["turn_idx"]): r["tool"] for r in t.read().collect()}
    assert st2 == st


def test_drop_then_rename_other_column_onto_freed_name(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_events(_batch(spark, [(1, "I", "c1", 0, "payload", "old-tool", 1)]), 0)
    t.drop_column("tool")
    t.rename_column("text", "tool")  # freed name, legal; chains by sid
    st = {(r["conv_id"], r["turn_idx"]): r["tool"] for r in t.read().collect()}
    assert st == {("c1", 0): "payload"}  # text's value, not the dropped field's


def test_drop_validation_and_time_travel(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_events(_batch(spark, [(1, "I", "c1", 0, "a", "bash", 1)]), 0)
    v_before = t.current_version()
    with pytest.raises(ValueError, match="not droppable"):
        t.drop_column("conv_id")
    with pytest.raises(ValueError, match="no column"):
        t.drop_column("nope")
    t.drop_column("tool")
    old = t.read(version=v_before)
    assert old.collect()[0]["tool"] == "bash"  # time travel: field still there


def test_add_column_with_initial_default(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_events(_batch(spark, [(1, "I", "c1", 0, "a", "bash", 1)]), 0)
    t.add_column("channel", "string", default="web")
    # pre-existing row reads the default, not null (no file rewritten)
    assert {r["conv_id"]: r["channel"] for r in t.read().collect()} == {"c1": "web"}
    # a post-add batch WITHOUT the column writes null (no write-default)
    t.merge_events(_batch(spark, [(2, "I", "c2", 0, "b", "sed", 2)]), 1)
    st = {r["conv_id"]: r["channel"] for r in t.read().collect()}
    assert st == {"c1": "web", "c2": None}
    # a post-add batch WITH the column keeps its values
    import pyspark.sql.functions as F
    b3 = _batch(spark, [(3, "I", "c3", 0, "c", None, 3)]).withColumn(
        "channel", F.lit("api")
    )
    t.merge_events(b3, 2)
    st = {r["conv_id"]: r["channel"] for r in t.read().collect()}
    assert st == {"c1": "web", "c2": None, "c3": "api"}
    # compaction rewrites the default into the data; semantics unchanged
    t.compact()
    assert {r["conv_id"]: r["channel"] for r in t.read().collect()} == st


def test_add_column_typed_default_and_validation(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge_events(_batch(spark, [(1, "I", "c1", 0, "a", None, 1)]), 0)
    t.add_column("score", "bigint", default=0)
    row = t.read().collect()[0]
    assert row["score"] == 0 and type(row["score"]) is int
    with pytest.raises(ValueError, match="already exists or is reserved"):
        t.add_column("text", "string")
    with pytest.raises(ValueError, match="JSON primitive"):
        t.add_column("meta", "string", default={"x": 1})


def test_reintroduced_name_is_not_remapped(spark, tmp_path):
    """After rename tool->tool_name, explicitly re-adding 'tool' makes it a
    live field again: producer batches using 'tool' mean the NEW field and
    must not be lag-remapped onto tool_name."""
    t = _table(spark, tmp_path)
    t.merge_events(_batch(spark, [(1, "I", "c1", 0, "a", "bash", 1)]), 0)
    t.rename_column("tool", "tool_name")
    t.add_column("tool", "string")
    t.merge_events(_batch(spark, [(2, "I", "c2", 0, "b", "fresh", 2)]), 1)
    st = {r["conv_id"]: (r["tool_name"], r["tool"]) for r in t.read().collect()}
    assert st == {"c1": ("bash", None), "c2": (None, "fresh")}


def test_wire_column_names_are_reserved_targets(spark, tmp_path):
    t = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="already exists or is reserved"):
        t.rename_column("tool", "op")
    with pytest.raises(ValueError, match="already exists or is reserved"):
        t.rename_column("tool", "lsn")
    with pytest.raises(ValueError, match="already exists or is reserved"):
        t.add_column("op", "string")


def test_add_column_default_must_cast(spark, tmp_path):
    t = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="does not cast"):
        t.add_column("score", "bigint", default="lots")
