"""End-to-end freshness of the TRAINING SHARDS under streaming ingest:
binlog tail -> lake table -> incremental docview -> incremental shard
export, every hop O(changes) per micro-batch. The export after the stream
drains must be byte-identical to a from-scratch export of the final
docview — the incremental chain is an IO optimization, never an
approximation."""

import glob
import json
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.operators.export import (
    export_shards,
    export_shards_incremental,
)
from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
from ccdb_data_pipeline_spark.plans.ivm import IncrementalDocView
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import (
    gen_changes_pandas,
    gen_seed_pandas,
    write_segments,
)
from ccdb_data_pipeline_spark.streaming.stream import run_ingest

N_SHARDS = 8


def test_stream_keeps_training_shards_fresh(spark, tmp_path):
    seed = gen_seed_pandas(n_convs=60, seed=23)
    # narrow the change stream to a handful of conversations so each
    # micro-batch dirties a PROPER subset of the 8 shards
    ch = gen_changes_pandas(1500, n_convs=60, seed=23)
    keep = sorted(c for c in ch["conv_id"].unique() if c is not None)[:5]
    changes = ch[ch["conv_id"].isin(keep)].reset_index(drop=True)
    write_segments(changes, str(tmp_path / "binlog"), n_segments=4)

    table = SnapshotParquetTable(
        spark, str(tmp_path / "t"), TableSpec(num_buckets=4, merge_mode="mor")
    )
    table.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(table, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))

    view = IncrementalDocView(spark, str(tmp_path / "docs"), num_buckets=4)
    view.refresh(table)

    out = str(tmp_path / "shards")
    export_shards(view.read(), out, "conv_id", n_shards=N_SHARDS)

    rewrites = []

    def on_batch(stats):
        if stats.skipped:
            return
        v_before = view.table.current_version()
        view.refresh(table)
        v_after = view.table.current_version()
        if v_after == v_before:
            return
        changed = (
            view.table.table_changes(v_before, v_after)
            .select("conv_id")
            .distinct()
        )
        rep = export_shards_incremental(
            view.read(), out, "conv_id", changed_keys=changed
        )
        rewrites.append(rep["shards_rewritten"])

    run_ingest(
        spark,
        str(tmp_path / "binlog"),
        table,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
        on_batch=on_batch,
    )

    assert rewrites, "stream applied no batches"
    # incrementality: at least one refresh touched a PROPER subset of shards
    assert any(0 < len(r) < N_SHARDS for r in rewrites), rewrites

    # final shards == from-scratch export of the final docview state
    full = str(tmp_path / "full")
    export_shards(view.read(), full, "conv_id", n_shards=N_SHARDS)
    for s in range(N_SHARDS):
        a_dir, b_dir = os.path.join(out, f"shard={s}"), os.path.join(full, f"shard={s}")
        assert os.path.isdir(a_dir) == os.path.isdir(b_dir), s
        if os.path.isdir(a_dir):
            a = pq.read_table(a_dir).sort_by("pos")
            b = pq.read_table(b_dir).sort_by("pos")
            assert a.to_pydict() == b.to_pydict(), s
    with open(os.path.join(out, "MANIFEST.json")) as f:
        m_inc = json.load(f)
    with open(os.path.join(full, "MANIFEST.json")) as f:
        m_full = json.load(f)
    assert m_inc == m_full

    # and the docview itself still matches a full re-render of the table
    rendered = {r["conv_id"]: r["doc"] for r in view.read().collect()}
    fresh = IncrementalDocView(spark, str(tmp_path / "docs2"), num_buckets=4)
    fresh.refresh(table)
    assert rendered == {r["conv_id"]: r["doc"] for r in fresh.read().collect()}
