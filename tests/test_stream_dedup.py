"""In-stream duplicate suppression (dropDuplicatesWithinWatermark on LSN).

The offset log dedupes re-read SEGMENTS; the MERGE's (ts, lsn) dominance
makes re-applied EVENTS value-idempotent. This layer sits between them:
an at-least-once upstream re-publishing already-delivered events under a
NEW segment file is filtered in-stream by checkpointed LSN state, so the
duplicates never cost a merge pass (reference analog: the delta pull's
`LastModifiedDate >= watermark` re-reads rows near the boundary,
salesforce/query.py:32-33 — harmless but wasteful, which is exactly what
this knob removes).
"""

import pytest

from ccdb_data_pipeline_spark.plans.apply import bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA, TableSpec
from ccdb_data_pipeline_spark.sources.binlog import (
    gen_changes_pandas,
    gen_seed_pandas,
    write_segments,
)
from ccdb_data_pipeline_spark.streaming.stream import run_ingest
from tests.oracle import assert_tables_equal, replay, table_to_pandas

N_CONVS = 40
N_EVENTS = 1500
REPLAYED = 1  # write_segments re-emits this segment later under a new file


@pytest.fixture(scope="module")
def data():
    seed = gen_seed_pandas(n_convs=N_CONVS, seed=42)
    changes = gen_changes_pandas(N_EVENTS, n_convs=N_CONVS, seed=42)
    return seed, changes


def _run(spark, root, seed, changes, **kw):
    t = SnapshotParquetTable(spark, str(root / "table"), TableSpec(num_buckets=8))
    t.create(TRANSCRIPT_SCHEMA)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    write_segments(
        changes, str(root / "binlog"), n_segments=6, replay_segment=REPLAYED
    )
    applied = []
    run_ingest(
        spark,
        str(root / "binlog"),
        t,
        str(root / "ckpt"),
        max_files_per_trigger=1,
        on_batch=lambda s: applied.append(s.n_source),
        **kw,
    )
    return t, applied


def test_in_stream_dedup_suppresses_replayed_segment(spark, tmp_path, data):
    seed, changes = data
    t, applied = _run(
        spark, tmp_path, seed, changes, dedupe_within_watermark="30 days"
    )
    # correctness unchanged: final state equals the sequential oracle
    assert_tables_equal(table_to_pandas(t.read()), replay(seed, [changes]))

    # the duplicate segment's timed rows never reached the sink
    # (n_source counts per-key LWW winners per batch, so compare the
    # replayed batch — stream order: s0, s1, s2, dup(s1), s3, s4, s5 —
    # against the null-ts rows that legitimately bypass the stateful op
    # and fall through to MERGE dominance instead)
    import numpy as np
    import pandas as pd

    parts = np.array_split(changes.sort_values("lsn").reset_index(drop=True), 6)
    dup_null_ts = int(pd.isna(parts[REPLAYED]["ts"]).sum())
    assert len(applied) == 7
    assert applied[REPLAYED + 2] <= dup_null_ts
    assert dup_null_ts < len(parts[REPLAYED])  # the suppression was real


def test_without_in_stream_dedup_duplicates_are_redelivered(spark, tmp_path, data):
    """Control: same stream, knob off — the replayed segment is delivered
    in full (and still applies exactly-once by value via LWW dominance)."""
    seed, changes = data
    t, applied = _run(spark, tmp_path, seed, changes)
    assert_tables_equal(table_to_pandas(t.read()), replay(seed, [changes]))
    # the replayed segment arrives as a full batch of winners (same winner
    # count as its first delivery), relying on dominance alone
    assert len(applied) == 7
    assert applied[REPLAYED + 2] == applied[REPLAYED] > 100
