"""Multi-shard CDC ingestion (sources/shards.py): N upstream binlogs with
independent per-shard LSN sequences bit-packed into the engine's global
int64 LSN — per-shard order preserved, cross-shard LWW resolved by event
time with a deterministic tie-break, exactly-once unchanged."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
from ccdb_data_pipeline_spark.schemas import (
    CHANGE_SCHEMA,
    TRANSCRIPT_SCHEMA,
    TableSpec,
)
from ccdb_data_pipeline_spark.sources.binlog import (
    gen_changes_pandas,
    gen_seed_pandas,
    write_segments,
)
from ccdb_data_pipeline_spark.sources.shards import (
    pack_shard_lsn,
    shard_feed,
    shard_watermarks,
    unpack_shard,
)
from ccdb_data_pipeline_spark.streaming.stream import run_ingest

from tests.oracle import assert_tables_equal, replay, table_to_pandas

N_SHARDS = 3
BITS = 10


def _shard_of(conv_id: str) -> int:
    return sum(conv_id.encode()) % N_SHARDS


def _shard_frames(ch: pd.DataFrame) -> dict[int, pd.DataFrame]:
    """Split a global change stream into per-shard streams, each renumbered
    with its OWN contiguous LSN sequence 1..n (per-shard order preserved)."""
    out = {}
    shards = ch.conv_id.fillna("null").map(_shard_of)
    for s in range(N_SHARDS):
        part = ch[shards == s].sort_values("lsn").copy()
        part["lsn"] = range(1, len(part) + 1)
        out[s] = part.reset_index(drop=True)
    return out


def _packed_union(frames: dict[int, pd.DataFrame]) -> pd.DataFrame:
    parts = []
    for s, pdf in frames.items():
        p = pdf.copy()
        p["lsn"] = p["lsn"].astype("int64") * (1 << BITS) + s
        parts.append(p)
    return pd.concat(parts).sort_values("lsn").reset_index(drop=True)


def _mk(spark, tmp_path):
    t = SnapshotParquetTable(
        spark, os.path.join(str(tmp_path), "t"), TableSpec(num_buckets=8)
    )
    t.create(TRANSCRIPT_SCHEMA)
    seed = gen_seed_pandas(n_convs=30, seed=7)
    bootstrap_seed(t, spark.createDataFrame(seed, TRANSCRIPT_SCHEMA))
    return t, seed


def test_pack_unpack_roundtrip_and_order(spark):
    df = spark.createDataFrame(
        [(s, l) for s in (0, 1, 2, 1023) for l in (0, 1, 7, 2**40)],
        "shard_id LONG, lsn LONG",
    ).withColumn("g", pack_shard_lsn("shard_id", "lsn", BITS))
    sh, ls = unpack_shard("g", BITS)
    got = df.select("shard_id", "lsn", sh.alias("s2"), ls.alias("l2")).collect()
    for r in got:
        assert (r["shard_id"], r["lsn"]) == (r["s2"], r["l2"])
    # packed order within one shard == lsn order
    one = [r for r in df.filter("shard_id = 1").select("lsn", "g").collect()]
    assert sorted(one, key=lambda r: r["lsn"]) == sorted(one, key=lambda r: r["g"])


def test_pack_rejects_out_of_range(spark):
    df = spark.createDataFrame([(1 << BITS, 5)], "shard_id LONG, lsn LONG")
    with pytest.raises(Exception, match="packable range"):
        df.select(pack_shard_lsn("shard_id", "lsn", BITS)).collect()
    df = spark.createDataFrame([(1, 1 << 54)], "shard_id LONG, lsn LONG")
    with pytest.raises(Exception, match="packable range"):
        df.select(pack_shard_lsn("shard_id", "lsn", BITS)).collect()


def test_sharded_batch_apply_matches_oracle(spark, tmp_path):
    t, seed = _mk(spark, tmp_path)
    ch = gen_changes_pandas(900, n_convs=30, seed=7)
    frames = _shard_frames(ch)
    assert all(len(f) for f in frames.values())

    feed = shard_feed(
        {s: spark.createDataFrame(pdf, CHANGE_SCHEMA) for s, pdf in frames.items()},
        shard_bits=BITS,
    )
    apply_changes(t, feed, batch_id=0)
    assert_tables_equal(
        table_to_pandas(t.read()), replay(seed, [_packed_union(frames)])
    )


def test_sharded_streaming_ingest_exactly_once(spark, tmp_path):
    t, seed = _mk(spark, tmp_path)
    ch = gen_changes_pandas(600, n_convs=30, seed=7)
    frames = _shard_frames(ch)
    dirs = {}
    for s, pdf in frames.items():
        d = os.path.join(str(tmp_path), f"shard-{s}")
        # shard 0 re-publishes one segment (duplicate per-shard LSNs across
        # segment files) — must apply once via (ts, packed-lsn) dominance
        write_segments(pdf, d, n_segments=4, replay_segment=1 if s == 0 else None)
        dirs[s] = d
    run_ingest(
        spark, dirs, t, os.path.join(str(tmp_path), "ckpt"),
        max_files_per_trigger=2,
    )
    assert_tables_equal(
        table_to_pandas(t.read()), replay(seed, [_packed_union(frames)])
    )
    # restart with the same checkpoint: nothing new -> no new table version
    v = t.current_version()
    run_ingest(
        spark, dirs, t, os.path.join(str(tmp_path), "ckpt"),
        max_files_per_trigger=2,
    )
    assert t.current_version() == v


def test_shard_watermarks_reports_gaps(spark):
    ch = gen_changes_pandas(300, n_convs=10, seed=1)
    frames = _shard_frames(ch)
    # punch 3 holes in shard 1's sequence
    f1 = frames[1]
    frames[1] = f1[~f1.lsn.isin([2, 5, 9])].reset_index(drop=True)
    feed = shard_feed(
        {s: spark.createDataFrame(pdf, CHANGE_SCHEMA) for s, pdf in frames.items()},
        shard_bits=BITS,
    )
    wm = {r["shard_id"]: r for r in shard_watermarks(feed, shard_bits=BITS).collect()}
    assert set(wm) == {0, 1, 2}
    assert wm[1]["n_gaps"] == 3 and wm[0]["n_gaps"] == 0 and wm[2]["n_gaps"] == 0
    assert wm[0]["lsn_min"] == 1 and wm[0]["lsn_max"] == len(frames[0])
    assert wm[1]["n_events"] == len(frames[1])
