"""Streaming-native event-time operators: tumbling window agg with
watermark (late-data handling, bounded state) and the custom stateful
per-conversation progress operator (applyInPandasWithState)."""

import pandas as pd
import pytest

from ccdb_data_pipeline_spark.schemas import CHANGE_SCHEMA
from ccdb_data_pipeline_spark.sources.binlog import gen_changes_pandas, write_segments
from ccdb_data_pipeline_spark.streaming.windows import (
    stream_conv_progress,
    stream_tumbling_counts,
)

N_CONVS = 40
N_EVENTS = 3000


@pytest.fixture(scope="module")
def segments(tmp_path_factory):
    d = tmp_path_factory.mktemp("wseg")
    changes = gen_changes_pandas(N_EVENTS, n_convs=N_CONVS, seed=42)
    # no replayed segment: this analytical op counts raw events (the CDC
    # ingest path is the component that dedups replays by LSN)
    write_segments(changes, str(d / "binlog"), n_segments=6, replay_segment=None)
    return str(d / "binlog"), changes


def _stream(spark, path, max_files=2):
    return (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files))
        .parquet(path)
    )


def _mk_timed_stream(tmp_path):
    """Deterministic 3-micro-batch stream (6 segments, maxFiles=2) probing
    the watermark contract: one event late-but-within an OPEN window (must
    count) and one later than a CLOSED window (must drop)."""
    B = pd.Timestamp("2025-06-01 00:00:00")
    rows = []

    def ev(lsn, minutes):
        rows.append(
            dict(lsn=lsn, op="I", conv_id=f"conv-{lsn:08d}", turn_idx=0,
                 role="user", text=f"t{lsn}", tool=None,
                 ts=B + pd.Timedelta(minutes=minutes))
        )

    # 72 rows -> np.array_split into 6 segments of 12 -> with maxFiles=2 the
    # micro-batches are exactly lsns 1-24, 25-48, 49-72. Spark applies the
    # watermark computed from batch N-1's max event time to batch N.
    # batch 1 (lsns 1-24): ts 2.5,5,...,57.5 (all window [0,60)) then 95
    # -> wm becomes 95-30=65, closing window [0,60) with its 23 events
    for i in range(1, 24):
        ev(i, 2.5 * i)
    ev(24, 95)
    # batch 2 (lsns 25-48): lsn 25 is LATE but window [60,120) is still
    # open (end 120 > wm 65) -> counted; lsn 26 is late for window [0,60)
    # which closes at THIS batch's end — state still present during the
    # merge, so Spark still counts it (watermark only guarantees drops
    # after eviction); rest ts 102.5..155 push wm to 125, closing [60,120)
    ev(25, 70)
    ev(26, 10)
    for i in range(27, 49):
        ev(i, 100 + 2.5 * (i - 26))
    # batch 3 (lsns 49-72): lsn 49 targets window [0,60) whose state was
    # EVICTED at the end of batch 2 -> dropped (and append mode must not
    # re-emit the window); rest ts 160.5..172 -> window [120,180) stays
    # open (wm 142 < 180), never emitted
    ev(49, 15)
    for i in range(50, 73):
        ev(i, 160 + 0.5 * (i - 48))
    pdf = pd.DataFrame(rows)
    path = str(tmp_path / "timed-binlog")
    write_segments(pdf, path, n_segments=6, replay_segment=None)
    return path, pdf, B


def test_stream_tumbling_counts_watermark_contract(spark, tmp_path):
    path, pdf, B = _mk_timed_stream(tmp_path)
    out = stream_tumbling_counts(_stream(spark, path), "1 hour", "30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("tumbling_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table("tumbling_out").toPandas()

    got = {pd.Timestamp(r.window_start): r.n_events for r in emitted.itertuples()}
    # exactly the two closed windows, emitted once each — the post-eviction
    # late row (lsn 49) must NOT resurrect or re-emit window [0,60)
    assert set(got) == {B, B + pd.Timedelta(hours=1)}
    assert not emitted.duplicated(subset=["window_start", "op"]).any()
    # truth: every event in its event-time window, except the one arriving
    # AFTER its window's state was evicted (lsn 49); lsn 26 (late but
    # arriving in the closing batch) and lsn 25 (late in an open window)
    # are both counted
    ref = pdf[pdf["lsn"] != 49].copy()
    ref["w"] = ref["ts"].dt.floor("h")
    truth = ref.groupby("w").size()
    assert got[B] == truth[B]  # includes lsn 26, excludes lsn 49
    assert got[B + pd.Timedelta(hours=1)] == truth[B + pd.Timedelta(hours=1)]  # lsn 25 counted


def test_stream_conv_progress_stateful_running_totals(spark, segments, tmp_path):
    path, changes = segments
    out = stream_conv_progress(_stream(spark, path))
    q = (
        out.writeStream.format("memory")
        .queryName("progress_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("progress_out").toPandas()
    assert len(got) > 0
    # running totals are monotone; the final emission per conv is the max
    final = got.sort_values("n_events").groupby("conv_id", as_index=False).last()

    ref = changes[changes["conv_id"].notna()]
    truth = ref.groupby("conv_id").agg(
        n_events=("lsn", "size"), max_lsn=("lsn", "max"), max_turn_idx=("turn_idx", "max")
    )
    assert len(final) == len(truth)
    for r in final.itertuples():
        t = truth.loc[r.conv_id]
        assert r.n_events == t["n_events"], r.conv_id
        assert r.max_lsn == t["max_lsn"], r.conv_id
        assert r.max_turn_idx == t["max_turn_idx"], r.conv_id


def test_stream_session_windows_close_on_watermark(spark, tmp_path):
    from ccdb_data_pipeline_spark.streaming.windows import stream_session_counts

    B = pd.Timestamp("2025-06-01 00:00:00")
    rows = []
    for lsn, (conv, minutes) in enumerate(
        [("A", 0), ("A", 10), ("A", 20), ("B", 5), ("B", 15),
         ("A", 100), ("A", 105), ("C", 600)], start=1
    ):
        rows.append(dict(lsn=lsn, op="I", conv_id=conv, turn_idx=0, role="user",
                         text="t", tool=None, ts=B + pd.Timedelta(minutes=minutes)))
    path = str(tmp_path / "sess-binlog")
    write_segments(pd.DataFrame(rows), path, n_segments=2, replay_segment=None)

    out = stream_session_counts(_stream(spark, path, max_files=1), gap="30 minutes",
                                watermark="2 hours")
    q = (
        out.writeStream.format("memory").queryName("sessions_out")
        .outputMode("append").option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r.conv_id, pd.Timestamp(r.session_start)): (pd.Timestamp(r.session_end), r.n_events)
        for r in spark.table("sessions_out").toPandas().itertuples()
    }
    # C's session (end 630min + gap) is still open at wm 480min: not emitted
    m = pd.Timedelta(minutes=1)
    assert got == {
        ("A", B): (B + 50 * m, 3),          # 0,10,20 chained; end = last + gap
        ("B", B + 5 * m): (B + 45 * m, 2),  # 5,15
        ("A", B + 100 * m): (B + 135 * m, 2),  # new session after >30min gap
    }
