"""Streaming-native event-time operators over the change stream.

The ingest path proper is foreachBatch MERGE (stream.py) because a lake
upsert needs per-batch transactional commits; these operators cover the
*analytical* streaming surface the reference's consumers would point at the
same binlog tail (reference's only stream analog is the watermark-driven
delta pull, /root/reference/salesforce/query.py:32-33 — it has no windowed
aggregation; this is part of the Spark-first widening):

- ``stream_tumbling_counts``: event-time tumbling window aggregation with a
  watermark — late events land in their window while its state lives;
  once the watermark passes a window it is emitted, evicted, and
  later-arriving rows for it are dropped (bounded state at 10^10-event
  scale: memory is O(open windows), not O(stream)).
- ``stream_conv_progress``: a custom stateful operator
  (applyInPandasWithState, Arrow-batched — no per-row Python) keeping
  per-conversation running progress (event count, max LSN, max turn) with a
  processing-time timeout for state eviction.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_tumbling_counts(
    changes: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    op_col: str = "op",
) -> DataFrame:
    """Tumbling event-time counts per (window, op) with late-data handling.

    In append output mode a window row is emitted exactly once, when the
    watermark passes its end — the streaming equivalent of the batch
    ``tumbling_hour_agg`` query (benchqueries.py). State is bounded: closed
    windows are evicted, so memory is O(open windows), not O(stream).
    """
    return (
        changes.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"), F.col(op_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            op_col,
            "n_events",
        )
    )


def stream_session_counts(
    changes: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "conv_id",
) -> DataFrame:
    """Event-time session windows per conversation (native
    ``session_window``): a session closes when no event arrives within
    ``gap``; with a watermark the state for closed sessions is evicted and
    each session emits exactly once in append mode — the streaming form of
    the batch ``sessionize`` query (benchqueries.py). Late events inside
    the gap extend/merge sessions; state is O(open sessions)."""
    return (
        changes.filter(F.col(key_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("s"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


_PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("max_turn_idx", T.LongType()),
    ]
)

_STATE_SCHEMA = "n_events LONG, max_lsn LONG, max_turn_idx LONG"


def _mk_progress_fn(timeout_ms: int | None):
    def _progress_fn(key, pdfs, state: GroupState):
        (conv_id,) = key
        n, max_lsn, max_turn = state.get if state.exists else (0, 0, -1)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                max_lsn = max(max_lsn, int(pdf["lsn"].max()))
                turns = pdf["turn_idx"].dropna()
                if len(turns):
                    max_turn = max(max_turn, int(turns.max()))
        state.update((n, max_lsn, max_turn))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)  # evict idle conversations
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "n_events": [n],
                "max_lsn": [max_lsn],
                "max_turn_idx": [max_turn],
            }
        )

    return _progress_fn


def stream_conv_progress(changes: DataFrame, timeout_hours: float | None = None) -> DataFrame:
    """Per-conversation running progress as a custom stateful operator.

    applyInPandasWithState keyed on conv_id: each micro-batch updates the
    conversation's (n_events, max_lsn, max_turn_idx) and emits the new
    running row (update output mode). Arrow-batched — the per-group fold is
    a handful of vectorized pandas reductions, no per-row Python.

    ``timeout_hours`` evicts idle conversations (bounded state for
    10^10-event streams). Default off: on PySpark 4.1.2
    ``GroupStateTimeout.ProcessingTimeTimeout`` makes the worker busy-spin
    for minutes per micro-batch even on a 5-group/100-row stream (verified
    by A/B with NoTimeout — same pipeline, 5s vs hung); enable on builds
    where the timeout path is fixed, or bound state by key-range compaction
    instead.
    """
    timeout_ms = int(timeout_hours * 3600 * 1000) if timeout_hours else None
    return (
        changes.filter(F.col("conv_id").isNotNull())
        .groupBy("conv_id")
        .applyInPandasWithState(
            _mk_progress_fn(timeout_ms),
            outputStructType=_PROGRESS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout if timeout_ms else GroupStateTimeout.NoTimeout
            ),
        )
    )
