"""Stream-stream enrichment join (watermarked, state-bounded).

A CDC tail is rarely alone: tool-invocation telemetry, moderation verdicts,
or billing events arrive as their own streams and must be attached to the
turn they belong to. Batch-side that's a plain join; stream-side Spark needs
BOTH inputs watermarked and an event-time range in the join condition so
the state store can evict rows once the other side can no longer match
(Structured Streaming stream-stream join semantics). This wraps that
pattern once, correctly, instead of each pipeline rediscovering the
state-retention rules.

Scale notes: the join shuffles both streams on the equi-keys; state per key
is bounded by ``window`` + watermark delay, not stream length. Skewed
conv_ids behave like any skewed shuffle — salt upstream if one conversation
dominates (operators/salt.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two event-time streams on equi-keys where the right event lands
    within ``[left_ts, left_ts + window]``. Works identically on batch
    frames (watermark is a no-op there), so one definition serves tests,
    backfills and the live stream.

    The right side's ts is kept as ``{right_ts}_right`` so both event times
    survive into the output. Outer joins emit the unmatched side only after
    the watermark closes the window (documented Spark semantics)."""
    rts = f"{right_ts}_right"
    r = right.withColumnRenamed(right_ts, rts)
    if left.isStreaming or r.isStreaming:
        left = left.withWatermark(left_ts, watermark)
        r = r.withWatermark(rts, watermark)
    cond = None
    for k in on:
        c = left[k] == r[k]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (F.col(rts) >= F.col(left_ts))
        & (F.col(rts) <= F.col(left_ts) + F.expr(f"INTERVAL {window}"))
    )
    out = left.join(r, cond, how)
    # drop the right side's duplicate key columns
    for k in on:
        out = out.drop(r[k])
    return out
