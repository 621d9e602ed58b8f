"""As-of (point-in-time) join — an operator Spark lacks natively.

For every left row, attach the most recent right row for the same key
whose timestamp is <= the left row's timestamp (a LEFT ASOF JOIN in
DuckDB/QuestDB terms; pandas ``merge_asof``). The transcript-CDC use is
aligning a turn to the latest tool/config/state event at or before it.

Spark-first plan (no per-row Python, no range cross-join):
union both sides tagged with a side bit, ONE hash shuffle on the key,
ONE within-partition sort on (ts, side, tiebreak), then a running
``last(payload, ignorenulls=True)`` window carries the newest right
payload forward onto each left row. Cost is a single Exchange +
WindowExec over n_left + n_right rows — the same shape Spark uses for
any keyed window, so it inherits AQE/skew handling. Contrast the naive
``l JOIN r ON key AND r.ts <= l.ts`` + argmax, which explodes to the
full per-key cross product before pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    right_tiebreak: str | None = None,
    prefix: str = "asof_",
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """LEFT ASOF JOIN: newest right row with ``right_ts <= left_ts`` per key
    (``direction="backward"``, the default), or the EARLIEST right row with
    ``right_ts >= left_ts`` (``direction="forward"`` — time-to-next-event
    attribution: a click joined to the user's next purchase). Forward is
    the same single-shuffle union+window plan scanned newest-to-oldest;
    equal timestamps match in both directions (inclusive), and the
    tiebreak rule is unchanged (greatest wins among equal-ts rights).

    right_cols: right payload columns to attach (default: all non-key,
    non-ts columns). Attached columns are renamed ``{prefix}{col}`` plus
    ``{prefix}ts`` for the matched right timestamp; unmatched left rows
    get nulls (LEFT semantics).

    right_tiebreak: column that orders right rows sharing the same
    (key, ts) — the greatest wins (e.g. an LSN). Without it, equal-ts
    duplicates on the right make the match nondeterministic; pre-dedupe
    or pass a tiebreak.

    tolerance_seconds: pandas ``merge_asof(tolerance=...)`` semantics — a
    match older than this many seconds before the left row is discarded
    (the row keeps LEFT-null attachments). A stale state event should not
    attribute to a turn hours later. Applied as a map-side predicate on
    the carried match, after the one window pass — no extra shuffle.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    payload = F.struct(
        F.col(right_ts).alias("ts"), *[F.col(c) for c in right_cols]
    )
    tie = (
        F.col(right_tiebreak).cast("double")
        if right_tiebreak is not None
        else F.lit(0.0)
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        tie.alias("_tie"),
        payload.alias("_p"),
    )
    l_ = left.select(
        "*",
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(float("inf")).alias("_tie"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
    )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    u = l_.unionByName(r, allowMissingColumns=True)
    ts_order = F.col("_ats").asc() if direction == "backward" else F.col("_ats").desc()
    w = (
        W.partitionBy(*on)
        .orderBy(ts_order, "_side", "_tie")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = F.last("_p", ignorenulls=True).over(w)
    out = u.withColumn("_m", carried).filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        gap = F.unix_timestamp(F.col("_ats")) - F.unix_timestamp(F.col("_m.ts"))
        fresh = (gap if direction == "backward" else -gap) <= tolerance_seconds
        out = out.withColumn(
            "_m", F.when(fresh, F.col("_m"))  # stale or no match -> null
        )
    keep = [c for c in left.columns]
    return out.select(
        *keep,
        F.col("_m.ts").alias(f"{prefix}ts"),
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
