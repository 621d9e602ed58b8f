"""SCD Type-2 history materialization of a change stream.

The reference's sink keeps only the latest document per key (last-writer-
wins upsert, index_ccdb.py:103,130-136). A warehouse consuming the same
change feed usually also wants the *history*: one row per key VERSION with
a validity interval, so `AS OF` queries can ask "what did this record say
at time t" without replaying the binlog. This operator turns the raw change
stream into that table.

Semantics (per key, events totally ordered by (ts, lsn)):
  - every change event opens a version valid from its own event time;
  - the version closes when the next event for the same key arrives
    (``valid_to`` = successor ts; NULL = still open);
  - ``is_current`` marks the last event, unless it is a delete — a deleted
    key has a fully-closed history and no current row.

Scale shape: ONE shuffle (hash partition by key for the window), then two
window functions evaluated in the same sort pass — Catalyst collapses
lead/row_number over the identical (partition, order) spec into a single
Window physical node. Key cardinality is high (per conv/turn or per
user/event-type), so the partitioning is skew-resistant; no driver-side
state, no Python.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    lsn_col: str = "lsn",
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Append SCD2 validity columns to a change stream.

    Adds ``version_no`` (1-based per key, in (ts, lsn) order), ``valid_from``
    (the event's own ts), ``valid_to`` (successor event's ts, NULL while
    open) and ``is_current``. With ``op_col`` given, rows whose op equals
    ``delete_op`` are terminal tombstone versions: they close the interval
    they open (``valid_to = valid_from``) and are never current.
    """
    w = W.partitionBy(*[F.col(k) for k in key_cols]).orderBy(
        F.col(ts_col), F.col(lsn_col)
    )
    nxt = F.lead(F.col(ts_col)).over(w)
    out = (
        changes.withColumn("version_no", F.row_number().over(w))
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )
    if op_col is not None:
        is_del = F.col(op_col) == delete_op
        out = out.withColumn(
            "valid_to", F.when(is_del, F.col("valid_from")).otherwise(F.col("valid_to"))
        ).withColumn("is_current", F.col("is_current") & ~is_del)
    return out


def snapshot_as_of(history: DataFrame, key_cols: Sequence[str], ts) -> DataFrame:
    """Point-in-time read over an SCD2 table: the version whose interval
    covers ``ts`` (valid_from <= ts < valid_to, open intervals unbounded).
    A plain filter — no shuffle — because validity is precomputed."""
    t = F.lit(ts).cast("timestamp")
    covers = (F.col("valid_from") <= t) & (
        F.col("valid_to").isNull() | (F.col("valid_to") > t)
    )
    return history.filter(covers)
