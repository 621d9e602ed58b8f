"""Partial-update (column-level patch) resolve — the 'partial-update merge
engine' of Hudi/Paimon, for CDC upstreams that emit patch events carrying
only the columns that changed (Debezium with incomplete row images).

Event ops: 'I'/'U' full row images, 'D' delete, 'P' patch (NULL payload
column = "don't touch", non-NULL = "set"). Resolution per key:

- existence is decided ONLY by full-image ops: the latest non-patch op
  must exist and not be 'D' (a patch can never create or resurrect a row);
- each payload column independently takes its value from the latest event
  that WRITES it — full images write every column, patches write exactly
  their non-NULL columns. A patch older than the latest full image is
  dead by construction (the full image rewrote the row).

The whole resolve is ONE groupBy aggregate of `max_by(col, version) FILTER
(WHERE writes-col)` expressions — map-side combining, no window sort, the
same skew-tolerant shape as the LWW dedup (operators/dedupe.py). Caveat
(shared with Paimon's partial-update engine): a FULL image that explicitly
sets a column to NULL is indistinguishable from "unchanged" to any later
patch-resolve over that column; upstreams that need set-to-NULL patch
semantics must send a sentinel or a full image.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_with_patches(
    df: DataFrame,
    key_cols: list[str],
    ver_col: str,
    payload_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """One live row per key from a mixed full/patch/delete change stream.

    ``ver_col`` must be a monotonic, per-key-unique version (the LSN).
    Output: key columns, resolved payload columns, ``last_full_op``,
    ``last_lsn`` (max version over ALL events for the key, patches
    included — the watermark a resumed reader needs).
    """
    aggs = [
        F.expr(
            f"max_by({op_col}, {ver_col}) FILTER (WHERE {op_col} <> 'P')"
        ).alias("last_full_op"),
        F.max(ver_col).alias("last_lsn"),
    ]
    for c in payload_cols:
        aggs.append(
            F.expr(
                f"max_by({c}, {ver_col}) "
                f"FILTER (WHERE {op_col} <> 'P' OR {c} IS NOT NULL)"
            ).alias(c)
        )
    out = df.groupBy(*key_cols).agg(*aggs)
    return out.filter(
        F.col("last_full_op").isNotNull() & (F.col("last_full_op") != "D")
    ).select(*key_cols, *payload_cols, "last_full_op", "last_lsn")
